"""Epoch-level training driver (the train.py:133-234 equivalent).

Works with any iterable-of-batches data source (the real GraspNet loader or
the synthetic generator). Batches are host numpy dicts; they are sharded
onto the data mesh before each step.
"""

from __future__ import annotations

import time
from typing import Callable, Iterable

import jax
import jax.numpy as jnp

from graspbalance_tpu.parallel.mesh import make_mesh
from graspbalance_tpu.train.checkpoints import CheckpointManager
from graspbalance_tpu.train.config import Config
from graspbalance_tpu.train.metrics import (
    MetricAggregator,
    MetricLogger,
    profiler_trace,
    step_timer,
)
from graspbalance_tpu.train.train_step import (
    create_train_state,
    make_eval_step,
    make_train_step,
)


class TransferCache:
    """Per-key host->device transfer cache keyed by array object identity.

    Data generators that recycle an array across steps (the synthetic
    static-label tensors — 3 x 236 MB/sample — or any loader reusing
    pinned buffers) get a single upload instead of one per step; arrays
    that change every step are re-uploaded as before. Holding the host
    reference keeps the id() stable."""

    def __init__(self):
        self._host: dict = {}
        self._dev: dict = {}

    def put(self, batch: dict, mesh) -> dict:
        from graspbalance_tpu.parallel.mesh import batch_sharding

        sh = batch_sharding(mesh)
        out = {}
        for k, a in batch.items():
            if self._host.get(k) is a:
                out[k] = self._dev[k]
            else:
                out[k] = jax.device_put(a, sh)
                self._host[k] = a
                self._dev[k] = out[k]
        return out


def prefetch(iterable: Iterable[dict], depth: int = 2) -> Iterable[dict]:
    """Background-thread prefetch: overlaps host-side batch assembly with
    the device step (the reference relies on DataLoader workers for this)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = object()

    def worker():
        try:
            for item in iterable:
                q.put(item)
        finally:
            q.put(stop)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is stop:
            break
        yield item


def train(
    cfg: Config,
    train_batches: Callable[[int], Iterable[dict]],
    eval_batches: Callable[[], Iterable[dict]] | None = None,
    steps_per_epoch: int | None = None,
):
    """train_batches(epoch) -> iterable of numpy batch dicts."""
    from graspbalance_tpu.train.train_step import apply_trace_knobs

    mesh = make_mesh(cfg.train.n_data_shards)
    # apply the config tree's trace-time numerics knobs before any tracing
    # (query batch-chunks must span whole shards under the data mesh)
    apply_trace_knobs(cfg, n_data_shards=mesh.shape["data"])
    sample = None
    for sample in train_batches(0):
        break
    if sample is None:
        raise ValueError("empty training stream")
    if steps_per_epoch is None:
        steps_per_epoch = sum(1 for _ in train_batches(0))

    # Resume reconciliation (advisor r4, medium): a checkpoint's config.json
    # records the numerics-affecting state it was trained under — resuming
    # with different trace knobs would silently continue under different
    # numerics AND rewrite that record. On resume, require the caller's
    # model config to match the stored one; only (re)write config.json when
    # starting fresh or when none exists (pre-round-3 checkpoints).
    import dataclasses as _dc

    from graspbalance_tpu.train.checkpoints import load_config

    ckpt_dir = cfg.train.log_dir + "/checkpoints"
    ckpt = CheckpointManager(ckpt_dir)
    stored_cfg = load_config(ckpt_dir)
    if ckpt.latest_step() is not None and stored_cfg is not None:
        mismatched = [
            f.name
            for f in _dc.fields(type(cfg.model))
            if getattr(stored_cfg.model, f.name) != getattr(cfg.model, f.name)
        ]
        if mismatched:
            raise ValueError(
                "resume config mismatch: this run's model config differs "
                f"from the checkpoint's stored config on {mismatched} "
                f"({ckpt_dir}/config.json). Resuming under different "
                "numerics knobs silently changes training numerics — use "
                "the stored values or a fresh log_dir."
            )
    else:
        ckpt.save_config(cfg)  # lets infer.py rebuild the matching model

    transfers = TransferCache()
    with mesh:
        model, state = create_train_state(cfg, steps_per_epoch, sample)
        train_step = make_train_step(model, cfg)
        eval_step = make_eval_step(model, cfg)

        state, extra = ckpt.restore(state)
        start_epoch = int(extra.get("epoch", 0)) if extra else (
            int(state.step) // steps_per_epoch
        )
        logger = MetricLogger(cfg.train.log_dir, "train")
        eval_logger = MetricLogger(cfg.train.log_dir, "test")

        profiling = False
        for epoch in range(start_epoch, cfg.train.max_epoch):
            agg = MetricAggregator()
            epoch_agg = MetricAggregator()  # epoch mean for best-loss ckpt
            t_epoch = time.time()
            for i, batch in enumerate(prefetch(train_batches(epoch))):
                # optional jax.profiler window (SURVEY.md §5: the reference
                # ships no tracing) over steps [start, start+n) of epoch 0
                if cfg.train.profile_steps > 0 and epoch == start_epoch:
                    if i == cfg.train.profile_start and not profiling:
                        jax.profiler.start_trace(cfg.train.log_dir + "/profile")
                        profiling = True
                    elif (
                        profiling
                        and i == cfg.train.profile_start + cfg.train.profile_steps
                    ):
                        jax.profiler.stop_trace()
                        profiling = False
                batch = transfers.put(batch, mesh)
                with step_timer(metrics := {}):
                    state, metrics_dev = train_step(state, batch, jnp.int32(epoch))
                metrics.update(metrics_dev)
                agg.update(metrics)
                epoch_agg.update({"loss/overall_loss": metrics_dev["loss/overall_loss"]})
                if (i + 1) % cfg.train.log_every == 0:
                    window = agg.flush()
                    # data-pipeline telemetry (cumulative counters, e.g.
                    # grasp-point truncation — VERDICT r3 #8): surfaced in
                    # the same JSONL/TB stream so dense-scene truncation
                    # can't happen silently in a production run
                    telemetry = getattr(train_batches, "telemetry", None)
                    if telemetry is not None:
                        window.update(telemetry())
                    logger.log(int(state.step), window)
            if profiling:
                jax.profiler.stop_trace()
                profiling = False
            rest = agg.flush()
            if rest:
                logger.log(int(state.step), rest)
            epoch_loss = epoch_agg.flush().get("loss/overall_loss")
            print(f"epoch {epoch} done in {time.time() - t_epoch:.1f}s")

            if eval_batches is not None:
                eagg = MetricAggregator()
                for batch in eval_batches():
                    batch = transfers.put(batch, mesh)
                    eagg.update(eval_step(state, batch))
                eval_logger.log(int(state.step), eagg.flush())

            if (epoch + 1) % cfg.train.checkpoint_every_epochs == 0:
                ckpt.save(
                    int(state.step),
                    state,
                    extra={"epoch": epoch + 1},
                    metrics=(
                        {"loss": epoch_loss} if epoch_loss is not None else None
                    ),
                )

            stop_after = cfg.train.stop_after_epochs
            if stop_after is not None and epoch + 1 >= stop_after:
                # simulated preemption (resume-continuity validation): the
                # LR schedule/config stay those of the full run
                break

        ckpt.close()
        logger.close()
        eval_logger.close()
    return state
