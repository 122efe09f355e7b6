"""The jitted training step: forward + loss + Adam/OneCycle under SPMD.

Replaces train.py's per-batch loop body (train.py:138-155): the entire
forward (backbone, heads, on-device label matching), the multi-task loss,
the backward pass, and the optimizer update compile into a single XLA
program. Under a data mesh the batch arrives sharded on axis 0 and XLA
inserts the gradient all-reduce over ICI.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from graspbalance_tpu.labels.losses import get_loss
from graspbalance_tpu.models.graspbalance import GraspBalance
from graspbalance_tpu.nn.layers import bn_momentum_schedule
from graspbalance_tpu.train.config import Config


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)


def apply_trace_knobs(cfg: Config, n_data_shards: int = 1) -> None:
    """Apply the config tree's trace-time numerics knobs to the module-level
    setters they control (VERDICT r3 #7). Call before tracing (train entry,
    inference restore); GB_* envs win over config values so one-off A/B runs
    don't need a config edit. query_batch_chunk=None derives the default
    4 * n_data_shards (chunks must span whole shards under a data mesh —
    ops/query.set_query_batch_chunk docstring)."""
    import os

    from graspbalance_tpu.ops import gather as ops_gather
    from graspbalance_tpu.ops import query as ops_query

    m = cfg.model
    ops_gather.set_gather_vjp(os.environ.get("GB_GATHER_VJP", m.gather_vjp))
    cm = os.environ.get("GB_COUNT_MATMUL")
    ops_query.set_count_matmul(
        cm not in ("", "0") if cm is not None else m.count_matmul
    )
    eg = os.environ.get("GB_QUERY_EXTRACT_GROUP")
    ops_query.set_query_extract_group(
        int(eg) if eg else m.query_extract_group
    )
    chunk = m.query_batch_chunk or 4 * max(n_data_shards, 1)
    qc = os.environ.get("GB_QUERY_BATCH_CHUNK")
    ops_query.set_query_batch_chunk(int(qc) if qc else chunk)


def build_model(cfg: Config) -> GraspBalance:
    import os

    m = cfg.model
    return GraspBalance(
        label_impl=os.environ.get("GB_LABEL_IMPL", m.label_impl),
        num_view=m.num_view,
        num_angle=m.num_angle,
        num_depth=m.num_depth,
        cylinder_radius=m.cylinder_radius,
        hmin=m.hmin,
        hmax_list=tuple(m.hmax_list),
        backbone=m.backbone,
        backbone_stages=m.backbone_stages,
        num_seed=m.num_seed,
        query_order=m.query_order,
        dtype=jnp.bfloat16 if m.dtype == "bfloat16" else jnp.float32,
        width_mlp_dtype=(
            None if m.width_mlp_dtype is None
            else jnp.bfloat16 if m.width_mlp_dtype == "bfloat16"
            else jnp.float32
        ),
    )


def onecycle_schedule(
    total_steps: int,
    max_lr: float,
    pct_start: float = 0.3,
    div_factor: float = 25.0,
    final_div_factor: float = 1e4,
):
    """torch.optim.lr_scheduler.OneCycleLR, exactly (cosine strategy):
    warmup initial=max/div_factor -> max over step_size_up =
    pct_start*total-1 steps, then anneal to initial/final_div_factor over
    the remainder; _annealing_cos(start, end, pct) = end +
    (start-end)/2*(1+cos(pi*pct)). Verified step-for-step against torch in
    tests/test_torch_parity.py."""
    initial = max_lr / div_factor
    min_lr = initial / final_div_factor
    up = float(pct_start * total_steps) - 1.0
    down = float(total_steps - up - 1.0)

    def schedule(step):
        s = jnp.asarray(step, jnp.float32)

        def cos_anneal(start, end, pct):
            return end + (start - end) / 2.0 * (1.0 + jnp.cos(jnp.pi * pct))

        lr_up = cos_anneal(initial, max_lr, jnp.clip(s / up, 0.0, 1.0))
        lr_down = cos_anneal(
            max_lr, min_lr, jnp.clip((s - up) / down, 0.0, 1.0)
        )
        return jnp.where(s <= up, lr_up, lr_down)

    return schedule


def make_optimizer(cfg: Config, steps_per_epoch: int) -> optax.GradientTransformation:
    """Adam + OneCycle (torch OneCycleLR defaults: pct_start 0.3, cosine,
    div_factor 25, final_div_factor 1e4 — train.py:105-108)."""
    t = cfg.train
    total = max(t.max_epoch * steps_per_epoch, 1)
    schedule = onecycle_schedule(total, t.learning_rate)
    tx = optax.adam(schedule)
    if t.weight_decay:
        tx = optax.chain(optax.add_decayed_weights(t.weight_decay), tx)
    import os

    flatten = t.opt_flatten
    if "GB_OPT_FLATTEN" in os.environ:  # A/B override: "1" on, "" / "0" off
        flatten = os.environ["GB_OPT_FLATTEN"] not in ("", "0")
    if flatten:
        # run Adam on one flat vector instead of ~490 per-tensor update ops:
        # same elementwise math, measured 157.5 -> 146.3 ms on the bs=2 full
        # step (v5e, tools/bench_opt_flatten.py, 2026-08-19). Changes the
        # opt_state checkpoint layout (cfg.train.opt_flatten).
        tx = optax.flatten(tx)
    return tx


def create_train_state(cfg: Config, steps_per_epoch: int, sample_batch: dict, rng=None) -> tuple[GraspBalance, TrainState]:
    model = build_model(cfg)
    rng = rng if rng is not None else jax.random.PRNGKey(cfg.train.seed)
    # jit the init: eager dispatch pays the ~29 ms tunnel RTT per op on the
    # remote TPU (minutes for the full model); params are batch-size
    # independent, so trace a bs-1 slice
    sample1 = {k: jnp.asarray(v[:1]) for k, v in sample_batch.items()}
    variables = jax.jit(
        lambda r, b: model.init(r, _maybe_expand_analytic(b, cfg), train=True)
    )(rng, sample1)
    tx = make_optimizer(cfg, steps_per_epoch)
    params = variables["params"]
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        tx=tx,
    )
    return model, state


def _maybe_expand_analytic(batch: dict, cfg: Config) -> dict:
    """Device-side analytic label expansion (labels/analytic.py): when the
    synthetic pipeline runs with cfg.data.analytic_labels and ships only the
    small geometry arrays, build the (B, P, V, A, D) label tensors inside
    the jitted step. No-op when the batch already carries tensors (host
    path / real loader)."""
    if not cfg.data.analytic_labels or "grasp_labels" in batch:
        return batch
    from graspbalance_tpu.labels.analytic import expand_batch_labels

    m = cfg.model
    return expand_batch_labels(batch, m.num_view, m.num_angle, m.num_depth)


def make_train_step(model: GraspBalance, cfg: Config) -> Callable:
    """Returns train_step(state, batch, epoch) -> (state, metrics), jitted
    with donated state."""
    t = cfg.train

    def train_step(state: TrainState, batch: dict, epoch: jnp.ndarray):
        batch = _maybe_expand_analytic(batch, cfg)
        bn_momentum = bn_momentum_schedule(
            epoch,
            init=t.bn_momentum_init,
            decay_rate=t.bn_decay_rate,
            decay_step=t.bn_decay_step,
            floor=t.bn_momentum_floor,
        )

        def loss_fn(params):
            ep, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch,
                train=True,
                bn_momentum=bn_momentum,
                mutable=["batch_stats"],
            )
            ep["objectness_label"] = batch["objectness_label"]
            loss, metrics = get_loss(ep)
            return loss, (metrics, mutated["batch_stats"])

        (loss, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
        )
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,))


def make_eval_step(model: GraspBalance, cfg: Config) -> Callable:
    """Loss-only eval step (train.py:177-209 evaluates loss on test_seen)."""

    def eval_step(state: TrainState, batch: dict):
        batch = _maybe_expand_analytic(batch, cfg)
        # Reference eval: running BN stats + the training label pipeline
        # (net.eval() with constructor is_training=True, train.py:177-196).
        ep = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch,
            train=False,
            match_labels=True,
        )
        ep["objectness_label"] = batch["objectness_label"]
        _, metrics = get_loss(ep)
        return metrics

    return jax.jit(eval_step)
