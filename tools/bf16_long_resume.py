"""Long-horizon bf16 training validation + production-shape resume
continuity (VERDICT r3 #2c and #9).

Three runs on the real TPU, production shape (20k pts, V=300, full model),
analytic synthetic scenes (real learning signal, labels/analytic.py),
--dtype bfloat16 production config:

  A  interrupted: stop_after_epochs=2 simulated preemption at step 500
     (max_epoch stays 4 so the OneCycle schedule matches the full run),
     checkpointed, then RESUMED from the epoch-2 checkpoint to 1000
  B  uninterrupted: 1000 steps straight

Asserts: (1) the resumed run's f32 params/BN stats BIT-match the
uninterrupted run at step 1000 (exceeds the reference's epoch-granular
overwrite-in-place checkpoint, /root/reference/train.py:226-234, which is
never round-trip tested); (2) the loss curve is finite and decreasing over
the full 1000 bf16 steps (extends the round-3 250-step bf16 validation).

Usage: python tools/bf16_long_resume.py [--steps_per_epoch 250] [--bs 2]
"""

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run(log_dir, max_epoch, steps_per_epoch, bs, stop_after=None):
    import jax.numpy as jnp  # noqa: F401 (ensures jax configured once)

    from graspbalance_tpu.data.synthetic import SceneConfig, make_batch
    from graspbalance_tpu.train.config import (
        Config, DataConfig, ModelConfig, TrainConfig,
    )
    from graspbalance_tpu.train.loop import train

    scene = SceneConfig(
        analytic_labels=True, emit_label_tensors=False,
        table_extent=0.15, object_scatter=0.12,
    )
    cfg = Config(
        model=ModelConfig(dtype="bfloat16"),
        data=DataConfig(analytic_labels=True, batch_size=bs),
        train=TrainConfig(
            max_epoch=max_epoch, log_dir=log_dir, log_every=25,
            n_data_shards=1, seed=11, stop_after_epochs=stop_after,
        ),
    )

    def batches(epoch):
        for i in range(steps_per_epoch):
            yield make_batch(epoch * steps_per_epoch + i, bs, scene)

    return train(cfg, batches, steps_per_epoch=steps_per_epoch)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps_per_epoch", type=int, default=250)
    ap.add_argument("--bs", type=int, default=2)
    ap.add_argument("--workdir", default="/tmp/gb_bf16_long")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np

    wd = args.workdir
    shutil.rmtree(wd, ignore_errors=True)

    t0 = time.time()
    # simulated preemption: SAME max_epoch (same OneCycle total), the loop
    # just stops after 2 epochs — lowering max_epoch instead changes the
    # LR schedule of the pre-kill steps and params can never match
    run(wd + "/interrupted", 4, args.steps_per_epoch, args.bs, stop_after=2)
    print(f"[A1] 500 steps done ({time.time()-t0:.0f}s)", flush=True)
    s_resumed = run(wd + "/interrupted", 4, args.steps_per_epoch, args.bs)
    print(f"[A2] resumed to 1000 ({time.time()-t0:.0f}s)", flush=True)
    s_full = run(wd + "/full", 4, args.steps_per_epoch, args.bs)
    print(f"[B] uninterrupted 1000 ({time.time()-t0:.0f}s)", flush=True)

    assert int(s_resumed.step) == int(s_full.step) == 4 * args.steps_per_epoch
    mismatched = 0
    for a, b in zip(
        jax.tree_util.tree_leaves(s_full.params),
        jax.tree_util.tree_leaves(s_resumed.params),
    ):
        if not np.array_equal(np.asarray(a), np.asarray(b)):
            mismatched += 1
    stats_mismatched = 0
    for a, b in zip(
        jax.tree_util.tree_leaves(s_full.batch_stats),
        jax.tree_util.tree_leaves(s_resumed.batch_stats),
    ):
        if not np.array_equal(np.asarray(a), np.asarray(b)):
            stats_mismatched += 1

    # loss curve over the full horizon (uninterrupted run's JSONL)
    losses = []
    with open(wd + "/full/train_metrics.jsonl") as f:
        for line in f:
            r = json.loads(line)
            if "loss/overall_loss" in r:
                losses.append((r["step"], r["loss/overall_loss"]))
    finite = all(np.isfinite(v) for _, v in losses)
    first = np.mean([v for s, v in losses[:3]])
    last = np.mean([v for s, v in losses[-3:]])

    out = {
        "config": "bf16_long_resume",
        "steps": 4 * args.steps_per_epoch,
        "params_mismatched": mismatched,
        "bn_stats_mismatched": stats_mismatched,
        "loss_finite": bool(finite),
        "loss_first3_mean": round(float(first), 3),
        "loss_last3_mean": round(float(last), 3),
        "resume_bit_exact": mismatched == 0 and stats_mismatched == 0,
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(out))
    assert out["resume_bit_exact"], "resumed params differ from uninterrupted"
    assert finite and last < first, "bf16 long-horizon loss not decreasing"


if __name__ == "__main__":
    main()
