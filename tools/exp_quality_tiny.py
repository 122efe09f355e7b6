"""Calibration experiment for the closed-loop quality gate at tiny scale.

Trains the tiny model on analytic synthetic scenes (CPU) and prints the
analytic quality metrics at several step counts, trained vs untrained —
used to pick the step budget and assertion thresholds of
tests/test_quality.py. Not a test; run manually:

  JAX_PLATFORMS=cpu python tools/exp_quality_tiny.py
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from graspbalance_tpu.data.synthetic import make_batch
from graspbalance_tpu.eval.quality import evaluate_quality
from graspbalance_tpu.train.config import Config, DataConfig, ModelConfig, TrainConfig
from graspbalance_tpu.train import train_step as ts

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
from tiny import TINY_STAGES, TINY_QUALITY_SCENE, TINY_NUM_SEED, TINY_NUM_VIEW  # noqa: E402


def main(total_steps=400, bs=2, pool=4, num_points=768):
    scene = dataclasses.replace(TINY_QUALITY_SCENE, num_points=num_points)
    # production-proportioned radii: the TINY_STAGES radii (0.08-0.6) were
    # tuned for the 0.3-extent legacy scene; on the compact 0.12-extent
    # quality scene they swallow whole objects at stage 0 and the local
    # geometry signal for objectness disappears (calibration 2026-08-20)
    radii = (0.04, 0.10, 0.20, 0.30)
    wide = tuple((n, radii[i], k, (32, 32, 64), b, 2 * radii[i], k2)
                 for i, (n, r, k, _, b, r2, k2) in enumerate(TINY_STAGES))
    cfg = Config(
        model=ModelConfig(
            num_view=TINY_NUM_VIEW, num_seed=TINY_NUM_SEED,
            backbone_stages=wide,
        ),
        data=DataConfig(analytic_labels=True),
        train=TrainConfig(max_epoch=1, learning_rate=1e-3),
    )
    batch0 = make_batch(0, bs, scene)
    model, state = ts.create_train_state(cfg, total_steps, batch0)
    untrained_vars = {
        "params": state.params, "batch_stats": state.batch_stats
    }

    q0 = evaluate_quality(model, untrained_vars, scene, num_batches=4,
                          batch_size=2, seed0=1)  # pool scenes (overfit gate)
    print("untrained:", json.dumps(q0), flush=True)

    step_fn = ts.make_train_step(model, cfg)
    pool_batches = [
        {k: jnp.asarray(v) for k, v in make_batch(1 + i, bs, scene).items()}
        for i in range(pool)
    ]
    t0 = time.time()
    checkpoints = (100, 200, 300, total_steps)
    for i in range(total_steps):
        jb = pool_batches[i % pool]
        state, metrics = step_fn(state, jb, jnp.int32(0))
        if (i + 1) % 40 == 0:
            print(f"step {i+1} loss {float(metrics['loss/overall_loss']):.4f} "
                  f"grasp_recall {float(metrics['stage1_graspable_recall']):.2f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
        if (i + 1) in checkpoints:
            tv = {"params": state.params, "batch_stats": state.batch_stats}
            q = evaluate_quality(model, tv, scene, num_batches=4,
                                 batch_size=2, seed0=1)
            qh = evaluate_quality(model, tv, scene, num_batches=2,
                                  batch_size=2, seed0=50_000)
            print(f"trained@{i+1} pool:", json.dumps(q), flush=True)
            print(f"trained@{i+1} heldout:", json.dumps(qh), flush=True)


if __name__ == "__main__":
    main()
