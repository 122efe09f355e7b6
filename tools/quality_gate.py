"""Closed-loop quality gate at production scale (VERDICT r3 #1).

Trains the FULL GraspBalance model on freshly generated synthetic scenes
with analytic labels (labels/analytic.py — labels are a deterministic
function of scene geometry, expanded on device), then runs the complete
inference pipeline (forward -> pred_decode -> NMS -> collision filter) on
held-out scenes and scores every surviving grasp against the same analytic
rule. Prints one JSON line with trained vs untrained metrics — the
framework's first end-to-end evidence that a model IT TRAINED detects good
grasps, not just that its ops match the reference.

Run on the TPU (background, generous timeout — remote compiles are slow):

  python tools/quality_gate.py --steps 1500 --bs 4 --dtype bfloat16

The CPU-scale regression version lives in tests/test_quality.py.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gate_scene(num_points: int = 20000):
    from graspbalance_tpu.data.synthetic import SceneConfig

    # compact clutter: FPS seeds sample by spatial coverage, so the default
    # wide sparse table would absorb ~90% of the 1024 seeds and starve the
    # graspable-classification signal (round-4 calibration, tests/tiny.py)
    return SceneConfig(
        num_points=num_points,
        analytic_labels=True,
        emit_label_tensors=False,
        table_extent=0.15,
        object_scatter=0.12,
    )


def run_gate(steps: int, bs: int, dtype: str, eval_batches: int = 4,
             num_points: int = 20000, lr: float = 1e-3,
             mixed_train: bool = False, log=print) -> dict:
    import jax
    import jax.numpy as jnp

    from graspbalance_tpu.data.synthetic import SceneConfig, make_batch
    from graspbalance_tpu.eval.quality import (
        evaluate_oracle_quality, evaluate_quality,
    )
    from graspbalance_tpu.train.config import (
        Config, DataConfig, ModelConfig, TrainConfig,
    )
    from graspbalance_tpu.train import train_step as ts
    from graspbalance_tpu.train.loop import prefetch

    scene = gate_scene(num_points)
    cfg = Config(
        model=ModelConfig(dtype=dtype),
        data=DataConfig(analytic_labels=True, batch_size=bs),
        train=TrainConfig(max_epoch=1, learning_rate=lr),
    )
    batch0 = make_batch(0, bs, scene)
    model, state = ts.create_train_state(cfg, steps, batch0)

    # inference always runs f32 (bf16 EVAL measured slower AND is a
    # numerics knob; params are stored f32 regardless of compute dtype)
    eval_cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, dtype="float32")
    )
    eval_model = ts.build_model(eval_cfg)

    def q(state_):
        variables = {
            "params": state_.params, "batch_stats": state_.batch_stats
        }
        return evaluate_quality(
            eval_model, variables, scene,
            num_batches=eval_batches, batch_size=bs, seed0=1_000_000,
        )

    t0 = time.time()
    untrained = q(state)
    log(f"untrained: {json.dumps(untrained)} ({time.time()-t0:.0f}s)")

    step_fn = ts.make_train_step(model, cfg)

    # mixed_train: alternate compact-clutter and DEFAULT-extent scenes —
    # the hard-shift eval measured ZERO survivors for compact-only
    # training (2026-08-21), so this tests whether exposure to the wide
    # layout during training closes that boundary. Scene shapes are
    # identical, so the jitted step is unchanged.
    wide_scene = SceneConfig(
        num_points=num_points, analytic_labels=True,
        emit_label_tensors=False,
    )

    def batches():
        for i in range(steps):
            sc = wide_scene if (mixed_train and i % 2) else scene
            yield make_batch(1 + i, bs, sc)

    t0 = time.time()
    first_loss = last_loss = None
    for i, b in enumerate(prefetch(batches(), depth=3)):
        jb = {k: jnp.asarray(v) for k, v in b.items()}
        state, metrics = step_fn(state, jb, jnp.int32(0))
        if i == 0:
            first_loss = float(metrics["loss/overall_loss"])
            log(f"step 1 loss {first_loss:.3f} (compile "
                f"{time.time()-t0:.0f}s)")
        elif (i + 1) % 100 == 0:
            last_loss = float(metrics["loss/overall_loss"])
            log(
                f"step {i+1} loss {last_loss:.3f} "
                f"graspable_acc {float(metrics['stage1_graspable_acc']):.3f} "
                f"recall {float(metrics['stage1_graspable_recall']):.3f} "
                f"({time.time()-t0:.0f}s)"
            )
    train_wall = time.time() - t0
    last_loss = float(metrics["loss/overall_loss"])

    trained = q(state)
    log(f"trained: {json.dumps(trained)}")

    # oracle ceiling (VERDICT r4 #2): perfect-rule grasps through the SAME
    # NMS + collision stack, on the SAME held-out scenes — the trained
    # numbers are reported as a fraction of this pipeline-mechanical cap
    oracle = evaluate_oracle_quality(
        scene, num_batches=eval_batches, batch_size=bs, seed0=1_000_000,
    )
    log(f"oracle: {json.dumps(oracle)}")

    # cross-distribution evals (VERDICT r4 #7). Two shifts:
    # (a) mild — same compact extents, DIFFERENT clutter statistics
    #     (5 objects instead of 8, different seed stream): tests that the
    #     model learned object geometry rather than the training scenes
    # (b) hard — DEFAULT extents (2x table, 2x scatter): at that spread
    #     only ~6% of FPS seeds land on objects (round-4 calibration) vs
    #     ~40% in training, an input-distribution shift the objectness
    #     head was never exposed to. Measured result (2026-08-21): zero
    #     surviving grasps — reported honestly as the generalization
    #     boundary; oracle_xdist shows the pipeline itself is fine there.
    xdist_mild_scene = SceneConfig(
        num_points=num_points, analytic_labels=True,
        emit_label_tensors=False, table_extent=0.15, object_scatter=0.12,
        num_objects=5,
    )
    trained_xdist_mild = {
        k: round(v, 4) if isinstance(v, float) else v
        for k, v in evaluate_quality(
            eval_model,
            {"params": state.params, "batch_stats": state.batch_stats},
            xdist_mild_scene, num_batches=eval_batches, batch_size=bs,
            seed0=4_000_000,
        ).items()
    }
    oracle_xdist_mild = evaluate_oracle_quality(
        xdist_mild_scene, num_batches=eval_batches, batch_size=bs,
        seed0=4_000_000,
    )
    log(f"trained_xdist_mild: {json.dumps(trained_xdist_mild)}")
    log(f"oracle_xdist_mild: {json.dumps(oracle_xdist_mild)}")

    xdist_scene = SceneConfig(
        num_points=num_points, analytic_labels=True,
        emit_label_tensors=False,
    )
    trained_xdist = {
        k: round(v, 4) if isinstance(v, float) else v
        for k, v in evaluate_quality(
            eval_model,
            {"params": state.params, "batch_stats": state.batch_stats},
            xdist_scene, num_batches=eval_batches, batch_size=bs,
            seed0=3_000_000,
        ).items()
    }
    oracle_xdist = evaluate_oracle_quality(
        xdist_scene, num_batches=eval_batches, batch_size=bs,
        seed0=3_000_000,
    )
    log(f"trained_xdist: {json.dumps(trained_xdist)}")
    log(f"oracle_xdist: {json.dumps(oracle_xdist)}")

    return {
        "config": "quality_gate_synthetic"
                  + ("_mixed_train" if mixed_train else ""),
        "steps": steps,
        "bs": bs,
        "dtype": dtype,
        "train_wall_s": round(train_wall, 1),
        "first_loss": round(first_loss, 3),
        "last_loss": round(last_loss, 3),
        "untrained": untrained,
        "trained": trained,
        "oracle": oracle,
        "trained_xdist_mild": trained_xdist_mild,
        "oracle_xdist_mild": oracle_xdist_mild,
        "trained_xdist": trained_xdist,
        "oracle_xdist": oracle_xdist,
        # the gate judgment: trained decoded grasps must far outscore
        # untrained under the analytic rule that generated the labels
        "gate_ratio": round(
            trained["quality_mean"] / max(untrained["quality_mean"], 1e-6), 2
        ),
        "quality_frac_of_oracle": round(
            trained["quality_mean"] / max(oracle["quality_mean"], 1e-6), 3
        ),
        "ap_frac_of_oracle": round(
            trained["ap_analytic"] / max(oracle["ap_analytic"], 1e-6), 3
        ),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--bs", type=int, default=4)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--num_points", type=int, default=20000)
    p.add_argument("--eval_batches", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--mixed_train", action="store_true",
                   help="alternate compact and default-extent scenes")
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    out = run_gate(args.steps, args.bs, args.dtype,
                   eval_batches=args.eval_batches,
                   num_points=args.num_points, lr=args.lr,
                   mixed_train=args.mixed_train)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
