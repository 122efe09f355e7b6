"""Quality-vs-steps curve at production scale (VERDICT r4 #6).

Round 4 left an anomaly: a fully-annealed 800-step OneCycle scored
quality_mean 0.766 while the 1500-step schedule scored 0.629 at its own
horizon — attributed to the schedule, unverified. This tool trains ONE
long run (OneCycle total matched to --steps, bf16 production config,
production shape) and evaluates the closed-loop decoded-grasp quality at
checkpoints along the way, plus — because mid-schedule evals see an
un-annealed LR — optionally a few independent fully-annealed runs at
shorter horizons (--full_runs) for an apples-to-apples horizon curve.

Run on the TPU (background):
  python -u tools/quality_vs_steps.py --steps 5000 \
      --eval_at 500,1000,2000,3500,5000 --full_runs 800
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def train_with_evals(steps, eval_at, bs, dtype, lr, eval_batches, log):
    import jax
    import jax.numpy as jnp

    from graspbalance_tpu.data.synthetic import make_batch
    from graspbalance_tpu.eval.quality import evaluate_quality
    from graspbalance_tpu.train.config import (
        Config, DataConfig, ModelConfig, TrainConfig,
    )
    from graspbalance_tpu.train import train_step as ts
    from graspbalance_tpu.train.loop import prefetch
    from tools.quality_gate import gate_scene
    import dataclasses

    scene = gate_scene()
    cfg = Config(
        model=ModelConfig(dtype=dtype),
        data=DataConfig(analytic_labels=True, batch_size=bs),
        train=TrainConfig(max_epoch=1, learning_rate=lr),
    )
    batch0 = make_batch(0, bs, scene)
    model, state = ts.create_train_state(cfg, steps, batch0)
    eval_cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, dtype="float32")
    )
    eval_model = ts.build_model(eval_cfg)
    step_fn = ts.make_train_step(model, cfg)

    def q(state_):
        return evaluate_quality(
            eval_model,
            {"params": state_.params, "batch_stats": state_.batch_stats},
            scene, num_batches=eval_batches, batch_size=bs,
            seed0=1_000_000,
        )

    eval_at = sorted(set(eval_at))
    curve = []
    t0 = time.time()

    def batches():
        for i in range(steps):
            yield make_batch(1 + i, bs, scene)

    for i, b in enumerate(prefetch(batches(), depth=3)):
        jb = {k: jnp.asarray(v) for k, v in b.items()}
        state, metrics = step_fn(state, jb, jnp.int32(0))
        done = i + 1
        if done in eval_at or done == steps:
            loss = float(metrics["loss/overall_loss"])
            m = q(state)
            row = {
                "step": done, "loss": round(loss, 3),
                "wall_s": round(time.time() - t0, 1),
                **{k: round(v, 4) for k, v in m.items()},
            }
            curve.append(row)
            log(json.dumps(row))
    return curve


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=5000)
    p.add_argument("--eval_at", default="500,1000,2000,3500,5000")
    p.add_argument("--full_runs", default="800",
                   help="comma list of horizons to ALSO train fully-annealed")
    p.add_argument("--bs", type=int, default=4)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--eval_batches", type=int, default=4)
    args = p.parse_args()
    sys.stdout.reconfigure(line_buffering=True)

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    out = {"config": "quality_vs_steps", "dtype": args.dtype, "bs": args.bs}
    eval_at = [int(x) for x in args.eval_at.split(",") if x]
    print(f"# long run: {args.steps} steps, evals at {eval_at}")
    out["long_run"] = train_with_evals(
        args.steps, eval_at, args.bs, args.dtype, args.lr,
        args.eval_batches, print,
    )
    out["annealed_runs"] = {}
    for h in [int(x) for x in args.full_runs.split(",") if x]:
        print(f"# fully-annealed run: {h} steps")
        out["annealed_runs"][str(h)] = train_with_evals(
            h, [h], args.bs, args.dtype, args.lr, args.eval_batches, print,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
