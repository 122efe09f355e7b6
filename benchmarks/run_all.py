"""Benchmark harness for the five BASELINE.json configs.

Prints one JSON line per config. Configs (BASELINE.json `configs`):
  1. backbone_forward      PointNet++/DRP backbone forward, 20k pts, bs=1
  2. full_forward          full GraspBalance forward, bs=4
  3. e2e_inference         forward + decode + NMS + collision filter
  4. train_step            single training step (labels + loss + Adam), bs=8*
  5. train_loop            short synthetic training loop, steps/sec

*bs for the train step is configurable; the reference trains at bs=2 and
the BASELINE config names bs=8.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, iters=5):
    fn()  # compile/warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--configs", default="1,2,3,4", help="comma list of 1-5")
    p.add_argument("--train_bs", type=int, default=8)
    p.add_argument("--loop_steps", type=int, default=10)
    args = p.parse_args()
    which = {int(x) for x in args.configs.split(",")}

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from graspbalance_tpu.data.synthetic import SceneConfig, make_batch
    from graspbalance_tpu.models.decode import pred_decode
    from graspbalance_tpu.models.drp import DRP
    from graspbalance_tpu.eval.collision import collision_detect
    from graspbalance_tpu.eval.nms import grasp_nms
    from graspbalance_tpu.train.config import Config
    from graspbalance_tpu.train import train_step as ts

    rng = np.random.default_rng(0)
    results = []

    if 1 in which:
        cloud = jnp.asarray(rng.random((1, 20000, 3), dtype=np.float32) - 0.5)
        drp = DRP()
        v = jax.jit(lambda r, c: drp.init(r, c, train=False))(
            jax.random.PRNGKey(0), cloud
        )
        f = jax.jit(
            lambda v, c: jnp.sum(drp.apply(v, c, train=False)["fp2_features"])
        )
        dt = timed(lambda: float(f(v, cloud)))
        results.append(
            {"config": "backbone_forward_bs1", "ms": round(dt * 1e3, 2),
             "clouds_per_sec": round(1 / dt, 2)}
        )

    if 2 in which or 3 in which:
        cfg = Config()
        model = ts.build_model(cfg)
        bs = 4
        cloud = jnp.asarray(rng.random((bs, 20000, 3), dtype=np.float32) - 0.5)
        v = jax.jit(lambda r, b: model.init(r, b, train=False))(
            jax.random.PRNGKey(0), {"point_clouds": cloud[:1]}
        )
        if 2 in which:
            f2 = jax.jit(
                lambda v, c: jnp.sum(
                    model.apply(v, {"point_clouds": c}, train=False)[
                        "grasp_score_pred"
                    ]
                )
            )
            dt = timed(lambda: float(f2(v, cloud)))
            results.append(
                {"config": "full_forward_bs4", "ms": round(dt * 1e3, 2),
                 "clouds_per_sec": round(bs / dt, 2)}
            )
        if 3 in which:
            @jax.jit
            def f3(v, c):
                ep = model.apply(v, {"point_clouds": c}, train=False)
                grasps, valid = pred_decode(ep)

                def post(g, val, s):
                    keep = grasp_nms(g, val)
                    coll = collision_detect(s, g)
                    return keep & ~coll

                keep = jax.vmap(post)(grasps, valid, c)
                return jnp.sum(grasps) + jnp.sum(keep)

            dt = timed(lambda: float(f3(v, cloud)))
            results.append(
                {"config": "e2e_inference_bs4", "ms": round(dt * 1e3, 2),
                 "clouds_per_sec": round(bs / dt, 2)}
            )

    if 4 in which or 5 in which:
        cfg = Config()
        model = ts.build_model(cfg)
        bs = args.train_bs
        batch_np = make_batch(0, bs, SceneConfig())
        batch = {k: jnp.asarray(x) for k, x in batch_np.items()}
        mv = jax.jit(lambda r, b: model.init(r, b, train=True))(
            jax.random.PRNGKey(0),
            {k: x[:1] for k, x in batch.items()},
        )
        tx = ts.make_optimizer(cfg, steps_per_epoch=100)
        state = ts.TrainState(
            step=jnp.zeros((), jnp.int32),
            params=mv["params"],
            batch_stats=mv.get("batch_stats", {}),
            opt_state=tx.init(mv["params"]),
            tx=tx,
        )
        step_fn = ts.make_train_step(model, cfg)
        if 4 in which:
            # non-donated timing copy
            def run():
                nonlocal state
                state, metrics = step_fn(state, batch, jnp.int32(0))
                return float(metrics["loss/overall_loss"])

            dt = timed(run)
            results.append(
                {"config": f"train_step_bs{bs}", "ms": round(dt * 1e3, 2),
                 "clouds_per_sec": round(bs / dt, 2)}
            )
        if 5 in which:
            t0 = time.perf_counter()
            for i in range(args.loop_steps):
                b = make_batch(i + 1, bs, SceneConfig())
                state, metrics = step_fn(
                    state, {k: jnp.asarray(x) for k, x in b.items()}, jnp.int32(0)
                )
            float(metrics["loss/overall_loss"])
            dt = (time.perf_counter() - t0) / args.loop_steps
            results.append(
                {"config": f"train_loop_bs{bs}_incl_datagen",
                 "ms": round(dt * 1e3, 2),
                 "clouds_per_sec": round(bs / dt, 2)}
            )

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
