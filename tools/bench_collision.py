"""A/B the collision-count Pallas kernel vs the fused XLA path on TPU.

Measures the e2e config-3 post-proc slice in isolation: voxel downsample is
shared (identical both ways); collision_detect(impl=...) is the variable.
Shapes match the pipeline: B=4 scenes of N=20000 voxel-ds'd points,
G=1024 decoded grasps/scene. Pipelined timing (force once at the end),
~24 ms tunnel RTT amortized.

Usage: python tools/bench_collision.py [--iters 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _random_grasps(rng, g):
    a = rng.normal(size=(g, 3, 3)).astype(np.float32)
    q, _ = np.linalg.qr(a)
    rows = np.zeros((g, 17), np.float32)
    rows[:, 0] = rng.random(g)
    rows[:, 1] = rng.uniform(0.01, 0.1, g)
    rows[:, 2] = 0.02
    rows[:, 3] = rng.uniform(0.01, 0.04, g)
    rows[:, 4:13] = q.reshape(g, 9)
    rows[:, 13:16] = rng.uniform(-0.2, 0.2, (g, 3))
    rows[:, 16] = -1
    return rows


def main():
    import os

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from graspbalance_tpu.data.synthetic import SceneConfig, make_batch
    from graspbalance_tpu.eval.collision import (
        collision_detect,
        voxel_downsample_fixed,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--bs", type=int, default=4)
    ap.add_argument("--grasps", type=int, default=1024)
    args = ap.parse_args()

    b, g = args.bs, args.grasps
    cloud = jnp.asarray(
        make_batch(0, b, SceneConfig(num_points=20000))["point_clouds"][..., :3]
    )
    rng = np.random.default_rng(0)
    grasps = jnp.asarray(np.stack([_random_grasps(rng, g) for _ in range(b)]))

    s_ds, s_valid = jax.vmap(voxel_downsample_fixed)(cloud)
    s_ds.block_until_ready()

    def make_fn(impl):
        @jax.jit
        def f(s, v, gr):
            def one(si, vi, gi):
                return collision_detect(si, gi, scene_valid=vi, impl=impl)

            coll = jax.vmap(one)(s, v, gr)
            return jnp.sum(coll)

        return f

    results = {}
    for impl in ("xla", "pallas", "xla", "pallas"):
        f = make_fn(impl)
        out0 = float(f(s_ds, s_valid, grasps))  # compile + warm
        t0 = time.perf_counter()
        acc = None
        for _ in range(args.iters):
            acc = f(s_ds, s_valid, grasps)
        out = float(acc)
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        results.setdefault(impl, []).append(dt)
        print(f"{impl:7s} {dt:7.3f} ms/iter  (sum={out:.0f}, warm={out0:.0f})")

    for impl, ts_ in results.items():
        print(f"{impl}: best {min(ts_):.3f} ms")


if __name__ == "__main__":
    main()
