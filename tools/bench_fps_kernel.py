"""TPU micro-benchmark: fps_pallas_2d (per-row grid) vs fps_pallas_2d_batched
(all rows in one grid step, interleaved select chains) at production shape,
plus bit-exactness of both vs each other.

Usage: python tools/bench_fps_kernel.py [batch] [n_points] [num_samples]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from graspbalance_tpu.data.synthetic import SceneConfig, make_batch
    from graspbalance_tpu.ops.pallas.fps_kernel import (
        fps_pallas_2d,
        fps_pallas_2d_batched,
    )

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    m = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
    cloud = jnp.asarray(
        make_batch(0, bs, SceneConfig(num_points=n))["point_clouds"]
    )

    def run(name, f):
        out = f(cloud)
        float(jnp.sum(out))  # force remote completion
        reps = 10
        t0 = time.perf_counter()
        acc = None
        for _ in range(reps):
            acc = f(cloud)
        float(jnp.sum(acc))
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name}: {dt:7.2f} ms/iter (pipelined, bs={bs} n={n} m={m})")
        return out

    out_a = run("fps_pallas_2d        ", lambda c: fps_pallas_2d(c, m))
    out_b = run("fps_pallas_2d_batched", lambda c: fps_pallas_2d_batched(c, m))
    eq = bool(jnp.all(out_a == out_b))
    print(f"bit-exact: {eq}")
    assert eq, "MISMATCH between the two kernels"


if __name__ == "__main__":
    main()
