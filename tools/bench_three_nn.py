"""TPU micro-benchmark: three_nn impl='exact' (delta-form recompute per
reduce pass) vs impl='dot' (one MXU score matmul materialized once + exact
rescore of the 3 winners) at the DSN/OBS upsample shape, plus index/distance
agreement between the two.

Usage: python tools/bench_three_nn.py [batch] [n_unknown] [m_known]
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
    from graspbalance_tpu.ops.knn import three_nn

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    m = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    cloud = jnp.asarray(
        make_batch(0, bs, SceneConfig(num_points=n))["point_clouds"]
    )[..., :3]
    known = cloud[:, :m, :]

    def run(name, f):
        dist, idx = f(cloud, known)
        float(jnp.sum(dist) + jnp.sum(idx))  # force remote completion
        reps = 10
        t0 = time.perf_counter()
        acc = None
        for _ in range(reps):
            acc = f(cloud, known)
        float(jnp.sum(acc[0]) + jnp.sum(acc[1]))
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name}: {dt:7.2f} ms/iter (pipelined, bs={bs} n={n} m={m})")
        return dist, idx

    de, ie = run("three_nn exact", lambda u, k: three_nn(u, k, impl="exact"))
    dd, id_ = run("three_nn dot  ", lambda u, k: three_nn(u, k, impl="dot"))
    idx_match = float(jnp.mean((ie == id_).astype(jnp.float32)))
    derr = float(jnp.max(jnp.abs(de - dd)))
    print(f"index agreement: {idx_match:.6f}  max |dist| diff: {derr:.3e}")


if __name__ == "__main__":
    main()
