"""TPU micro-benchmark: knn method='exact' (k masked argmin passes) vs
'topk' (lax.top_k full sort) vs 'approx' (TPU approx-top-k unit) at the DSN
point-transformer shapes, plus index agreement.

Usage: python tools/bench_knn.py [batch] [n] [k]
"""

import os
import sys
import time

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
    from graspbalance_tpu.ops.knn import knn

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    cloud = jnp.asarray(
        make_batch(0, bs, SceneConfig(num_points=max(n, 256)))["point_clouds"]
    )[:, :n, :3]

    def run(name, method):
        f = jax.jit(lambda c: knn(c, c, k, method=method))
        dist, idx = f(cloud)
        float(jnp.sum(dist) + jnp.sum(idx))  # force remote completion
        reps = 10
        t0 = time.perf_counter()
        acc = None
        for _ in range(reps):
            acc = f(cloud)
        float(jnp.sum(acc[0]) + jnp.sum(acc[1]))
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"knn {name:6s}: {dt:7.2f} ms/iter (pipelined, bs={bs} n={n} k={k})")
        return idx

    ie = run("exact", "exact")
    it = run("topk", "topk")
    ia = run("approx", "approx")
    print(
        "exact==topk:",
        float(jnp.mean((ie == it).astype(jnp.float32))),
        " approx recall:",
        float(jnp.mean((ia == it).astype(jnp.float32))),
    )


if __name__ == "__main__":
    main()
