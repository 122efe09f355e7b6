"""A/B the multi-combo extraction-matmul grouping (GB_QUERY_EXTRACT_GROUP).

Grouping g combos per extraction matmul raises the MXU M dimension from
nsample (=64) to g*64; see ops/query.py _first_k_from_class_group. Sweeps
g over 1/2/4/8/16 at the production query shape, asserts bit-exactness vs
g=1, prints one JSON line per setting (net ms, RTT subtracted).
"""

import json
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

    from graspbalance_tpu import ops
    from graspbalance_tpu.data.synthetic import SceneConfig, make_batch
    from graspbalance_tpu.ops import query as qmod

    rng = np.random.default_rng(0)
    bs = 4
    cloud = jnp.asarray(
        make_batch(0, bs, SceneConfig(num_points=20000))["point_clouds"]
    )
    seeds = cloud[:, :1024]
    a = rng.normal(size=(bs, 1024, 3, 3)).astype(np.float32)
    q, _ = np.linalg.qr(a)
    rot = jnp.asarray(q.astype(np.float32))
    radii = tuple(s * 0.08 for s in (0.25, 0.5, 0.75, 1.0))
    hmaxs = (0.01, 0.02, 0.03, 0.04)

    def force(x):
        return float(jnp.sum(jnp.asarray(x, jnp.float32)))

    for _ in range(3):
        force(jnp.zeros(()))
    t0 = time.perf_counter()
    for _ in range(8):
        force(jnp.zeros(()))
    rtt = (time.perf_counter() - t0) / 8 * 1e3
    print(json.dumps({"rtt_ms": round(rtt, 2)}), flush=True)

    base = None
    for g in (1, 2, 4, 8, 16):
        qmod.set_query_extract_group(g)

        def run(c, s, r):
            return ops.multi_cylinder_query(
                c[..., :3], s[..., :3], r, radii, -0.02, hmaxs, 64
            )

        f = jax.jit(run)
        idx = f(cloud, seeds, rot)
        force(idx)
        ts = []
        for _ in range(10):
            t1 = time.perf_counter()
            force(f(cloud, seeds, rot))
            ts.append(time.perf_counter() - t1)
        ms = float(np.median(ts)) * 1e3 - rtt
        if base is None:
            base = np.asarray(idx)
        else:
            np.testing.assert_array_equal(np.asarray(idx), base)
        print(json.dumps({"group": g, "net_ms": round(ms, 2)}), flush=True)
    qmod.set_query_extract_group(1)


if __name__ == "__main__":
    main()
