"""Targeted TPU experiments: query regression check, bf16 backbone/MLP,
gather lowering variants. Prints one JSON line per experiment."""

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
    from graspbalance_tpu.models.drp import DRP
    from graspbalance_tpu.nn.layers import SharedMLP

    rng = np.random.default_rng(0)
    bs = 4
    cloud = jnp.asarray(
        make_batch(0, bs, SceneConfig(num_points=20000))["point_clouds"]
    )
    seeds = cloud[:, :1024]
    a = rng.normal(size=(bs, 1024, 3, 3)).astype(np.float32)
    q, _ = np.linalg.qr(a)
    rot = jnp.asarray(q.astype(np.float32))
    RADII = tuple(s * 0.08 for s in (0.25, 0.5, 0.75, 1.0))
    HMAXS = (0.01, 0.02, 0.03, 0.04)

    def force(x):
        return float(jnp.sum(jnp.asarray(x, jnp.float32)))

    def timed(fn, iters=8):
        fn()
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) * 1e3

    z = jnp.zeros((1,), jnp.float32)
    rt = timed(lambda: force(z), iters=10)
    print(json.dumps({"exp": "roundtrip", "ms": round(rt, 1)}), flush=True)

    def report(name, ms):
        print(json.dumps({"exp": name, "net_ms": round(ms - rt, 1)}), flush=True)

    # 1. query regression check (restored per-combo class version)
    f_q = jax.jit(lambda c, s, r: ops.multi_cylinder_query(
        c, s, r, RADII, -0.02, HMAXS, 64))
    report("query_class_percombo", timed(lambda: force(f_q(cloud, seeds, rot))))
    idx = f_q(cloud, seeds, rot)

    # 2. backbone dtype
    for name, dt in (("backbone_f32", jnp.float32), ("backbone_bf16", jnp.bfloat16)):
        drp = DRP(dtype=dt)
        v = jax.jit(lambda r, c, d=drp: d.init(r, c, train=False))(
            jax.random.PRNGKey(0), cloud)
        f = jax.jit(lambda v, c, d=drp: d.apply(v, c, train=False)["fp2_features"])
        report(name, timed(lambda: force(f(v, cloud))))

    # 3. width-grouping scale MLPs dtype
    rel = jnp.asarray(rng.random((bs, 4, 4, 1024, 64, 3), dtype=np.float32))
    for name, dt in (("widthmlp_f32", jnp.float32), ("widthmlp_bf16", jnp.bfloat16)):
        mlp = SharedMLP((64, 128, 256), dtype=dt)
        v = jax.jit(lambda k, x, m=mlp: m.init(k, x, train=False))(
            jax.random.PRNGKey(0), rel[:, 0])

        @jax.jit
        def f(v, rel, m=mlp):
            outs = []
            for ri in range(4):
                o = m.apply(v, rel[:, ri].astype(dt), train=False)
                outs.append(jnp.max(o, axis=3))
            return jnp.concatenate(outs, axis=-1)

        report(name, timed(lambda: force(f(v, rel))))

    # 4. gather variants (idx: (B,4,4,1024,64))
    flat_idx = idx.reshape(bs, 16 * 1024, 64)

    f_g0 = jax.jit(lambda c, i: ops.group_points(c, i))
    report("gather_take_along_axis", timed(lambda: force(f_g0(cloud, flat_idx))))

    @jax.jit
    def f_g1(c, i):
        b, n, ch = c.shape
        flat = c.reshape(b * n, ch)
        g = i.reshape(b, -1) + (jnp.arange(b, dtype=jnp.int32) * n)[:, None]
        return jnp.take(flat, g.reshape(-1), axis=0)

    report("gather_flat_take", timed(lambda: force(f_g1(cloud, flat_idx))))

    cloud_bf16 = cloud.astype(jnp.bfloat16)

    f_g2 = jax.jit(lambda c, i: ops.group_points(c, i))
    report("gather_bf16_rows", timed(lambda: force(f_g2(cloud_bf16, flat_idx))))

    cloud4 = jnp.pad(cloud, ((0, 0), (0, 0), (0, 1)))
    f_g3 = jax.jit(lambda c, i: ops.group_points(c, i))
    report("gather_f32x4_rows", timed(lambda: force(f_g3(cloud4, flat_idx))))

    # gather WIDE rows: fetch per (seed,slot) once for the largest combo only
    idx1 = idx[:, 3, 3].reshape(bs, 1024, 64)
    f_g4 = jax.jit(lambda c, i: ops.group_points(c, i))
    report("gather_single_combo", timed(lambda: force(f_g4(cloud, idx1))))


if __name__ == "__main__":
    main()
