"""TPU micro-benchmark: selection-only Pallas kernel vs the XLA index path
for the 16-combo cylinder query at production shape, plus bit-exactness."""

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

    rng = np.random.default_rng(0)
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cloud = jnp.asarray(
        make_batch(0, bs, SceneConfig(num_points=20000))["point_clouds"]
    )
    seeds = cloud[:, :1024]
    a = rng.normal(size=(bs, 1024, 3, 3)).astype(np.float32)
    q, _ = np.linalg.qr(a)
    rot = jnp.asarray(q.astype(np.float32))
    RADII = tuple(s * 0.08 for s in (0.25, 0.5, 0.75, 1.0))
    HMAXS = (0.01, 0.02, 0.03, 0.04)

    def run(impl, **kw):
        f = jax.jit(lambda c, s, r: ops.multi_cylinder_query(
            c, s, r, RADII, -0.02, HMAXS, 64, impl=impl, **kw))
        out = f(cloud, seeds, rot)
        float(jnp.sum(out))  # force
        n = 10
        t0 = time.perf_counter()
        acc = None
        for _ in range(n):
            acc = f(cloud, seeds, rot)
        float(jnp.sum(acc))
        dt = (time.perf_counter() - t0) / n * 1e3
        return out, dt

    out_x, t_x = run("xla")
    print(f"xla:           {t_x:7.2f} ms/iter (pipelined)")
    out_p, t_p = run("pallas_select")
    eq = bool(jnp.all(out_p == out_x))
    print(f"pallas (e2e):  {t_p:7.2f} ms/iter  bit-exact={eq}")
    assert eq, "MISMATCH vs XLA path"

    # kernel-only sweep over rows_per_step on a precomputed class plane
    from graspbalance_tpu.ops.pallas.select_kernel import multicyl_select
    from graspbalance_tpu.ops.query import _class_plane

    @jax.jit
    def make_cls(c, s, r):
        def per_batch(pts, ctr, rc):
            delta = ctr[:, None, :] - pts[None, :, :]
            xr = -jnp.einsum("cnk,ck->cn", delta, rc[:, :, 0])
            yr = -jnp.einsum("cnk,ck->cn", delta, rc[:, :, 1])
            zr = -jnp.einsum("cnk,ck->cn", delta, rc[:, :, 2])
            return _class_plane(
                xr, yr * yr + zr * zr, RADII, -0.02, HMAXS
            ).astype(jnp.bfloat16)

        return jax.vmap(per_batch)(c, s, r)

    cls = make_cls(cloud, seeds, rot).reshape(bs * 1024, 20000)
    float(jnp.sum(cls.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(10):
        acc = make_cls(cloud, seeds, rot)
    float(jnp.sum(acc.astype(jnp.float32)))
    print(f"class plane:   {(time.perf_counter() - t0) / 10 * 1e3:7.2f} ms/iter")

    for rps in (8, 16, 32):
        f = jax.jit(lambda x: multicyl_select(x, 4, 4, 64, rows_per_step=rps))
        try:
            out = f(cls)
        except Exception as e:  # noqa: BLE001
            print(f"select rps={rps}: FAILED {str(e)[:120]}")
            continue
        float(jnp.sum(out))
        t0 = time.perf_counter()
        for _ in range(10):
            acc = f(cls)
        float(jnp.sum(acc))
        print(f"select rps={rps}: {(time.perf_counter() - t0) / 10 * 1e3:7.2f} ms/iter")


if __name__ == "__main__":
    main()
