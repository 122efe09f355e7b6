"""Per-op timings of the reduced label pipeline's pieces (real TPU, bs=2,
production shapes) to localize its regression vs the full path."""

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

    B, P, V, A, D, NS = 2, 4096, 300, 12, 4, 1024
    AD = A * D
    rng = np.random.default_rng(0)
    lab_full = jnp.asarray(rng.random((B, P, V, A, D), dtype=np.float32))
    wid_full = jnp.asarray(rng.random((B, P, V, A, D), dtype=np.float32))
    nn = jnp.asarray(rng.integers(0, P, (B, NS)).astype(np.int32))
    svi = jnp.asarray(rng.integers(0, V, (B, NS, V)).astype(np.int32))
    lab_g = jnp.asarray(rng.random((B, NS, V, A, D), dtype=np.float32))
    wid_g = jnp.asarray(rng.random((B, NS, V, A, D), dtype=np.float32))
    pv = jnp.asarray(rng.random((B, NS, V), dtype=np.float32))

    def force(x):
        return float(jnp.sum(jnp.asarray(x, jnp.float32)))

    def timed(fn, iters=6):
        fn()
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) * 1e3

    z = jnp.zeros((1,), jnp.float32)
    rt = timed(lambda: force(z), iters=10)
    print(json.dumps({"prim": "roundtrip", "ms": round(rt, 1)}), flush=True)

    def rep(name, ms):
        print(json.dumps({"prim": name, "net_ms": round(ms - rt, 1)}), flush=True)

    # a) seed-level row gather of the big arrays (both impls do this)
    @jax.jit
    def f_a(arr, nn):
        return jax.vmap(lambda a, r: jnp.take(a, r, axis=0))(arr, nn)

    rep("seed_row_gather", timed(lambda: force(f_a(lab_full, nn))))

    # b) per-view raw max over (A,D) of the gathered tensor
    @jax.jit
    def f_b(x):
        return jnp.max(x, axis=(-2, -1))

    rep("perview_max", timed(lambda: force(f_b(lab_g))))

    # c) rescale + per-view max AND argmax over the flattened AD axis
    @jax.jit
    def f_c(lab, wid):
        mask = jnp.logical_and(lab > 0.3, wid <= 0.8)
        resc = jnp.where(mask, jnp.log(1.3 / jnp.maximum(lab, 1e-12)), 0.0)
        flat = resc.reshape(resc.shape[:3] + (AD,))
        return jnp.max(flat, axis=-1), jnp.argmax(flat, axis=-1)

    rep("rescale_max_argmax", timed(lambda: force(f_c(lab_g, wid_g)[0])))

    # c2) same but argmax replaced by min-iota-where (plain reduces only)
    @jax.jit
    def f_c2(lab, wid):
        mask = jnp.logical_and(lab > 0.3, wid <= 0.8)
        resc = jnp.where(mask, jnp.log(1.3 / jnp.maximum(lab, 1e-12)), 0.0)
        flat = resc.reshape(resc.shape[:3] + (AD,))
        m = jnp.max(flat, axis=-1)
        iota = jnp.arange(AD, dtype=jnp.int32)
        arg = jnp.min(
            jnp.where(flat == m[..., None], iota, jnp.int32(AD)), axis=-1
        )
        return m, arg

    rep("rescale_max_miniota", timed(lambda: force(f_c2(lab_g, wid_g)[0])))

    # d) last-axis permute of (B,NS,V) via take_along_axis
    @jax.jit
    def f_d(pv, svi):
        return jnp.take_along_axis(pv, svi, axis=-1)

    rep("perm_taa", timed(lambda: force(f_d(pv, svi))))

    # d2) same permute via flat take on (B*NS*V,) global rows
    @jax.jit
    def f_d2(pv, svi):
        flat = pv.reshape(-1)
        base = (
            jnp.arange(B * NS, dtype=jnp.int32).reshape(B, NS, 1) * V
        )
        return jnp.take(flat, (base + svi).reshape(-1), axis=0).reshape(B, NS, V)

    rep("perm_flat_take", timed(lambda: force(f_d2(pv, svi))))

    # d3) same permute via one-hot matmul at HIGHEST (exact)
    @jax.jit
    def f_d3(pv, svi):
        oh = jax.nn.one_hot(svi, V, dtype=jnp.float32)
        return jnp.einsum(
            "bsvw,bsw->bsv", oh, pv, precision=jax.lax.Precision.HIGHEST
        )

    rep("perm_onehot", timed(lambda: force(f_d3(pv, svi))))

    # e) top-view 192-byte row takes from the raw (B,P,V,A,D) arrays
    tv = jnp.asarray(rng.integers(0, V, (B, NS)).astype(np.int32))

    @jax.jit
    def f_e(arr, nn, tv):
        def one(a, r):
            return jnp.take(a.reshape(P * V, AD), r, axis=0)

        return jax.vmap(one)(arr, nn * V + tv)

    rep("topview_take_x3", timed(lambda: force(
        f_e(lab_full, nn, tv) + f_e(wid_full, nn, tv) + f_e(lab_full, nn, tv)
    )))


if __name__ == "__main__":
    main()
