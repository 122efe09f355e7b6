"""Primitive-level timings for the label-pipeline restructure (real TPU).

Shapes: P=4096 label points, V=300 views, A=12, D=4, Ns=1024 seeds, B=2.
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

    B, P, V, A, D, NS = 2, 4096, 300, 12, 4, 1024
    rng = np.random.default_rng(0)
    arr = jnp.asarray(rng.random((B, P, V, A, D), dtype=np.float32))
    nn = jnp.asarray(rng.integers(0, P, (B, NS)).astype(np.int32))
    vi = jnp.asarray(rng.integers(0, V, (B, NS, V)).astype(np.int32))

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

    # a) two-step: wide row gather + per-view 48-float slices (original)
    @jax.jit
    def f_a(arr, nn, vi):
        def one(arr, nn, vi):
            rows = arr[nn]  # (Ns,V,A,D)
            return jnp.take_along_axis(rows, vi[..., None, None], axis=1)
        return jax.vmap(one)(arr, nn, vi)

    rep("twostep_taa", timed(lambda: force(f_a(arr, nn, vi))))

    # b) flat take over (P*V, A*D)
    @jax.jit
    def f_b(arr, nn, vi):
        def one(arr, nn, vi):
            flat = arr.reshape(P * V, A * D)
            gidx = nn[:, None] * V + vi
            return jnp.take(flat, gidx.reshape(-1), axis=0).reshape(NS, V, A, D)
        return jax.vmap(one)(arr, nn, vi)

    rep("flat_take", timed(lambda: force(f_b(arr, nn, vi))))

    # c) full-array masked min over (A,D): (B,P,V) output
    w = jnp.asarray(rng.random((B, P, V, A, D), dtype=np.float32))

    @jax.jit
    def f_c(arr, w):
        m = jnp.logical_and(arr > 0.3, w <= 0.8)
        return jnp.min(jnp.where(m, arr, jnp.inf), axis=(-2, -1))

    rep("masked_min_pass", timed(lambda: force(f_c(arr, w))))

    # d) per-seed V-permutation of (Ns,V) values via take_along_axis
    pv = jnp.asarray(rng.random((B, P, V), dtype=np.float32))

    @jax.jit
    def f_d(pv, nn, vi):
        rows = jnp.take_along_axis(pv, nn[..., None], axis=1)  # (B,Ns,V)
        return jnp.take_along_axis(rows, vi, axis=2)

    rep("perm_taa_lastaxis", timed(lambda: force(f_d(pv, nn, vi))))

    # e) same permutation via one-hot einsum (exactness separately verified)
    @jax.jit
    def f_e(pv, nn, vi):
        rows = jnp.take_along_axis(pv, nn[..., None], axis=1)  # (B,Ns,V)
        oh = jax.nn.one_hot(vi, V, dtype=jnp.float32)  # (B,Ns,V,V)
        return jnp.einsum("bsvw,bsw->bsv", oh, rows,
                          precision=jax.lax.Precision.HIGHEST)

    rep("perm_onehot_einsum", timed(lambda: force(f_e(pv, nn, vi))))

    # f) top-view-only gather: (B,Ns) rows of (A*D) floats
    tv = jnp.asarray(rng.integers(0, V, (B, NS)).astype(np.int32))

    @jax.jit
    def f_f(arr, nn, vi, tv):
        def one(arr, nn, vi, tv):
            vsel = jnp.take_along_axis(vi, tv[:, None], axis=1)[:, 0]  # (Ns,)
            flat = arr.reshape(P * V, A * D)
            return jnp.take(flat, nn * V + vsel, axis=0)
        return jax.vmap(one)(arr, nn, vi, tv)

    rep("topview_only_take", timed(lambda: force(f_f(arr, nn, vi, tv))))


if __name__ == "__main__":
    main()
