"""Hardware validation + benchmark for the fused Pallas multicyl kernel.

Run on the real TPU (not under tests/conftest). Prints JSON lines:
  parity check (kernel idx vs XLA multi_cylinder_query, rel vs gather+rotate)
  per-chunk kernel timing at the production shape
  old-path (query + gather + rotate) timing for comparison
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import os

    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from graspbalance_tpu import ops
    from graspbalance_tpu.ops.pallas.multicyl_kernel import multi_cylinder_group

    RADII = (0.02, 0.04, 0.06, 0.08)
    HMIN = -0.02
    HMAXS = (0.01, 0.02, 0.03, 0.04)

    rng = np.random.default_rng(0)

    def force(x):
        return float(jnp.sum(jnp.asarray(x, jnp.float32)))

    # ---- parity on hardware (small) ----
    b, n, m, k = 2, 2048, 256, 64
    cloud = jnp.asarray((rng.random((b, n, 3)) - 0.5).astype(np.float32) * 0.4)
    ci = rng.integers(0, n, size=(b, m))
    centers = jnp.take_along_axis(cloud, jnp.asarray(ci)[..., None], axis=1)
    a = rng.normal(size=(b, m, 3, 3)).astype(np.float32)
    q, _ = np.linalg.qr(a)
    rot = jnp.asarray(q.astype(np.float32))

    idx_ref = np.asarray(
        ops.multi_cylinder_query(cloud, centers, rot, RADII, HMIN, HMAXS, k)
    )
    grouped = ops.group_points(
        cloud, jnp.asarray(idx_ref).reshape(b, 16 * m, k)
    ).reshape(b, 4, 4, m, k, 3)
    rel_ref = grouped - centers[:, None, None, :, None, :]
    rel_ref = np.asarray(jnp.einsum("brhskj,bsji->brhski", rel_ref, rot))

    rel, idx = multi_cylinder_group(
        cloud, centers, rot, RADII, HMIN, HMAXS, k, chunk=16
    )
    idx = np.asarray(idx)
    rel = np.asarray(rel)
    ok_idx = bool((idx == idx_ref).all())
    max_rel_err = float(np.abs(rel - rel_ref).max())
    print(json.dumps({"check": "parity", "idx_exact": ok_idx,
                      "rel_max_abs_err": max_rel_err}), flush=True)

    # ---- production-shape timing ----
    b, n, m, k = 4, 20000, 2048, 64
    cloud = jnp.asarray((rng.random((b, n, 3)) - 0.5).astype(np.float32) * 0.4)
    ci = rng.integers(0, n, size=(b, m))
    centers = jnp.take_along_axis(cloud, jnp.asarray(ci)[..., None], axis=1)
    a = rng.normal(size=(b, m, 3, 3)).astype(np.float32)
    q, _ = np.linalg.qr(a)
    rot = jnp.asarray(q.astype(np.float32))

    def timed(fn, iters=5):
        fn()
        t0 = time.perf_counter()
        for _ in range(iters):
            fn()
        return (time.perf_counter() - t0) / iters * 1e3  # ms

    # model configuration: emit_idx=False, call_chunk slices each pallas_call
    # under the 16 MB scoped-vmem custom-call I/O limit
    for chunk, call_chunk in ((8, 256), (16, 256), (32, 256), (16, 128), (16, 512)):
        try:
            f = jax.jit(
                lambda c, s, r, ch=chunk, cc=call_chunk: multi_cylinder_group(
                    c, s, r, RADII, HMIN, HMAXS, k, chunk=ch, call_chunk=cc,
                    emit_idx=False,
                )[0]
            )
            ms = timed(lambda: force(jnp.sum(f(cloud, centers, rot))))
            print(json.dumps({"bench": "fused_kernel", "chunk": chunk,
                              "call_chunk": call_chunk,
                              "ms_incl_rt": round(ms, 2)}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"bench": "fused_kernel", "chunk": chunk,
                              "call_chunk": call_chunk,
                              "error": str(e)[:400]}), flush=True)

    # old path: query + gather + rotate
    @jax.jit
    def old_path(c, s, r):
        idx = ops.multi_cylinder_query(c, s, r, RADII, HMIN, HMAXS, k)
        grouped = ops.group_points(c, idx.reshape(b, 16 * m, k)).reshape(
            b, 4, 4, m, k, 3
        )
        rel = grouped - s[:, None, None, :, None, :]
        return jnp.einsum("brhskj,bsji->brhski", rel, r)

    ms = timed(lambda: force(jnp.sum(old_path(cloud, centers, rot))))
    print(json.dumps({"bench": "xla_query_gather_rotate",
                      "ms_incl_rt": round(ms, 2)}), flush=True)

    # round-trip floor
    z = jnp.zeros((1,), jnp.float32)
    ms = timed(lambda: force(z), iters=10)
    print(json.dumps({"bench": "roundtrip_floor", "ms": round(ms, 2)}), flush=True)


if __name__ == "__main__":
    main()
