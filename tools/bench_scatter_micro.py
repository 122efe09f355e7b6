"""Standalone TPU micro-bench of the feature-gather backward (scatter-add).

The train backward's dominant cost is the scatter-add VJPs of the backbone
feature gathers (round-2 profile: ~54 ms of the 146 ms bs=2 step). Every
feature gather's DESTINATION is small (<= 2048 rows — stage-1 gathers only
xyz, which carries no gradient), so the scatter is MXU-amenable as a
transposed one-hot matmul. This tool times, per hot shape:

  xla      grad of the production gather (XLA scatter-add)
  onehot   ops/gather set_gather_vjp('onehot') chunked einsum (HIGHEST)
  pallas   ops/pallas/scatter_kernel.scatter_add_matmul (if present)

Net ms printed with the ~29 ms tunnel RTT subtracted (one blocked call per
iteration). Run: python tools/bench_scatter_micro.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (name, B, N dest rows, C channels, idx shape tail)
SHAPES = [
    ("block1_localagg", 2, 2048, 128, (2048, 64)),
    ("sa2_gather", 2, 2048, 128, (1024, 32)),
    ("block2_localagg", 2, 1024, 256, (1024, 32)),
    ("block3_localagg", 2, 512, 256, (512, 16)),
]


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from graspbalance_tpu import ops
    from graspbalance_tpu.ops import gather as gmod

    rng = np.random.default_rng(0)

    def force(x):
        return float(jnp.sum(jnp.asarray(x, jnp.float32)))

    for _ in range(3):  # backend init + compile outside the RTT window
        force(jnp.zeros(()))
    t0 = time.perf_counter()
    for _ in range(8):
        force(jnp.zeros(()))
    rtt = (time.perf_counter() - t0) / 8 * 1e3

    def timed(fn, iters=8):
        fn()
        ts = []
        for _ in range(iters):
            t1 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t1)
        return float(np.median(ts)) * 1e3 - rtt

    print(json.dumps({"piece": "roundtrip", "ms": round(rtt, 1)}), flush=True)

    for name, b, n, c, tail in SHAPES:
        pts = jnp.asarray(rng.standard_normal((b, n, c)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, n, (b,) + tail).astype(np.int32))
        ct = jnp.asarray(
            rng.standard_normal((b,) + tail + (c,)).astype(np.float32)
        )

        def loss(p, idx=idx, ct=ct):
            return jnp.sum(ops.group_points(p, idx) * ct)

        grads = {}
        for mode in ("xla", "onehot"):
            gmod.set_gather_vjp(mode)
            try:
                g = jax.jit(jax.grad(loss))
                ms = timed(lambda: force(g(pts)))
                grads[mode] = np.asarray(g(pts))
            finally:
                gmod.set_gather_vjp("xla")
            print(
                json.dumps({"shape": name, "mode": mode, "net_ms": round(ms, 2)}),
                flush=True,
            )

        try:
            from graspbalance_tpu.ops.pallas.scatter_kernel import (
                scatter_add_matmul,
            )
        except ImportError:
            continue
        for cd in ("float32", "bfloat16"):
            f = jax.jit(
                lambda ct, idx, n=n, cd=cd: scatter_add_matmul(
                    ct.reshape(ct.shape[0], -1, ct.shape[-1]),
                    idx.reshape(idx.shape[0], -1),
                    n,
                    compute_dtype=cd,
                )
            )
            ms = timed(lambda: force(f(ct, idx)))
            g = np.asarray(f(ct, idx))
            ref = grads["xla"]
            scale = max(np.abs(ref).max(), 1e-6)
            print(
                json.dumps(
                    {
                        "shape": name,
                        "mode": f"pallas_{cd}",
                        "net_ms": round(ms, 2),
                        "max_absdiff_over_scale": round(
                            float(np.abs(g - ref).max() / scale), 6
                        ),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
