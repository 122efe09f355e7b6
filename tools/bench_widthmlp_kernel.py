"""TPU micro-benchmark: fused width-MLP kernel vs the XLA SharedMLP path.

Measures the isolated scale-MLP+maxpool stage at bench shapes
(B, R=4, H=4, S=1024, K=64, widths 64-128-256) for the XLA per-scale
path and width_mlp_fused across s_tile / compute_dtype, plus parity.

Usage: python tools/bench_widthmlp_kernel.py [batch]
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

    from graspbalance_tpu.ops.pallas.widthmlp_kernel import width_mlp_fused

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    r, h, s, k = 4, 4, 1024, 64
    widths = (64, 128, 256)
    rng = np.random.default_rng(0)
    rel = jnp.asarray(
        rng.standard_normal((bs, r, h, s, k, 3)).astype(np.float32)
    )
    weights = []
    for _ in range(r):
        ws, cin = [], 3
        for c in widths:
            ws.append(
                (
                    jnp.asarray(
                        (rng.standard_normal((cin, c)) / np.sqrt(cin)).astype(
                            np.float32
                        )
                    ),
                    jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1),
                )
            )
            cin = c
        weights.append(tuple(ws))
    weights = tuple(weights)

    @jax.jit
    def xla_path(rel):
        outs = []
        for ri in range(r):
            x = rel[:, ri]
            for w, b in weights[ri]:
                x = jnp.maximum(x @ w + b, 0.0)
            outs.append(jnp.max(x, axis=3))
        return jnp.concatenate(outs, axis=-1)

    def run(name, f):
        out = f(rel)
        float(jnp.sum(out[..., :1]))
        reps = 10
        t0 = time.perf_counter()
        acc = None
        for _ in range(reps):
            acc = f(rel)
        float(jnp.sum(acc[..., :1]))
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name}: {dt:7.2f} ms/iter (pipelined, bs={bs})")
        return out

    want = run("xla per-scale           ", xla_path)
    for st in (16, 32, 64):
        for dt_name, cdt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            got = run(
                f"fused st={st:3d} {dt_name:4s}      ",
                lambda x, st=st, cdt=cdt: width_mlp_fused(
                    x, weights, s_tile=st, compute_dtype=cdt
                ),
            )
            err = float(
                jnp.max(jnp.abs(got - want))
                / (float(jnp.max(jnp.abs(want))) + 1e-9)
            )
            print(f"    max rel err vs xla: {err:.2e}")


if __name__ == "__main__":
    main()
