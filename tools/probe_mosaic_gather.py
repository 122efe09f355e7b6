"""Probe: which dynamic-gather forms does Mosaic lower on this TPU?

Decides feasibility of a VMEM-resident-table gather kernel for the width
grouping gather (models/heads.py seed-major group_points, 7.6 ms at bs=4,
hardware random-access bound via XLA — docs/NOTES.md round 3).

Mosaic lowers lax.gather ONLY in the same-shape take_along_axis form
(lowering.py _gather_lowering_rule): x (M, N), idx (M, N) -> out (M, N),
out[i,j] = x[idx[i,j], j] (dim 0) or x[i, idx[i,j]] (dim 1), via
tpu.dynamic_gather. Open questions this probe answers empirically:
  * does dim-0 gather handle indices spanning the FULL sublane extent
    (cross-vreg), or only within a vreg (mod-8 wrap / compile error)?
  * at what M does it still compile, and how fast is it vs XLA's gather?
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def report(name, fn):
    try:
        out, ref = fn()
        ok = np.allclose(np.asarray(out), np.asarray(ref))
        print(f"{name}: {'OK' if ok else 'WRONG RESULT'}", flush=True)
    except Exception as e:  # noqa: BLE001
        msg = repr(e).replace("\n", " ")[:300]
        print(f"{name}: FAIL {msg}", flush=True)


def _same_shape_case(m, n, axis, seed):
    table = jnp.asarray(np.random.RandomState(seed).rand(m, n).astype(np.float32))
    hi = m if axis == 0 else n
    idx = jnp.asarray(
        np.random.RandomState(seed + 1).randint(0, hi, (m, n)), jnp.int32
    )

    def kernel(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=axis)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(table, idx)
    return out, jnp.take_along_axis(table, idx, axis=axis)


def bench_dim0(m, n):
    """Net ms/call for the same-shape dim-0 gather at (m, n), pipelined."""
    table = jnp.asarray(np.random.RandomState(7).rand(m, n).astype(np.float32))
    idx = jnp.asarray(np.random.RandomState(8).randint(0, m, (m, n)), jnp.int32)

    def kernel(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )

    @jax.jit
    def run(t, i):
        return jnp.sum(call(t, i))

    @jax.jit
    def run_xla(t, i):
        return jnp.sum(jnp.take_along_axis(t, i, axis=0))

    for runner, tag in ((run, "pallas"), (run_xla, "xla")):
        float(runner(table, idx))  # compile
        iters = 50
        t0 = time.perf_counter()
        acc = None
        for _ in range(iters):
            acc = runner(table, idx)
        float(acc)
        dt = (time.perf_counter() - t0) / iters * 1e3
        rows = m * n
        print(
            f"bench_dim0 {tag} ({m},{n}): {dt:.3f} ms/call "
            f"({rows / (dt * 1e-3) / 1e9:.2f} G elems/s)",
            flush=True,
        )


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    report("dim0 (512,128)", lambda: _same_shape_case(512, 128, 0, 0))
    report("dim0 (19968,128)", lambda: _same_shape_case(19968, 128, 0, 10))
    report("dim1 (512,128)", lambda: _same_shape_case(512, 128, 1, 20))
    report("dim0 (2048,512)", lambda: _same_shape_case(2048, 512, 0, 30))
    bench_dim0(19968, 128)
