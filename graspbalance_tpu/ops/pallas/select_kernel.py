"""Selection-only Pallas TPU kernel for the 16-combo cylinder query.

The XLA path (ops/query._multi_first_k) runs the rank-position selection
per combo: 16 independent (C, k, T) x (C, T, 128) one-hot extraction
matmuls whose M=64 leaves the MXU at ~15 TF/s, plus 16 re-reads of the
class plane — ~15 ms of the 67 ms bs=4 forward (docs/NOTES.md roadmap #1).
Batching the 16 extractions into one M=1024 einsum in XLA was measured 4x
WORSE because the (C, RH*k, 128) cumsum/compare chains materialize ~134 MB
per center chunk in HBM.

This kernel keeps that whole intermediate in VMEM: per grid step it loads a
(CC, T, 128) block of the class plane once, builds the 16 combos' slot-tile
one-hots, runs ONE well-shaped batched matmul (M = RH*k = 1024) to extract
the slot tiles' class values, and finishes the local rank-position
selection (cumsum + compare) on the VMEM-resident result. HBM traffic drops
to one class-plane read + the (rows, RH, k) index write, and the extraction
matmul runs at full-M MXU utilization.

Scope is selection ONLY — the coordinate pick stays in XLA (the fused
kernel's measured failure mode, ops/pallas/multicyl_kernel.py docstring);
downstream grouping reuses the optimized flat-take gather (ops/gather.py).

Semantics are bit-identical to ops/query._first_k_from_class: first nsample
hits in index order, slots past the hit count hold the first hit's index, 0
when no hits (reference cylinder_query_gpu.cu:20-101). The class encoding
(rc*8+hc, 63 = never-hit) is shared with the XLA path via
ops/query._class_plane; one-hot x class matmuls are exact in bf16
(single nonzero per row, integer values <= 63).

MEASURED OUTCOME (v5e, 2026-08-17, tools/bench_select_kernel.py): bit-exact
but ~4x SLOWER end-to-end than the XLA path (91.8 vs 21.2 ms at bench
shapes). Two compounding causes: (a) the pallas route must materialize the
(B*M, N) bf16 class plane to HBM (~84 ms of chunked einsums + writeback)
where the XLA path recomputes it fused inside each center chunk, and (b)
the kernel itself runs ~80 ms — the serialized 512-step grid (one core runs
every program) leaves the per-step matmul too small to hide the VMEM
cumsum/compare chains. Kept flag-gated (impl='pallas_select') as a
documented negative result; the XLA path stays the default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _cumsum_last(x):
    """Inclusive scan along the last axis (Hillis-Steele log-shift; Mosaic
    has no cumsum lowering). Exact for integer-valued f32 up to 2^24."""
    n = x.shape[-1]
    shift = 1
    while shift < n:
        pad = jnp.zeros(x.shape[:-1] + (shift,), x.dtype)
        x = x + jnp.concatenate([pad, x[..., :-shift]], axis=-1)
        shift *= 2
    return x


def _select_kernel(cls_ref, out_ref, *, n_r: int, n_h: int, nsample: int):
    """cls_ref (CC, T, 128) bf16 class plane block -> out_ref (CC, RH, k)
    int32 first-k indices per combo."""
    cc, t, lanes = cls_ref.shape
    k = nsample
    x16 = cls_ref[:]  # (CC, T, L) bf16, values 0..63 exact
    x = x16.astype(jnp.float32)
    div = jnp.floor(x * 0.125)
    mod = x - div * 8.0

    # Mosaic's tpu.iota is integer-only; build int32 then convert
    js = lax.broadcasted_iota(jnp.int32, (1, k), 1).astype(jnp.float32)
    iota_t = lax.broadcasted_iota(jnp.int32, (1, k, t), 2).astype(jnp.float32)

    onehots = []
    bases = []
    tjs = []
    counts = []
    for ri in range(n_r):
        for hi in range(n_h):
            hit = jnp.logical_and(div <= ri + 0.5, mod <= hi + 0.5)
            cnt = jnp.sum(hit.astype(jnp.float32), axis=-1)  # (CC, T)
            cum = _cumsum_last(cnt)  # (CC, T)
            counts.append(cum[:, -1:])  # (CC, 1)
            # tile of the (j+1)-th hit: #{tiles whose inclusive count <= j}
            tj = jnp.sum(
                (cum[:, :, None] <= js[:, None, :]).astype(jnp.float32),
                axis=1,
            )  # (CC, k)
            tj = jnp.minimum(tj, float(t - 1))
            tjs.append(tj)
            onehot = (tj[:, :, None] == iota_t).astype(jnp.float32)
            excl = cum - cnt  # exclusive cumsum (CC, T)
            bases.append(jnp.sum(onehot * excl[:, None, :], axis=-1))  # (CC, k)
            onehots.append(onehot.astype(jnp.bfloat16))

    one = jnp.concatenate(onehots, axis=1)  # (CC, RH*k, T) bf16
    # ONE extraction matmul for all combos: M = RH*k keeps the MXU busy
    ext = lax.dot_general(
        one,
        x16,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (CC, RH*k, L) exact class values

    for i in range(n_r * n_h):
        ri, hi = divmod(i, n_h)
        e = ext[:, i * k : (i + 1) * k, :]  # (CC, k, L)
        div2 = jnp.floor(e * 0.125)
        mod2 = e - div2 * 8.0
        tiles = jnp.logical_and(div2 <= ri + 0.5, mod2 <= hi + 0.5)
        local_cs = _cumsum_last(tiles.astype(jnp.float32))  # (CC, k, L)
        r = (js + 1.0 - bases[i])[:, :, None]  # (CC, k, 1) local target rank
        pos_local = jnp.sum(
            (local_cs < r).astype(jnp.float32), axis=-1
        )  # (CC, k)
        pos = (tjs[i] * float(lanes) + pos_local).astype(jnp.int32)
        count = counts[i]  # (CC, 1)
        pad = jnp.where(count > 0.0, pos[:, 0:1], 0)
        out_ref[:, i, :] = jnp.where(js < count, pos, pad).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("n_r", "n_h", "nsample", "rows_per_step", "interpret"),
)
def multicyl_select(
    cls: jnp.ndarray,
    n_r: int,
    n_h: int,
    nsample: int,
    rows_per_step: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """(rows, N) bf16 class plane -> (rows, n_r*n_h, nsample) int32.

    cls values: rc*8 + hc in [0, 63], 63 = never-hit (also the N-padding
    value). Indices follow the reference first-k-by-index padding rule.
    """
    rows, n = cls.shape
    t = _round_up(n, _LANES) // _LANES
    rows_pad = _round_up(max(rows, 1), rows_per_step)
    cls = jnp.pad(
        cls,
        ((0, rows_pad - rows), (0, t * _LANES - n)),
        constant_values=jnp.bfloat16(63.0),
    ).reshape(rows_pad, t, _LANES)

    kernel = functools.partial(
        _select_kernel, n_r=n_r, n_h=n_h, nsample=nsample
    )
    out = pl.pallas_call(
        kernel,
        grid=(rows_pad // rows_per_step,),
        in_specs=[
            pl.BlockSpec(
                (rows_per_step, t, _LANES),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (rows_per_step, n_r * n_h, nsample),
            lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (rows_pad, n_r * n_h, nsample), jnp.int32
        ),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(cls)
    return out[:rows]


def _compiler_params():
    cp = getattr(pltpu, "CompilerParams", None) or getattr(
        pltpu, "TPUCompilerParams"
    )
    try:
        return cp(vmem_limit_bytes=100 * 1024 * 1024)
    except (TypeError, AttributeError):  # older signature
        return cp()
