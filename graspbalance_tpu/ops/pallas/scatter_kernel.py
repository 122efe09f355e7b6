"""Scatter-add as one-hot MXU matmuls, VMEM-resident — the gather backward.

XLA lowers the scatter-add VJP of a feature gather to a serialized
dynamic-update loop (~1 row/several cycles on TPU; the reference's CUDA
equivalent is the atomicAdd backward of group_points_gpu.cu:86). But every
feature gather in this model scatters into a SMALL destination (<= 2048
rows — stage-1 gathers only xyz, which carries no gradient), so the same
reduction is a matmul: grad = onehot(idx)^T @ ct. Materializing the one-hot
in HBM costs more than it saves (measured: the chunked-einsum 'onehot' VJP
is a wash vs XLA's scatter); this kernel instead builds each
(row_chunk, tile_n) one-hot tile in VMEM with an iota-compare and feeds the
MXU directly — the one-hot never touches HBM, and the only extra HBM
traffic is re-reading the cotangent once per destination tile.

Grid (B, n_tiles, row_chunks), row-chunk innermost: the (tile_n, C) output
block stays VMEM-resident while all row chunks accumulate into it.

Cost model at the block-1 shape (B=2, R=131k rows, N=2048, C=128):
compares 268M (~0.3 ms), bf16 matmul 137 GFLOP (~0.7 ms), ct re-read
8 x 33 MB (~0.35 ms) — vs ~an order of magnitude more for the serialized
scatter. compute_dtype='float32' runs the one-hot matmul in the MXU's
3-pass f32 mode (bit-identical one-hot operand; cotangent mantissas kept);
'bfloat16' is ~3x faster on the MXU with cotangents rounded to bf16
(accumulation stays f32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scatter_kernel(
    idx_ref, ct_ref, out_ref, *, tile_n: int, row_chunk: int, compute_dtype
):
    rc = pl.program_id(2)
    nt = pl.program_id(1)

    @pl.when(rc == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    # rows (1, row_chunk) int32 on lanes; -1 padding matches no column.
    # The one-hot is built TRANSPOSED — destinations on sublanes, rows on
    # lanes — so the lane-major index vector needs no relayout and the dot
    # is a plain (tile_n, row_chunk) @ (row_chunk, C) MXU matmul.
    rows = idx_ref[0, :, pl.ds(rc * row_chunk, row_chunk)]
    base = nt * tile_n
    dest = base + jax.lax.broadcasted_iota(
        jnp.int32, (tile_n, row_chunk), 0
    )
    onehot_t = (dest == rows).astype(compute_dtype)  # (tile_n, row_chunk)
    ct = ct_ref[0].astype(compute_dtype)  # (row_chunk, C)
    # HIGHEST precision is load-bearing for compute_dtype=f32: at default
    # precision Mosaic runs the f32 dot as a SINGLE bf16 MXU pass, which
    # rounds the cotangent mantissas to ~2^-9 relative — the root cause of
    # the round-4 "1.31x composition mismatch" (integer-cotangent parity
    # tests masked it: small integers are exact in bf16). Measured on v5e
    # 2026-08-20: stage-op grad diff vs the XLA scatter 1.9e-3 of scale at
    # default precision -> reassociation-level with HIGHEST
    # (tools/repro_scatter_vjp.py). bf16 compute_dtype keeps one pass.
    precision = (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    out_ref[0] += jax.lax.dot(
        onehot_t, ct, preferred_element_type=jnp.float32,
        precision=precision,
    )


@functools.partial(
    jax.jit,
    static_argnames=("n", "tile_n", "row_chunk", "compute_dtype", "interpret"),
)
def scatter_add_matmul(
    ct: jnp.ndarray,
    idx: jnp.ndarray,
    n: int,
    *,
    tile_n: int = 256,
    row_chunk: int = 2048,
    compute_dtype: str = "float32",
    interpret: bool = False,
) -> jnp.ndarray:
    """sum-scatter ct rows into an (B, n, C) zero tensor at per-batch idx.

    ct (B, R, C) float32; idx (B, R) int32 in [0, n) (negative = dropped);
    returns (B, n, C) float32 == jnp.zeros(...).at[b, idx[b]].add(ct[b]).
    Duplicate indices accumulate in f32 (summation order differs from
    XLA's scatter: fp reassociation only; the one-hot operand is exact in
    either compute dtype).
    """
    b, r, c = ct.shape
    cdt = jnp.dtype(compute_dtype)

    row_chunk = min(row_chunk, _round_up(r, 512))
    rc_pad = -r % row_chunk
    if rc_pad:
        ct = jnp.pad(ct, ((0, 0), (0, rc_pad), (0, 0)))
        idx = jnp.pad(idx, ((0, 0), (0, rc_pad)), constant_values=-1)
    n_pad = -n % tile_n
    n_tiles = (n + n_pad) // tile_n
    r_tot = ct.shape[1]
    chunks = r_tot // row_chunk

    kernel = functools.partial(
        _scatter_kernel, tile_n=tile_n, row_chunk=row_chunk, compute_dtype=cdt
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles, chunks),
        in_specs=[
            # the full (1, R) index row stays VMEM-resident per batch row
            # (int32, <= ~1 MB at production shapes); the kernel slices its
            # chunk — a (1, row_chunk) block would violate Mosaic's
            # second-minor block-divisibility rule for the (B, 1, R) array
            pl.BlockSpec(
                (1, 1, r_tot), lambda bi, nt, rc: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, row_chunk, c), lambda bi, nt, rc: (bi, rc, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_n, c), lambda bi, nt, rc: (bi, nt, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n + n_pad, c), jnp.float32),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(idx.astype(jnp.int32).reshape(b, 1, r_tot), ct)
    return out[:, :n] if n_pad else out


def _round_up(x: int, m: int = 512) -> int:
    return ((x + m - 1) // m) * m


def _compiler_params():
    cp = getattr(pltpu, "CompilerParams", None) or getattr(
        pltpu, "TPUCompilerParams"
    )
    try:
        return cp(vmem_limit_bytes=100 * 1024 * 1024)
    except (TypeError, AttributeError):  # older signature
        return cp()
