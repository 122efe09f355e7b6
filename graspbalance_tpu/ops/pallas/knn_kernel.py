"""Fused Pallas TPU kernel for exact k-nearest-neighbor selection.

The XLA 'exact' impl in ops/knn.py (k masked argmin passes, fused
delta-form) re-computes the (Q, R) distance matrix on every pass because
XLA will not materialize it (round trip through HBM costs more — the
measured 'dot' negative result, ops/knn.py three_nn docstring). This kernel
gets the best of both: the distance tile is computed ONCE into VMEM and the
k argmin passes scan it there, so the FMA work drops k-fold with no HBM
traffic added.

Serves both `knn` (DSN point-transformer, k=16 at (4, 2048/1024)) and
`three_nn` (DSN/OBS upsample, k=3 at (4, 20000, 1024)) — reference
semantics (KNN/Pytorch_CUDA_KNN/cuda/knn.cu, interpolate_gpu.cu:14-73):
ties resolve to the lower index, distances ascending.

Grid: (B, ceil(Q / tq)). Per step: d2 (tq, R) f32 built by three
rank-broadcast FMA passes (query cols (tq, 1) x ref rows (1, R)), then k
sequential min/where passes entirely in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_BIG = 1e30
# scoped VMEM budget for the kernel's live buffers (the v5e limit is 16 MB;
# leave headroom for inputs/outputs/spills). The kernel keeps two
# (tq, r_pad) planes live — d2 f32 and the column iota i32.
_VMEM_BUDGET_BYTES = 10 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fit_tq(r_pad: int, requested: int) -> int:
    """Largest query-tile height <= requested whose two (tq, r_pad) 4-byte
    planes fit the scoped VMEM budget (at (4096, 20096) the default tq=256
    compile-OOMs: 27.6 MB vs the 16 MB limit — measured on v5e)."""
    tq = requested
    while tq > 8 and 2 * tq * r_pad * 4 > _VMEM_BUDGET_BYTES:
        tq //= 2
    return tq


def _knn_kernel(q_ref, r_ref, dist_ref, idx_ref, *, k: int, r_actual: int):
    # q_ref (1, tq, 128>=3); r_ref (1, 3, Rpad); outputs (1, tq, kpad)
    tq = q_ref.shape[1]
    r_pad = r_ref.shape[-1]
    d2 = jnp.zeros((tq, r_pad), jnp.float32)
    for c in range(3):
        qc = q_ref[0, :, c : c + 1]  # (tq, 1)
        rc = r_ref[0, c : c + 1, :]  # (1, Rpad)
        delta = qc - rc
        d2 = d2 + delta * delta
    col = lax.broadcasted_iota(jnp.int32, (tq, r_pad), 1)
    if r_pad != r_actual:
        # padded ref rows must never win
        d2 = jnp.where(col < r_actual, d2, _BIG)

    for i in range(k):
        mn = jnp.min(d2, axis=1, keepdims=True)  # (tq, 1)
        best = jnp.min(
            jnp.where(d2 == mn, col, r_pad), axis=1, keepdims=True
        ).astype(jnp.int32)
        dist_ref[0, :, i : i + 1] = mn
        idx_ref[0, :, i : i + 1] = best
        if i + 1 < k:
            d2 = jnp.where(col == best, _BIG, d2)


@functools.partial(jax.jit, static_argnames=("k", "tq", "interpret"))
def knn_pallas(
    query: jnp.ndarray,
    ref: jnp.ndarray,
    k: int,
    *,
    tq: int = 256,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact k-NN: query (B, Q, 3), ref (B, R, 3) -> (dist, idx) with
    dist (B, Q, k) EUCLIDEAN (sqrt'd) ascending and idx (B, Q, k) int32,
    ties to the lower index — identical to ops.knn(method='exact')."""
    b, q, _ = query.shape
    r = ref.shape[1]
    r_pad = _round_up(r, _LANES)
    tq = _fit_tq(r_pad, tq)
    q_pad = _round_up(q, tq)
    qp = query.astype(jnp.float32)
    if q_pad != q:
        qp = jnp.pad(qp, ((0, 0), (0, q_pad - q), (0, 0)))
    rp = jnp.transpose(ref.astype(jnp.float32), (0, 2, 1))  # (B, 3, R)
    if r_pad != r:
        rp = jnp.pad(rp, ((0, 0), (0, 0), (0, r_pad - r)))
    k_pad = _round_up(k, _LANES)

    kernel = functools.partial(_knn_kernel, k=k, r_actual=r)
    dist, idx = pl.pallas_call(
        kernel,
        grid=(b, q_pad // tq),
        in_specs=[
            pl.BlockSpec((1, tq, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, r_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tq, k_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, k_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, q_pad, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, q_pad, k_pad), jnp.int32),
        ],
        interpret=interpret,
    )(qp, rp)
    dist = jnp.sqrt(jnp.maximum(dist[:, :q, :k], 0.0))
    return dist, idx[:, :q, :k]
