"""Gather/group ops (channels-last).

The reference's gather_points / group_points CUDA kernels with their
atomicAdd backward passes (sampling_gpu.cu:13-62, group_points_gpu.cu:17-101)
reduce to plain XLA gathers here; JAX autodiff produces the deterministic
scatter-add backward for free (vs the reference's nondeterministic atomics).

Layout note: this framework is channels-LAST everywhere — points (B, N, C) —
so the feature axis sits on TPU lanes; the reference is channels-first.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _flat_take(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Batch gather via global row indices into a (B*N, C) view.

    On TPU v5e this jnp.take lowering runs ~1.7x faster than
    take_along_axis for large row counts (17.9 vs 30.2 ms for 4.2M rows,
    measured 2026-08); results are identical.
    """
    b, n, c = points.shape
    # host callers (e.g. un-jitted model.init on a numpy batch) pass
    # np.ndarray, whose .reshape result has no .at — coerce first
    flat = jnp.asarray(points).reshape(b * n, c)
    offs = (jnp.arange(b, dtype=jnp.int32) * n).reshape((b,) + (1,) * (idx.ndim - 1))
    g = idx.astype(jnp.int32) + offs
    # indices come from our own query/sampling ops and are always in
    # bounds; promising so removes a ~3 ms bounds-check select pass per
    # forward (v5e, profiled 2026-08)
    return flat.at[g.reshape(-1)].get(mode="promise_in_bounds").reshape(
        idx.shape + (c,)
    )


@jax.custom_vjp
def _flat_take_sorted_vjp(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """_flat_take with a sort-based backward.

    JAX's default VJP for the gather is an unsorted scatter-add, which XLA
    serializes on TPU (~54 ms of the 146 ms bs=2 train step, profiled
    2026-08, reference equivalent: atomicAdd backward in
    pointnet2_batch/src/group_points_gpu.cu:86). Here the cotangent rows are
    argsorted by destination row first, so the scatter-add sees
    monotonically non-decreasing indices (indices_are_sorted=True) — the
    sort + the big reorder-gather both run at full vector throughput, and
    the sorted scatter avoids XLA's general serialized path."""
    return _flat_take(points, idx)


def _flat_take_sorted_fwd(points, idx):
    # zero-byte exemplar carries (B, N) and dtype into bwd (residuals must
    # be JAX types); the channel count comes from the cotangent itself
    exemplar = jnp.zeros(points.shape[:2] + (0,), points.dtype)
    return _flat_take(points, idx), (idx, exemplar)


def _flat_take_sorted_bwd(res, ct):
    idx, exemplar = res
    b, n, _ = exemplar.shape
    c = ct.shape[-1]
    dtype = exemplar.dtype
    offs = (jnp.arange(b, dtype=jnp.int32) * n).reshape(
        (b,) + (1,) * (idx.ndim - 1)
    )
    g = (idx.astype(jnp.int32) + offs).reshape(-1)
    ctf = ct.reshape(-1, c).astype(dtype)
    order = jnp.argsort(g)
    gs = jnp.take(g, order)
    cts = jnp.take(ctf, order, axis=0)
    grad = (
        jnp.zeros((b * n, c), dtype)
        .at[gs]
        .add(cts, indices_are_sorted=True, mode="promise_in_bounds")
        .reshape(b, n, c)
    )
    return grad, None


_flat_take_sorted_vjp.defvjp(_flat_take_sorted_fwd, _flat_take_sorted_bwd)


# N (source rows per batch element) at or below which the one-hot backward
# applies; above it the transposed one-hot plane gets too large and the
# default scatter-add is used instead.
_ONEHOT_VJP_MAX_N = 2048
# cap on the (rows_chunk, N) one-hot plane per einsum step, in elements
_ONEHOT_CHUNK_ELEMS = 1 << 25  # 32M f32 = 128 MB


@jax.custom_vjp
def _flat_take_onehot_vjp(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """_flat_take with a transposed-one-hot matmul backward.

    The scatter-add VJP XLA emits for the gather serializes on TPU; when the
    destination is small (backbone feature gathers scatter into at most
    N=2048 rows) the same reduction is an MXU matmul: grad = onehot(idx)^T
    @ ct, chunked over the gathered-row axis so the (rows, N) one-hot plane
    stays bounded. f32 operands at Precision.HIGHEST keep full cotangent
    mantissas (accumulation order differs from the scatter — fp
    reassociation only). Reference equivalent: the atomicAdd backward of
    group_points_gpu.cu:86."""
    return _flat_take(points, idx)


def _flat_take_onehot_fwd(points, idx):
    exemplar = jnp.zeros(points.shape[:2] + (0,), points.dtype)
    return _flat_take(points, idx), (idx, exemplar)


def _flat_take_onehot_bwd(res, ct):
    idx, exemplar = res
    b, n, _ = exemplar.shape
    c = ct.shape[-1]
    dtype = exemplar.dtype
    rows = idx.reshape(b, -1).astype(jnp.int32)  # (B, R)
    r = rows.shape[1]
    ctf = ct.reshape(b, r, c)
    chunk = max(512, min(r, _ONEHOT_CHUNK_ELEMS // max(n, 1)))
    chunk = _round_up_rows(min(chunk, r))
    grad = jnp.zeros((b, n, c), jnp.float32)
    iota = jnp.arange(n, dtype=jnp.int32)
    for s in range(0, r, chunk):
        e = min(s + chunk, r)
        onehot = (rows[:, s:e, None] == iota).astype(jnp.float32)
        grad = grad + jnp.einsum(
            "brn,brc->bnc",
            onehot,
            ctf[:, s:e].astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
        )
    return grad.astype(dtype), None


def _round_up_rows(x: int, m: int = 256) -> int:
    return ((x + m - 1) // m) * m


_flat_take_onehot_vjp.defvjp(_flat_take_onehot_fwd, _flat_take_onehot_bwd)


@jax.custom_vjp
def _flat_take_pallas_vjp(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """_flat_take with the Pallas one-hot-tile matmul backward.

    Like the 'onehot' mode, the scatter-add becomes grad = onehot(idx)^T @
    ct — but the one-hot tiles are built in VMEM inside the kernel and fed
    straight to the MXU, never touching HBM (ops/pallas/scatter_kernel.py).
    Applies when the destination has <= _ONEHOT_VJP_MAX_N rows (all feature
    gathers in this model); duplicate indices accumulate in f32 with a
    different summation order than XLA's scatter (fp reassociation only).
    Reference equivalent: the atomicAdd backward of group_points_gpu.cu:86."""
    return _flat_take(points, idx)


def _flat_take_pallas_fwd(points, idx):
    exemplar = jnp.zeros(points.shape[:2] + (0,), points.dtype)
    return _flat_take(points, idx), (idx, exemplar)


def _flat_take_pallas_bwd(res, ct):
    from graspbalance_tpu.ops.pallas.scatter_kernel import scatter_add_matmul

    idx, exemplar = res
    b, n, _ = exemplar.shape
    c = ct.shape[-1]
    grad = scatter_add_matmul(
        ct.reshape(b, -1, c).astype(jnp.float32),
        idx.reshape(b, -1),
        n,
        interpret=jax.default_backend() != "tpu",
    )
    return grad.astype(exemplar.dtype), None


_flat_take_pallas_vjp.defvjp(_flat_take_pallas_fwd, _flat_take_pallas_bwd)

# backward implementation for gather_points/group_points: 'xla' (default
# autodiff scatter-add) | 'sorted' (argsort + sorted scatter-add) | 'onehot'
# (transposed one-hot matmul when the destination has <= _ONEHOT_VJP_MAX_N
# rows, scatter-add otherwise) | 'pallas' (same algebra with the one-hot
# tiles built in VMEM, ops/pallas/scatter_kernel.py). Module state rather
# than a per-call arg so model code stays oblivious; flip with
# set_gather_vjp() before tracing (it is baked into the jaxpr).
_GATHER_VJP = "xla"


def set_gather_vjp(kind: str) -> None:
    """Select the gather backward: 'xla' | 'sorted' | 'onehot' | 'pallas'."""
    global _GATHER_VJP
    if kind not in ("xla", "sorted", "onehot", "pallas"):
        raise ValueError(f"unknown gather vjp: {kind}")
    _GATHER_VJP = kind


def _dispatch(points, idx):
    if _GATHER_VJP == "sorted":
        return _flat_take_sorted_vjp(points, idx)
    if _GATHER_VJP == "onehot" and points.shape[1] <= _ONEHOT_VJP_MAX_N:
        return _flat_take_onehot_vjp(points, idx)
    if _GATHER_VJP == "pallas" and points.shape[1] <= _ONEHOT_VJP_MAX_N:
        return _flat_take_pallas_vjp(points, idx)
    # NOTE round 4: a 'pallas_auto' mode (kernel only at dest<=2048 AND
    # C>=256, where the micro-bench wins ~1.7x) was built and measured:
    # full-train e2e it is a WASH (111.9 vs 113.6 ms bs=2 f32 — the
    # scatters overlap other backward work under XLA's scheduler), so it
    # stays withdrawn on perf grounds. The round-4 "unexplained 1.31x f32
    # grad mismatch" it carried was ROOT-CAUSED in round 5: the kernel's
    # f32 MXU dot ran at default precision (single bf16 pass); fixed with
    # Precision.HIGHEST in scatter_kernel.py — see the precision comment
    # there and tools/repro_scatter_vjp.py.
    return _flat_take(points, idx)


def gather_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """points (B, N, C), idx (B, M) int -> (B, M, C).

    Precondition: every index must be in [0, N). Indices are gathered with
    mode="promise_in_bounds" for speed, so out-of-range values (including
    -1 sentinels) yield undefined garbage, not clamping. Call sites feeding
    indices from fps/ball_query/cylinder_query/knn always satisfy this;
    validate externally (see tests/test_ops.py) if indices come from
    anywhere else.
    """
    return _dispatch(points, idx)


def group_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """points (B, N, C), idx (B, M, K) int -> (B, M, K, C).

    Precondition: every index must be in [0, N) — see gather_points.
    """
    return _dispatch(points, idx)
