"""k-nearest-neighbor ops (brute force, fixed shape).

Replaces the reference KNN CUDA extension (KNN/Pytorch_CUDA_KNN/cuda/knn.cu)
and the three_nn kernel (PointNet/_ext_src/src/interpolate_gpu.cu:14-73).
Indices are 0-based (the reference returns 1-based and every call site
subtracts 1 — label_generation.py:58,84; we delete that dance).

Ties resolve to the lower index, matching the reference kernels' strict-<
update rules.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _pairwise_d2(query: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """(Q, C), (R, C) -> (Q, R) squared euclidean distances."""
    delta = query[:, None, :] - ref[None, :, :]
    return jnp.sum(delta * delta, axis=-1)


@functools.partial(jax.jit, static_argnames=())
def knn1(
    ref: jnp.ndarray, query: jnp.ndarray, *, ref_valid: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Index of the nearest reference point for each query point.

    Args:
      ref: (B, R, 3); query: (B, Q, 3); ref_valid: optional (B, R) bool.

    Returns: (B, Q) int32.
    """

    def single(q, r, v):
        d2 = _pairwise_d2(q, r)
        if v is not None:
            d2 = jnp.where(v[None, :], d2, jnp.inf)
        return jnp.argmin(d2, axis=-1).astype(jnp.int32)

    if ref_valid is None:
        return jax.vmap(lambda q, r: single(q, r, None))(query, ref)
    return jax.vmap(single)(query, ref, ref_valid)


@functools.partial(jax.jit, static_argnames=("k", "method"))
def knn(
    ref: jnp.ndarray, query: jnp.ndarray, k: int, *, method: str = "exact"
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest reference points per query.

    method:
      'exact'  — k masked argmin passes over the fused delta-form (Q, R)
        distance matrix (the same structure that makes three_nn ~9x faster
        than a sort on TPU; XLA recomputes the fused d2 per pass and never
        materializes the matrix). Results are identical to a full sort,
        including tie order: argmin and lax.top_k both prefer the lower
        index on equal distances. Only sensible for small k (the DSN
        point-transformer uses k=16, the DRP knn grouper k<=64).
      'topk'   — lax.top_k, i.e. a full per-row sort on TPU; the previous
        'exact' implementation, kept for A/B measurement.
      'approx' — the TPU approximate-top-k unit (recall < 1.0), used by the
        point-transformer DSN backbone as an opt-in speed mode (it has no
        reference counterpart to be parity-exact against — pct_zh is absent
        from the reference repo).

    Returns: (dist, idx) with dist (B, Q, k) euclidean distances (sqrt'd) and
    idx (B, Q, k) int32, nearest first.
    """

    def single(q, r):
        d2 = _pairwise_d2(q, r)
        if method == "approx":
            pos, idx = lax.approx_min_k(d2, k)
        elif method == "topk" or (method == "exact" and k > 32):
            # beyond ~32 passes the unrolled argmin chain stops paying
            # vs one full sort; 'exact' falls back to the sort there
            neg, idx = lax.top_k(-d2, k)
            pos = -neg
        else:
            iota = lax.broadcasted_iota(jnp.int32, d2.shape, 1)
            cur = d2
            idxs, vals = [], []
            for _ in range(k):
                i = jnp.argmin(cur, axis=-1).astype(jnp.int32)
                vals.append(jnp.min(cur, axis=-1))
                idxs.append(i)
                cur = jnp.where(iota == i[:, None], jnp.inf, cur)
            pos = jnp.stack(vals, axis=-1)
            idx = jnp.stack(idxs, axis=-1)
        return jnp.sqrt(jnp.maximum(pos, 0.0)), idx.astype(jnp.int32)

    return jax.vmap(single)(query, ref)


@functools.partial(jax.jit, static_argnames=("impl",))
def three_nn(
    unknown: jnp.ndarray, known: jnp.ndarray, *, impl: str = "auto"
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact 3-NN of each `unknown` point among `known` points.

    Mirrors pointnet2 three_nn (+the sqrt applied by its python wrapper,
    PointNet/pointnet2_utils.py:82-84). Ties resolve to the lower index,
    like the CUDA kernel's strict-< update (interpolate_gpu.cu:25-50).

    impl:
      'exact' (= 'auto') — three masked argmin passes over the delta-form
        (N, M) distance matrix; bit-matches the reference semantics, and is
        ~9x faster than a k=3 lax.top_k full sort on TPU. XLA recomputes
        the fused delta-form per pass and never materializes the matrix.
      'dot'   — MEASURED NEGATIVE, kept as the documented experiment
        (v5e 2026-08-18, tools/bench_three_nn.py at (4, 20000, 1024):
        exact 5.61 ms vs dot 7.60 ms pipelined): selection scores from one
        MXU matmul (|r|^2 - 2 q.r after centering; the |q|^2 term is
        constant per row and cannot change an argmin) materialized once,
        then exact delta-form distances recomputed on the 3 winners.
        Writing + re-reading the (N, M) score matrix through HBM costs
        more than XLA's fused recompute of the delta form per pass. The
        score matmul must run at Precision.HIGHEST — the TPU default
        (one bf16 pass) has ~4e-3 relative error, which mis-sorts real
        neighbor gaps, not just ties (index agreement 0.48 measured
        before the fix).

    Args: unknown (B, N, 3); known (B, M, 3).
    Returns: dist (B, N, 3) euclidean, idx (B, N, 3) int32.
    """
    if impl == "auto":
        impl = "exact"

    def pick3(cur, iota):
        idxs = []
        for _ in range(3):
            i = jnp.argmin(cur, axis=-1).astype(jnp.int32)
            idxs.append(i)
            cur = jnp.where(iota == i[:, None], jnp.inf, cur)
        return jnp.stack(idxs, axis=-1)  # (N, 3)

    def single_exact(q, r):
        d2 = _pairwise_d2(q, r)  # (N, M)
        iota = lax.broadcasted_iota(jnp.int32, d2.shape, 1)
        cur = d2
        idxs, vals = [], []
        for _ in range(3):
            i = jnp.argmin(cur, axis=-1).astype(jnp.int32)
            vals.append(jnp.min(cur, axis=-1))
            idxs.append(i)
            cur = jnp.where(iota == i[:, None], jnp.inf, cur)
        dist = jnp.sqrt(jnp.maximum(jnp.stack(vals, axis=-1), 0.0))
        return dist, jnp.stack(idxs, axis=-1)

    def single_dot(q, r):
        # center to bound the cancellation error in the score matmul
        c = jnp.mean(r, axis=0)
        qc, rc = q - c, r - c
        scores = jnp.sum(rc * rc, axis=-1)[None, :] - 2.0 * jnp.dot(
            qc, rc.T, precision=lax.Precision.HIGHEST
        )  # (N, M)
        scores = lax.optimization_barrier(scores)  # materialize once
        iota = lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        idx = pick3(scores, iota)
        sel = jnp.take(r, idx.reshape(-1), axis=0).reshape(idx.shape + (3,))
        delta = q[:, None, :] - sel  # (N, 3, 3)
        d2 = jnp.sum(delta * delta, axis=-1)
        return jnp.sqrt(jnp.maximum(d2, 0.0)), idx

    single = single_dot if impl == "dot" else single_exact
    return jax.vmap(single)(unknown, known)
