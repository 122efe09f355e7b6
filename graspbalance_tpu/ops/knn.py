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


def _use_knn_kernel() -> bool:
    """Fused Pallas k-argmin kernel on TPU backends (GB_NO_KNN_KERNEL=1
    opts out to the XLA per-pass-recompute lowering for A/B)."""
    import os

    if os.environ.get("GB_NO_KNN_KERNEL"):
        return False
    return jax.default_backend() == "tpu"


def _knn_dispatches_kernel(method: str, k: int, r: int) -> bool:
    """Kernel dispatch bounds measured on v5e (2026-08-18): the VMEM-resident
    distance tile pays off once enough argmin passes reuse it (k=16 at
    R=2048: 4.4 vs 10.3 ms XLA); at small k the recompute it elides is
    cheap and the serialized grid loses (k=3: 15.9 vs 7.2 — see three_nn).
    Large reference sets force short query tiles to keep the (tq, R) tile
    in VMEM (knn_kernel._fit_tq), multiplying serialized grid steps — the
    measured-win regime is R <= 2048; stay on XLA beyond 4096."""
    return method == "exact" and 8 <= k <= 32 and r <= 4096 and _use_knn_kernel()


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
      'exact'  — k masked argmin passes over the delta-form (Q, R) distance
        matrix (the same structure that makes three_nn ~9x faster than a
        sort on TPU). On TPU backends at 8 <= k <= 32 this runs the fused
        Pallas kernel (ops/pallas/knn_kernel.py): the distance tile is
        computed ONCE into VMEM and all k passes scan it there, instead of
        XLA's per-pass fused recompute (GB_NO_KNN_KERNEL=1 restores the XLA
        lowering; below k=8 the recompute is cheaper than the kernel's
        serialized grid — measured at k=3, see three_nn).
        Results are identical to a full sort, including tie order: argmin
        and lax.top_k both prefer the lower index on equal distances. Only
        sensible for small k (the DSN point-transformer uses k=16, the DRP
        knn grouper k<=64).
      'topk'   — lax.top_k, i.e. a full per-row sort on TPU; the previous
        'exact' implementation, kept for A/B measurement.
      'approx' — the TPU approximate-top-k unit (recall < 1.0), used by the
        point-transformer DSN backbone as an opt-in speed mode (it has no
        reference counterpart to be parity-exact against — pct_zh is absent
        from the reference repo).

    Returns: (dist, idx) with dist (B, Q, k) euclidean distances (sqrt'd) and
    idx (B, Q, k) int32, nearest first.
    """
    if _knn_dispatches_kernel(method, k, ref.shape[1]):
        from graspbalance_tpu.ops.pallas.knn_kernel import knn_pallas

        return knn_pallas(query, ref, k)

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
      'auto' (= 'exact') — the XLA argmin passes. The fused Pallas kernel
        ('pallas') measured 2.2x SLOWER here (15.9 vs 7.2 ms at
        (4, 20000, 1024), v5e 2026-08-18): at k=3 the per-pass d2 recompute
        the kernel elides is cheap, and the kernel's serialized grid loses
        to XLA's fused pipeline — the opposite trade from knn's k=16.
      'pallas' — the fused k-argmin kernel (ops/pallas/knn_kernel.py):
        distance tile computed once into VMEM, 3 argmin passes scan it
        there (no per-pass recompute, no HBM materialization). Bit-exact;
        kept for A/B.
      'exact' — three masked argmin passes over the delta-form
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
    if impl == "pallas":
        from graspbalance_tpu.ops.pallas.knn_kernel import knn_pallas

        return knn_pallas(unknown, known, 3)

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
