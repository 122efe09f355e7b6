"""Fused k-argmin kNN kernel (ops/pallas/knn_kernel.py) vs the XLA exact
impl in ops/knn.py.

The kernel must be bit-identical to knn(method='exact') / three_nn
(impl='exact') — same distances, same indices, same tie order (lower index
wins; reference semantics: KNN/Pytorch_CUDA_KNN/cuda/knn.cu and
pointnet2_batch/src/interpolate_gpu.cu:14-73).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from graspbalance_tpu.ops.knn import knn, three_nn
from graspbalance_tpu.ops.pallas.knn_kernel import knn_pallas


@pytest.fixture
def rng():
    return np.random.default_rng(3)


def _xla_exact(ref, query, k):
    os.environ["GB_NO_KNN_KERNEL"] = "1"
    try:
        return knn(ref, query, k, method="exact")
    finally:
        del os.environ["GB_NO_KNN_KERNEL"]


@pytest.mark.parametrize(
    "b,q,r,k",
    [
        (2, 200, 300, 16),  # unaligned q and r
        (1, 50, 128, 3),
        (2, 513, 1024, 32),  # q one past a tile boundary, max kernel k
        (2, 256, 1000, 3),  # three_nn shape class (r needs lane padding)
    ],
)
def test_knn_pallas_matches_xla_exact(rng, b, q, r, k):
    query = jnp.asarray(rng.standard_normal((b, q, 3)), jnp.float32)
    ref = jnp.asarray(rng.standard_normal((b, r, 3)), jnp.float32)
    d0, i0 = _xla_exact(ref, query, k)
    d1, i1 = knn_pallas(query, ref, k, interpret=True)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    # distances agree to 1 ulp (the XLA reduce may fuse multiply-add;
    # the kernel accumulates the three squared deltas sequentially)
    np.testing.assert_allclose(
        np.asarray(d0), np.asarray(d1), rtol=1e-6, atol=1e-7
    )


def test_knn_pallas_tie_order(rng):
    """Duplicated reference points: ties must resolve to the lower index."""
    base = rng.standard_normal((1, 40, 3)).astype(np.float32)
    pts = jnp.asarray(np.repeat(base, 3, axis=1))
    d0, i0 = _xla_exact(pts, pts, 5)
    d1, i1 = knn_pallas(pts, pts, 5, interpret=True)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(
        np.asarray(d0), np.asarray(d1), rtol=1e-6, atol=1e-7
    )


def test_knn_kernel_dispatch_bounds(monkeypatch):
    """The kernel only dispatches for exact kNN at 8 <= k <= 32 — below
    that (incl. three_nn's k=3) the XLA recompute path measured faster
    (docs/NOTES.md)."""
    import sys

    knn_mod = sys.modules["graspbalance_tpu.ops.knn"]
    monkeypatch.setattr(knn_mod, "_use_knn_kernel", lambda: True)
    dispatch = knn_mod._knn_dispatches_kernel
    assert dispatch("exact", 16, 2048)
    assert dispatch("exact", 8, 2048) and dispatch("exact", 32, 2048)
    assert not dispatch("exact", 3, 2048)  # three_nn regime
    assert not dispatch("exact", 64, 2048)  # beyond the validated kernel k
    assert not dispatch("exact", 16, 20000)  # large-R: short VMEM tiles lose
    assert not dispatch("topk", 16, 2048) and not dispatch("approx", 16, 2048)
    monkeypatch.setattr(knn_mod, "_use_knn_kernel", lambda: False)
    assert not dispatch("exact", 16, 2048)  # CPU / opted out


def test_knn_pallas_large_r_shrinks_tile(rng):
    """At large R the query tile must shrink so the (tq, R) VMEM planes fit
    the scoped budget (tq=256 at R=20096 compile-OOMs on v5e: 27.6 MB vs
    the 16 MB limit) — and results stay identical."""
    from graspbalance_tpu.ops.pallas import knn_kernel

    assert knn_kernel._fit_tq(2048, 256) == 256  # small R: untouched
    assert knn_kernel._fit_tq(20096, 256) <= 64  # two 4-byte planes <= 10 MB
    assert knn_kernel._fit_tq(20096, 256) >= 8
    r = 5200  # r_pad 5248: first shape class where tq=256 exceeds the budget
    query = jnp.asarray(rng.standard_normal((1, 130, 3)), jnp.float32)
    ref = jnp.asarray(rng.standard_normal((1, r, 3)), jnp.float32)
    d0, i0 = _xla_exact(ref, query, 8)
    d1, i1 = knn_pallas(query, ref, 8, interpret=True)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(
        np.asarray(d0), np.asarray(d1), rtol=1e-6, atol=1e-7
    )


def test_three_nn_pallas_impl_matches_exact(rng):
    unknown = jnp.asarray(rng.standard_normal((2, 500, 3)), jnp.float32)
    known = jnp.asarray(rng.standard_normal((2, 200, 3)), jnp.float32)
    d0, i0 = three_nn(unknown, known, impl="exact")
    d1, i1 = knn_pallas(unknown, known, 3, interpret=True)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(
        np.asarray(d0), np.asarray(d1), rtol=1e-6, atol=1e-7
    )
