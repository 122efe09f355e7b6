"""L0 op tests against numpy oracles (SURVEY.md §4 test pyramid, level 1)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graspbalance_tpu import ops
from tests import oracles


def random_cloud(rng, b, n, scale=0.5, pad_origin=0):
    pts = (rng.random((b, n, 3), dtype=np.float32) - 0.5) * scale
    if pad_origin:
        pts[:, -pad_origin:, :] = 0.0
    return pts


class TestFPS:
    def test_matches_oracle(self, rng):
        pts = random_cloud(rng, 2, 257)
        got = np.asarray(ops.furthest_point_sample(jnp.asarray(pts), 33, use_pallas=False))
        for b in range(2):
            want = oracles.fps_oracle(pts[b], 33)
            np.testing.assert_array_equal(got[b], want)

    def test_origin_skip(self, rng):
        pts = random_cloud(rng, 1, 128, pad_origin=40)
        got = np.asarray(
            ops.furthest_point_sample(jnp.asarray(pts), 50, use_pallas=False)
        )[0]
        want = oracles.fps_oracle(pts[0], 50, skip_origin=True)
        np.testing.assert_array_equal(got, want)
        # near-origin padding never selected (except the forced seed 0)
        assert not np.any(got[1:] >= 88)

    def test_variant_b_no_skip(self, rng):
        pts = random_cloud(rng, 1, 100, pad_origin=10)
        got = np.asarray(
            ops.furthest_point_sample(jnp.asarray(pts), 40, skip_origin=False, use_pallas=False)
        )[0]
        want = oracles.fps_oracle(pts[0], 40, skip_origin=False)
        np.testing.assert_array_equal(got, want)

    def test_prefix_property(self, rng):
        """FPS re-run on its own output is the identity prefix — the nesting
        the DRP backbone relies on (drp.py:306)."""
        pts = random_cloud(rng, 1, 500)
        idx = np.asarray(ops.furthest_point_sample(jnp.asarray(pts), 64, use_pallas=False))[0]
        sub = pts[0][idx][None]
        idx2 = np.asarray(ops.furthest_point_sample(jnp.asarray(sub), 32, use_pallas=False))[0]
        np.testing.assert_array_equal(idx2, np.arange(32))


class TestBallQuery:
    @pytest.mark.parametrize("radius,nsample", [(0.1, 8), (0.04, 16), (0.3, 4)])
    def test_matches_oracle(self, rng, radius, nsample):
        pts = random_cloud(rng, 2, 300)
        centers = pts[:, :37, :]
        got = np.asarray(
            ops.ball_query(jnp.asarray(pts), jnp.asarray(centers), radius, nsample, chunk=16)
        )
        for b in range(2):
            want = oracles.ball_query_oracle(pts[b], centers[b], radius, nsample)
            np.testing.assert_array_equal(got[b], want)

    def test_count_matmul_first_k_parity(self, rng):
        """GB_COUNT_MATMUL (MXU matvec tile counts) must select identically
        to the reduce path on random hit planes — the exactness argument
        (bf16 0/1 products, f32 accumulate, counts <= TILE) gets unit
        coverage here, not just the one e2e A/B run (ADVICE r3)."""
        from graspbalance_tpu.ops import query as q

        hit = jnp.asarray(rng.random((4, 37, 333)) < 0.07)
        old = q._COUNT_MATMUL
        q.set_count_matmul(False)
        try:
            want = np.asarray(q._first_k_by_index(hit, 16))
            q.set_count_matmul(True)
            got = np.asarray(q._first_k_by_index(hit, 16))
        finally:
            q.set_count_matmul(old)
        np.testing.assert_array_equal(got, want)

    def test_empty_ball_is_zero(self, rng):
        pts = random_cloud(rng, 1, 64)
        centers = np.full((1, 3, 3), 100.0, np.float32)
        got = np.asarray(ops.ball_query(jnp.asarray(pts), jnp.asarray(centers), 0.1, 8))
        np.testing.assert_array_equal(got, np.zeros((1, 3, 8), np.int32))

    def test_batch_chunked_matches_unchunked(self, rng):
        """batch_chunk < B routes through _batch_chunked_vmap (the bs>4
        reduce-fusion fast-path fix, docs/NOTES.md) — results must be
        identical to the plain vmap, including a ragged final chunk."""
        pts = random_cloud(rng, 5, 120)
        centers = pts[:, :13, :]
        raw = rng.standard_normal((5, 13, 3, 3)).astype(np.float32)
        rot = np.linalg.qr(raw)[0].astype(np.float32)
        want = np.asarray(
            ops.ball_query(
                jnp.asarray(pts), jnp.asarray(centers), 0.15, 8, batch_chunk=8
            )
        )
        got = np.asarray(
            ops.ball_query(
                jnp.asarray(pts), jnp.asarray(centers), 0.15, 8, batch_chunk=2
            )
        )
        np.testing.assert_array_equal(got, want)
        want = np.asarray(
            ops.cylinder_query(
                jnp.asarray(pts), jnp.asarray(centers), jnp.asarray(rot),
                0.08, -0.02, 0.04, 8, batch_chunk=8,
            )
        )
        got = np.asarray(
            ops.cylinder_query(
                jnp.asarray(pts), jnp.asarray(centers), jnp.asarray(rot),
                0.08, -0.02, 0.04, 8, batch_chunk=2,
            )
        )
        np.testing.assert_array_equal(got, want)
        radii = (0.02, 0.05, 0.08, 0.11)
        hmaxs = (0.01, 0.02, 0.03, 0.04)
        want = np.asarray(
            ops.multi_cylinder_query(
                jnp.asarray(pts), jnp.asarray(centers), jnp.asarray(rot),
                radii, -0.02, hmaxs, 8, batch_chunk=8,
            )
        )
        got = np.asarray(
            ops.multi_cylinder_query(
                jnp.asarray(pts), jnp.asarray(centers), jnp.asarray(rot),
                radii, -0.02, hmaxs, 8, batch_chunk=2,
            )
        )
        np.testing.assert_array_equal(got, want)

    def test_query_batch_chunk_default(self, rng):
        """batch_chunk=None reads the module default (set_query_batch_chunk,
        the SPMD-aware knob): a default of 2 must equal explicit 2 and the
        unchunked result."""
        from graspbalance_tpu.ops import query as qmod

        pts = random_cloud(rng, 5, 80)
        centers = pts[:, :9, :]
        want = np.asarray(
            ops.ball_query(
                jnp.asarray(pts), jnp.asarray(centers), 0.15, 8, batch_chunk=8
            )
        )
        old = qmod._DEFAULT_BATCH_CHUNK
        try:
            ops.set_query_batch_chunk(2)
            got = np.asarray(
                ops.ball_query(jnp.asarray(pts), jnp.asarray(centers), 0.15, 8)
            )
        finally:
            qmod._DEFAULT_BATCH_CHUNK = old
        np.testing.assert_array_equal(got, want)
        with pytest.raises(ValueError):
            ops.set_query_batch_chunk(0)

    def test_nearest_order_set(self, rng):
        """nearest-k returns the k nearest hits (set check vs oracle d2)."""
        pts = random_cloud(rng, 1, 200)
        centers = pts[:, :11, :]
        got = np.asarray(
            ops.ball_query(jnp.asarray(pts), jnp.asarray(centers), 0.2, 4, order="nearest")
        )[0]
        d2 = np.sum((centers[0][:, None] - pts[0][None]) ** 2, -1)
        for j in range(11):
            hits = np.where(d2[j] < 0.04)[0]
            want = hits[np.argsort(d2[j][hits], kind="stable")][:4]
            k = min(len(want), 4)
            np.testing.assert_array_equal(got[j][:k], want[:k])


class TestCylinderQuery:
    def test_matches_oracle(self, rng):
        pts = random_cloud(rng, 2, 256)
        centers = pts[:, :17, :]
        # random rotations via QR
        raw = rng.standard_normal((2, 17, 3, 3)).astype(np.float32)
        rot = np.linalg.qr(raw)[0].astype(np.float32)
        got = np.asarray(
            ops.cylinder_query(
                jnp.asarray(pts), jnp.asarray(centers), jnp.asarray(rot),
                0.08, -0.02, 0.04, 8, chunk=8,
            )
        )
        for b in range(2):
            want = oracles.cylinder_query_oracle(
                pts[b], centers[b], rot[b], 0.08, -0.02, 0.04, 8
            )
            np.testing.assert_array_equal(got[b], want)

    def test_multi_matches_single(self, rng):
        pts = random_cloud(rng, 1, 200)
        centers = pts[:, :9, :]
        raw = rng.standard_normal((1, 9, 3, 3)).astype(np.float32)
        rot = np.linalg.qr(raw)[0].astype(np.float32)
        radii = (0.02, 0.04, 0.06, 0.08)
        hmaxs = (0.01, 0.02, 0.03, 0.04)
        got = np.asarray(
            ops.multi_cylinder_query(
                jnp.asarray(pts), jnp.asarray(centers), jnp.asarray(rot),
                radii, -0.02, hmaxs, 8, chunk=4,
            )
        )
        for ri, radius in enumerate(radii):
            for hi, hmax in enumerate(hmaxs):
                want = np.asarray(
                    ops.cylinder_query(
                        jnp.asarray(pts), jnp.asarray(centers), jnp.asarray(rot),
                        radius, -0.02, hmax, 8,
                    )
                )
                np.testing.assert_array_equal(got[:, ri, hi], want)


class TestKNN:
    def test_knn1(self, rng):
        ref = random_cloud(rng, 2, 100)
        query = random_cloud(rng, 2, 50)
        got = np.asarray(ops.knn1(jnp.asarray(ref), jnp.asarray(query)))
        for b in range(2):
            _, want = oracles.knn_oracle(ref[b], query[b], 1)
            np.testing.assert_array_equal(got[b], want[:, 0])

    def test_three_nn(self, rng):
        known = random_cloud(rng, 2, 64)
        unknown = random_cloud(rng, 2, 128)
        dist, idx = ops.three_nn(jnp.asarray(unknown), jnp.asarray(known))
        for b in range(2):
            dwant, iwant = oracles.knn_oracle(known[b], unknown[b], 3)
            np.testing.assert_array_equal(np.asarray(idx)[b], iwant)
            np.testing.assert_allclose(np.asarray(dist)[b], dwant, rtol=1e-5, atol=1e-6)

    def test_three_nn_dot_impl(self, rng):
        # the TPU-default dot impl: same indices as the oracle on random
        # clouds, distances bit-identical to the exact impl when the
        # selection agrees (delta-form rescore of the winners)
        known = random_cloud(rng, 2, 64)
        unknown = random_cloud(rng, 2, 128)
        dist, idx = ops.three_nn(jnp.asarray(unknown), jnp.asarray(known), impl="dot")
        dref, iref = ops.three_nn(jnp.asarray(unknown), jnp.asarray(known), impl="exact")
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(iref))
        np.testing.assert_array_equal(np.asarray(dist), np.asarray(dref))
        for b in range(2):
            _, iwant = oracles.knn_oracle(known[b], unknown[b], 3)
            np.testing.assert_array_equal(np.asarray(idx)[b], iwant)

    def test_knn_exact_matches_topk(self, rng):
        # the argmin-pass 'exact' impl must equal the full sort, including
        # tie order (both prefer the lower index on equal distances)
        ref = random_cloud(rng, 2, 200)
        query = random_cloud(rng, 2, 64)
        for k in (3, 16):
            de, ie = ops.knn(jnp.asarray(ref), jnp.asarray(query), k, method="exact")
            dt, it = ops.knn(jnp.asarray(ref), jnp.asarray(query), k, method="topk")
            np.testing.assert_array_equal(np.asarray(ie), np.asarray(it))
            np.testing.assert_allclose(np.asarray(de), np.asarray(dt), rtol=1e-6)
        # k > 32: 'exact' falls back to the sort — same API, same results
        de, ie = ops.knn(jnp.asarray(ref), jnp.asarray(query), 40, method="exact")
        dt, it = ops.knn(jnp.asarray(ref), jnp.asarray(query), 40, method="topk")
        np.testing.assert_array_equal(np.asarray(ie), np.asarray(it))

    def test_knn_exact_ties(self):
        # duplicated reference points: tie must resolve to the lower index
        ref = np.zeros((1, 8, 3), np.float32)
        ref[0, :, 0] = [0.0, 1.0, 1.0, 2.0, 2.0, 2.0, 3.0, 0.0]
        query = np.zeros((1, 2, 3), np.float32)
        query[0, 1, 0] = 2.0
        _, idx = ops.knn(jnp.asarray(ref), jnp.asarray(query), 4, method="exact")
        _, idxt = ops.knn(jnp.asarray(ref), jnp.asarray(query), 4, method="topk")
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(idxt))
        np.testing.assert_array_equal(np.asarray(idx)[0, 0], [0, 7, 1, 2])
        np.testing.assert_array_equal(np.asarray(idx)[0, 1], [3, 4, 5, 1])

    def test_knn1_masked(self, rng):
        ref = random_cloud(rng, 1, 20)
        query = ref.copy()
        mask = np.ones((1, 20), bool)
        mask[0, :10] = False
        got = np.asarray(ops.knn1(jnp.asarray(ref), jnp.asarray(query), ref_valid=jnp.asarray(mask)))
        assert np.all(got >= 10)


class TestGatherInterp:
    def test_gather_group(self, rng):
        pts = rng.random((2, 30, 5), dtype=np.float32)
        idx = rng.integers(0, 30, (2, 7)).astype(np.int32)
        got = np.asarray(ops.gather_points(jnp.asarray(pts), jnp.asarray(idx)))
        for b in range(2):
            np.testing.assert_array_equal(got[b], pts[b][idx[b]])
        gidx = rng.integers(0, 30, (2, 7, 4)).astype(np.int32)
        got = np.asarray(ops.group_points(jnp.asarray(pts), jnp.asarray(gidx)))
        for b in range(2):
            np.testing.assert_array_equal(got[b], pts[b][gidx[b]])

    def test_three_interpolate(self, rng):
        feats = rng.random((1, 16, 8), dtype=np.float32)
        idx = rng.integers(0, 16, (1, 10, 3)).astype(np.int32)
        w = rng.random((1, 10, 3), dtype=np.float32)
        w /= w.sum(-1, keepdims=True)
        got = np.asarray(
            ops.three_interpolate(jnp.asarray(feats), jnp.asarray(idx), jnp.asarray(w))
        )[0]
        want = oracles.three_interpolate_oracle(feats[0], idx[0], w[0])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_group_points_grad_scatter_add(self, rng):
        """Backward of grouping = scatter-add (deterministic, unlike the
        reference's atomicAdd — SURVEY.md §5)."""
        pts = jnp.asarray(rng.random((1, 10, 2), dtype=np.float32))
        idx = jnp.asarray(np.array([[[0, 0], [1, 2]]], np.int32))
        grad = jax.grad(lambda p: jnp.sum(ops.group_points(p, idx)))(pts)
        want = np.zeros((1, 10, 2), np.float32)
        want[0, 0] = 2.0
        want[0, 1] = 1.0
        want[0, 2] = 1.0
        np.testing.assert_allclose(np.asarray(grad), want)

    def test_gather_accepts_numpy_hosts(self, rng):
        """Un-jitted host callers (model.init on a numpy batch) pass
        np.ndarray; the flat-take path must coerce (train.py smoke
        regression, 2026-08-17)."""
        pts = rng.random((2, 10, 3)).astype(np.float32)
        idx = rng.integers(0, 10, (2, 4)).astype(np.int32)
        got = ops.gather_points(pts, idx)  # numpy in, must not raise
        want = np.take_along_axis(pts, idx[..., None].repeat(3, -1), axis=1)
        np.testing.assert_array_equal(np.asarray(got), want)

    def test_sorted_vjp_matches_xla(self, rng):
        """gather/group backward with the sort-based scatter-add (ops/gather
        set_gather_vjp('sorted')) equals the default XLA VJP. Integer-valued
        cotangents make the duplicate-index sums order-independent, so the
        comparison is exact."""
        from graspbalance_tpu.ops import gather as gmod

        pts = jnp.asarray(
            rng.integers(-8, 8, (2, 30, 5)).astype(np.float32)
        )
        gidx = jnp.asarray(rng.integers(0, 30, (2, 7, 4)).astype(np.int32))
        midx = jnp.asarray(rng.integers(0, 30, (2, 9)).astype(np.int32))
        ct_g = jnp.asarray(rng.integers(-4, 5, (2, 7, 4, 5)).astype(np.float32))
        ct_m = jnp.asarray(rng.integers(-4, 5, (2, 9, 5)).astype(np.float32))

        def loss(p):
            return jnp.sum(ops.group_points(p, gidx) * ct_g) + jnp.sum(
                ops.gather_points(p, midx) * ct_m
            )

        want_primal = loss(pts)
        want = jax.grad(loss)(pts)
        gmod.set_gather_vjp("sorted")
        try:
            got_primal = loss(pts)
            got = jax.grad(loss)(pts)
        finally:
            gmod.set_gather_vjp("xla")
        np.testing.assert_array_equal(np.asarray(got_primal), np.asarray(want_primal))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_onehot_vjp_matches_xla(self, rng):
        """gather/group backward via the transposed one-hot matmul
        (set_gather_vjp('onehot')) equals the default XLA scatter-add VJP.
        Integer-valued cotangents make duplicate-index sums
        order-independent, so the comparison is exact. Also checks the
        large-N fallback (N > _ONEHOT_VJP_MAX_N stays on the scatter path)
        and the multi-chunk path (rows > chunk)."""
        from graspbalance_tpu.ops import gather as gmod

        pts = jnp.asarray(rng.integers(-8, 8, (2, 30, 5)).astype(np.float32))
        gidx = jnp.asarray(rng.integers(0, 30, (2, 7, 4)).astype(np.int32))
        midx = jnp.asarray(rng.integers(0, 30, (2, 9)).astype(np.int32))
        ct_g = jnp.asarray(rng.integers(-4, 5, (2, 7, 4, 5)).astype(np.float32))
        ct_m = jnp.asarray(rng.integers(-4, 5, (2, 9, 5)).astype(np.float32))

        def loss(p):
            return jnp.sum(ops.group_points(p, gidx) * ct_g) + jnp.sum(
                ops.gather_points(p, midx) * ct_m
            )

        want_primal = loss(pts)
        want = jax.grad(loss)(pts)
        gmod.set_gather_vjp("onehot")
        try:
            got_primal = loss(pts)
            got = jax.grad(loss)(pts)

            # multi-chunk path: >512 gathered rows with the chunk cap at
            # its 512-row floor forces the row loop to run twice
            bigidx = jnp.asarray(
                rng.integers(0, 30, (2, 150, 4)).astype(np.int32)
            )
            ct_big = jnp.asarray(
                rng.integers(-4, 5, (2, 150, 4, 5)).astype(np.float32)
            )

            def loss_big(p):
                return jnp.sum(ops.group_points(p, bigidx) * ct_big)

            old = gmod._ONEHOT_CHUNK_ELEMS
            gmod._ONEHOT_CHUNK_ELEMS = 64  # chunk floor 512 < 600 rows
            try:
                got_chunked = jax.grad(loss_big)(pts)
            finally:
                gmod._ONEHOT_CHUNK_ELEMS = old
            gmod.set_gather_vjp("xla")
            want_chunked = jax.grad(loss_big)(pts)
            gmod.set_gather_vjp("onehot")

            # large-N fallback: N above the threshold must keep working
            # (routes to the plain scatter path)
            big = jnp.asarray(
                rng.integers(-8, 8, (1, gmod._ONEHOT_VJP_MAX_N + 8, 3)).astype(
                    np.float32
                )
            )
            bidx = jnp.asarray(
                rng.integers(0, big.shape[1], (1, 6)).astype(np.int32)
            )
            gbig = jax.grad(
                lambda p: jnp.sum(ops.gather_points(p, bidx))
            )(big)
        finally:
            gmod.set_gather_vjp("xla")
        np.testing.assert_array_equal(np.asarray(got_primal), np.asarray(want_primal))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        np.testing.assert_array_equal(np.asarray(got_chunked), np.asarray(want_chunked))
        assert float(jnp.sum(gbig)) == 18.0  # 6 rows x 3 channels of ones


class TestPallasInterpret:
    """Pallas kernels in interpreter mode (CPU) vs the oracle."""

    def test_scatter_kernel_interpret(self, rng):
        """scatter_add_matmul == .at[idx].add() exactly for integer-valued
        cotangents (both compute dtypes; the one-hot operand is exact and
        small-integer sums are exact in bf16 products + f32 accumulation).
        Covers -1 dropped rows, row padding, and destination-tile padding."""
        from graspbalance_tpu.ops.pallas.scatter_kernel import (
            scatter_add_matmul,
        )

        for b, r, n, c in [(2, 300, 70, 5), (1, 2100, 257, 33)]:
            ct = rng.integers(-4, 5, (b, r, c)).astype(np.float32)
            idx = rng.integers(0, n, (b, r)).astype(np.int32)
            idx[0, :3] = -1  # dropped rows
            want = np.zeros((b, n, c), np.float32)
            for bi in range(b):
                keep = idx[bi] >= 0
                np.add.at(want[bi], idx[bi][keep], ct[bi][keep])
            for cd in ("float32", "bfloat16"):
                got = np.asarray(
                    scatter_add_matmul(
                        jnp.asarray(ct), jnp.asarray(idx), n,
                        compute_dtype=cd, interpret=True,
                    )
                )
                np.testing.assert_array_equal(got, want)

    def test_scatter_kernel_float_cotangents(self, rng):
        """Float-valued cotangents must agree with the scatter to
        reassociation tolerance — NOT just integers. Round-4's
        integer-only parity masked a real hardware bug: the kernel's f32
        MXU dot ran at default precision (single bf16 pass, ~2^-9
        relative mantissa loss — the '1.31x composition mismatch');
        small integers are exact in bf16 so integer tests passed. Fixed
        by forcing Precision.HIGHEST for compute_dtype=f32; the
        hardware-level check lives in tools/repro_scatter_vjp.py."""
        from graspbalance_tpu.ops.pallas.scatter_kernel import (
            scatter_add_matmul,
        )

        b, r, n, c = 2, 2048, 256, 17
        ct = rng.standard_normal((b, r, c)).astype(np.float32)
        idx = rng.integers(0, n, (b, r)).astype(np.int32)
        want = np.zeros((b, n, c), np.float64)
        for bi in range(b):
            np.add.at(want[bi], idx[bi], ct[bi].astype(np.float64))
        got = np.asarray(
            scatter_add_matmul(
                jnp.asarray(ct), jnp.asarray(idx), n, interpret=True,
            )
        )
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=0)

    def test_pallas_vjp_matches_xla(self, rng):
        """set_gather_vjp('pallas') backward == the XLA scatter-add VJP
        (exact for integer cotangents), including the large-N fallback."""
        from graspbalance_tpu.ops import gather as gmod

        pts = jnp.asarray(rng.integers(-8, 8, (2, 30, 5)).astype(np.float32))
        gidx = jnp.asarray(rng.integers(0, 30, (2, 7, 4)).astype(np.int32))
        midx = jnp.asarray(rng.integers(0, 30, (2, 9)).astype(np.int32))
        ct_g = jnp.asarray(rng.integers(-4, 5, (2, 7, 4, 5)).astype(np.float32))
        ct_m = jnp.asarray(rng.integers(-4, 5, (2, 9, 5)).astype(np.float32))

        def loss(p):
            return jnp.sum(ops.group_points(p, gidx) * ct_g) + jnp.sum(
                ops.gather_points(p, midx) * ct_m
            )

        want_primal = loss(pts)
        want = jax.grad(loss)(pts)
        gmod.set_gather_vjp("pallas")
        try:
            got_primal = loss(pts)
            got = jax.grad(loss)(pts)
            big = jnp.asarray(
                rng.integers(-8, 8, (1, gmod._ONEHOT_VJP_MAX_N + 8, 3)).astype(
                    np.float32
                )
            )
            bidx = jnp.asarray(
                rng.integers(0, big.shape[1], (1, 6)).astype(np.int32)
            )
            gbig = jax.grad(lambda p: jnp.sum(ops.gather_points(p, bidx)))(big)
        finally:
            gmod.set_gather_vjp("xla")
        np.testing.assert_array_equal(np.asarray(got_primal), np.asarray(want_primal))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        assert float(jnp.sum(gbig)) == 18.0  # large-N scatter fallback

    def test_fps_pallas_interpret(self, rng):
        from graspbalance_tpu.ops.pallas.fps_kernel import fps_pallas

        pts = random_cloud(rng, 2, 300)
        got = np.asarray(fps_pallas(jnp.asarray(pts), 40, interpret=True))
        for b in range(2):
            want = oracles.fps_oracle(pts[b], 40)
            np.testing.assert_array_equal(got[b], want)

    def test_fps_pallas_2d_interpret(self, rng):
        from graspbalance_tpu.ops.pallas.fps_kernel import fps_pallas_2d

        pts = random_cloud(rng, 2, 300, pad_origin=20)
        got = np.asarray(fps_pallas_2d(jnp.asarray(pts), 40, interpret=True))
        for b in range(2):
            want = oracles.fps_oracle(pts[b], 40)
            np.testing.assert_array_equal(got[b], want)

    def test_fps_pallas_2d_batched_interpret(self, rng):
        from graspbalance_tpu.ops.pallas.fps_kernel import fps_pallas_2d_batched

        pts = random_cloud(rng, 3, 300, pad_origin=20)
        got = np.asarray(
            fps_pallas_2d_batched(jnp.asarray(pts), 40, interpret=True)
        )
        for b in range(3):
            want = oracles.fps_oracle(pts[b], 40)
            np.testing.assert_array_equal(got[b], want)

    def test_fps_pallas_2d_batched_masked_interpret(self, rng):
        # masked kernel vs the XLA masked scan: identical selection
        # sequences incl. seed = first valid index, an exhausted row
        # (fewer valid points than samples) and an all-invalid row
        from graspbalance_tpu.ops.fps import _masked_fps_single_xla
        from graspbalance_tpu.ops.pallas.fps_kernel import (
            fps_pallas_2d_batched_masked,
        )

        pts = random_cloud(rng, 4, 300)
        valid = np.zeros((4, 300), bool)
        valid[0, 37:260] = True
        valid[1] = rng.random(300) < 0.4
        valid[2, 100:110] = True  # only 10 valid points, 40 samples
        # row 3: nothing valid -> all-zero indices
        got = np.asarray(
            fps_pallas_2d_batched_masked(
                jnp.asarray(pts), jnp.asarray(valid), 40, interpret=True
            )
        )
        for b in range(3):
            want = np.asarray(
                _masked_fps_single_xla(jnp.asarray(pts[b]), jnp.asarray(valid[b]), 40)
            )
            np.testing.assert_array_equal(got[b], want)
        np.testing.assert_array_equal(got[3], np.zeros(40, np.int32))

    def test_fps_pallas_masked_max_needed_phase_skip(self, rng):
        # max_needed skips whole 128-step phases: first max_needed samples
        # match the scan, the skipped phase's slots are zeros
        from graspbalance_tpu.ops.fps import _masked_fps_single_xla
        from graspbalance_tpu.ops.pallas.fps_kernel import (
            fps_pallas_2d_batched_masked,
        )

        pts = random_cloud(rng, 2, 300)
        valid = rng.random((2, 300)) < 0.7
        got = np.asarray(
            fps_pallas_2d_batched_masked(
                jnp.asarray(pts), jnp.asarray(valid), 200,
                max_needed=jnp.int32(100), interpret=True,
            )
        )
        for b in range(2):
            want = np.asarray(
                _masked_fps_single_xla(
                    jnp.asarray(pts[b]), jnp.asarray(valid[b]), 200
                )
            )
            np.testing.assert_array_equal(got[b, :100], want[:100])
        # phase 2 (slots 128:200) was skipped entirely
        np.testing.assert_array_equal(got[:, 128:], 0)

    def test_fps_pallas_2d_batched_multiphase(self, rng):
        # num_samples > 128 exercises the phase-buffer flush path
        from graspbalance_tpu.ops.pallas.fps_kernel import fps_pallas_2d_batched

        pts = random_cloud(rng, 2, 400)
        got = np.asarray(
            fps_pallas_2d_batched(jnp.asarray(pts), 200, interpret=True)
        )
        for b in range(2):
            want = oracles.fps_oracle(pts[b], 200)
            np.testing.assert_array_equal(got[b], want)
