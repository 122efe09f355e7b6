"""DSN stack tests: seg losses, mean-shift clustering, OBS, DSN forward."""

import numpy as np
import jax
import jax.numpy as jnp

from graspbalance_tpu.eval.meanshift import mean_shift_cluster
from graspbalance_tpu.eval.obs import (
    foreground_sampling,
    masked_fps,
    object_balance_sampling,
)
from graspbalance_tpu.labels.seg_losses import (
    ce_loss_weighted,
    cluster_loss_weighted,
    get_seg_loss,
    inverse_frequency_weights,
    smooth_l1_loss_weighted,
)
from graspbalance_tpu.models.dsn import DSN, compute_center_offset_labels
from tests import oracles


class TestSegLosses:
    def test_inverse_frequency(self):
        labels = jnp.asarray([[0, 0, 0, 1, 2, 2]])
        w = np.asarray(inverse_frequency_weights(labels, 3))
        np.testing.assert_allclose(
            w[0], [1 / 3, 1 / 3, 1 / 3, 1.0, 0.5, 0.5], rtol=1e-6
        )

    def test_ce_balanced_classes(self, rng):
        # uniform logits -> loss log(2) regardless of class imbalance
        logits = jnp.zeros((1, 100, 2))
        target = jnp.asarray(np.r_[np.zeros(99), np.ones(1)].astype(np.int32))[None]
        loss = float(ce_loss_weighted(logits, target))
        np.testing.assert_allclose(loss, np.log(2), rtol=1e-5)

    def test_center_offset_labels(self, rng):
        xyz = jnp.asarray(rng.random((1, 20, 3), dtype=np.float32))
        lab = np.zeros((1, 20), np.int32)
        lab[0, 5:10] = 1
        off = np.asarray(compute_center_offset_labels(xyz, jnp.asarray(lab), 4))
        centroid = np.asarray(xyz)[0, 5:10].mean(0)
        np.testing.assert_allclose(
            off[0, 5], centroid - np.asarray(xyz)[0, 5], atol=1e-6
        )
        np.testing.assert_allclose(off[0, 0], 0.0)

    def test_get_seg_loss_finite(self, rng):
        n = 64
        ep = {
            "foreground_logits": jnp.asarray(rng.standard_normal((2, n, 2), dtype=np.float32)),
            "center_offsets": jnp.asarray(rng.standard_normal((2, n, 3), dtype=np.float32) * 0.01),
            "foreground_label": jnp.asarray((rng.random((2, n)) > 0.5).astype(np.int32)),
            "instance_label": jnp.asarray(rng.integers(0, 4, (2, n)).astype(np.int32)),
            "center_offset_label": jnp.asarray(rng.standard_normal((2, n, 3), dtype=np.float32) * 0.01),
        }
        loss, metrics = get_seg_loss(ep, 5)
        assert np.isfinite(float(loss))
        assert "loss/fg_loss" in metrics and "loss/center_loss" in metrics

    def test_cluster_loss(self, rng):
        x = jnp.asarray(rng.random((10, 3), dtype=np.float32))
        y = jnp.asarray(rng.integers(0, 3, 10).astype(np.int32))
        loss = float(cluster_loss_weighted(x, y, x, y, 0.1, 4))
        assert np.isfinite(loss) and loss >= 0


class TestMeanShift:
    def test_two_blobs(self, rng):
        a = rng.normal([0, 0, 0], 0.005, (100, 3)).astype(np.float32)
        b = rng.normal([0.5, 0, 0], 0.005, (100, 3)).astype(np.float32)
        pts = np.concatenate([a, b])
        fg = np.ones(200, bool)
        labels, centers, keep = mean_shift_cluster(
            jnp.asarray(pts), jnp.asarray(fg), jax.random.PRNGKey(0)
        )
        labels = np.asarray(labels)
        assert set(labels[:100]) == {labels[0]}
        assert set(labels[100:]) == {labels[100]}
        assert labels[0] != labels[100]
        assert labels.min() >= 1

    def test_background_zero_and_small_clusters_dropped(self, rng):
        a = rng.normal([0, 0, 0], 0.005, (100, 3)).astype(np.float32)
        b = rng.normal([0.7, 0, 0], 0.001, (3, 3)).astype(np.float32)  # tiny
        pts = np.concatenate([a, b, rng.random((50, 3)).astype(np.float32)])
        fg = np.r_[np.ones(103), np.zeros(50)].astype(bool)
        labels, _, _ = mean_shift_cluster(
            jnp.asarray(pts), jnp.asarray(fg), jax.random.PRNGKey(1)
        )
        labels = np.asarray(labels)
        assert (labels[103:] == 0).all()  # background
        assert (labels[100:103] == 0).all()  # < 10 points -> dropped


class TestOBS:
    def test_masked_fps_matches_gathered(self, rng):
        pts = rng.random((60, 3), dtype=np.float32)
        valid = np.zeros(60, bool)
        valid[10:40] = True
        got = np.asarray(masked_fps(jnp.asarray(pts), jnp.asarray(valid), 8))
        # equivalent: run variant-B FPS on the gathered subset
        sub = pts[10:40]
        want_local = oracles.fps_oracle(sub, 8, skip_origin=False)
        np.testing.assert_array_equal(got, want_local + 10)

    def test_balanced_quota(self, rng):
        n = 300
        pts = rng.random((1, n, 3), dtype=np.float32)
        feats = rng.random((1, n, 8), dtype=np.float32)
        labels = np.zeros((1, n), np.int32)
        labels[0, :90] = 1
        labels[0, 90:120] = 2
        labels[0, 120:280] = 3
        xyz, f, inds = object_balance_sampling(
            jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(labels),
            num_seed=30, fps_cap=16, max_objects=4,
        )
        inds = np.asarray(inds)[0]
        lab_of = labels[0][inds]
        # 30 // 3 = 10 seeds per object
        assert (lab_of[:10] == 1).all()
        assert (lab_of[10:20] == 2).all()
        assert (lab_of[20:30] == 3).all()
        np.testing.assert_allclose(np.asarray(xyz)[0], pts[0][inds])

    def test_remainder_to_last(self, rng):
        n = 100
        pts = rng.random((1, n, 3), dtype=np.float32)
        feats = pts
        labels = np.zeros((1, n), np.int32)
        labels[0, :50] = 1
        labels[0, 50:] = 2
        _, _, inds = object_balance_sampling(
            jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(labels),
            num_seed=31, fps_cap=16, max_objects=4,
        )
        lab_of = labels[0][np.asarray(inds)[0]]
        assert (lab_of[:15] == 1).all()
        assert (lab_of[15:] == 2).all()  # 15 + remainder 1 = 16

    def test_compacted_obs_matches_full_masked_fps(self, rng):
        # the compaction + batched-FPS path must reproduce masked FPS over
        # the full cloud whenever every object fits compact_cap (FPS is
        # gather-invariant and compaction preserves index order)
        from graspbalance_tpu.eval.obs import object_balance_indices

        n = 400
        pts = rng.random((2, n, 3), dtype=np.float32)
        labels = np.zeros((2, n), np.int32)
        labels[0, 30:120] = 1
        labels[0, 150:170] = 2
        labels[0, 200:390] = 3
        labels[1, :250] = 2  # single object, batch row 2
        got = np.asarray(object_balance_indices(
            jnp.asarray(pts), jnp.asarray(labels),
            num_seed=24, fps_cap=16, max_objects=4, compact_cap=256,
        ))
        # reference construction: full-cloud masked FPS per slot + quotas
        for b in range(2):
            present = [o for o in range(1, 5) if (labels[b] == o).any()]
            k = len(present)
            quota = {o: 24 // k for o in present}
            quota[present[-1]] += 24 % k
            pos = 0
            for o in present:
                seq = np.asarray(masked_fps(
                    jnp.asarray(pts[b]), jnp.asarray(labels[b] == o), 16
                ))
                for j in range(quota[o]):
                    assert got[b, pos] == seq[j % 16], (b, o, pos)
                    pos += 1

    def test_compact_cap_overflow_strided(self, rng):
        # an object larger than compact_cap: seeds still come from that
        # object, quota counts unchanged, pool uniformly index-strided
        from graspbalance_tpu.eval.obs import _compact_mask

        n = 500
        pts = rng.random((n, 3), dtype=np.float32)
        mask = np.zeros(n, bool)
        mask[17:417] = True  # 400 points, cap 128
        cxyz, table, cvalid = _compact_mask(
            jnp.asarray(pts), jnp.asarray(mask), 128
        )
        table = np.asarray(table)
        assert np.asarray(cvalid).sum() == 128
        assert table[0] == 17  # first masked point kept (stable seed)
        assert mask[table[:128]].all()  # every kept point is masked
        assert (np.diff(table[:128]) > 0).all()  # index order preserved
        # uniform stride: gaps differ by at most 1 quantization step
        gaps = np.diff(table[:128])
        assert gaps.min() >= 3 and gaps.max() <= 4
        np.testing.assert_allclose(np.asarray(cxyz)[:128], pts[table[:128]])

    def test_foreground_sampling(self, rng):
        pts = rng.random((1, 80, 3), dtype=np.float32)
        fg = np.zeros((1, 80), bool)
        fg[0, 20:60] = True
        _, _, inds = foreground_sampling(
            jnp.asarray(pts), jnp.asarray(pts), jnp.asarray(fg), num_seed=16
        )
        assert ((np.asarray(inds)[0] >= 20) & (np.asarray(inds)[0] < 60)).all()


class TestDSNForward:
    def test_shapes(self, rng):
        pc = jnp.asarray(rng.random((1, 256, 3), dtype=np.float32))
        model = DSN(pt_stages=((64, 0.2, 8, 16, 1), (32, 0.4, 8, 32, 1)))
        variables = model.init(jax.random.PRNGKey(0), pc, train=False)
        out = model.apply(variables, pc, train=False)
        assert out["foreground_logits"].shape == (1, 256, 2)
        assert out["center_offsets"].shape == (1, 256, 3)
        assert out["seed_xyz"].shape == (1, 32, 3)
