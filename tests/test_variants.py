"""Variant coverage: focal losses, trilinear sampling, LocalAggregation
modes, single-scale stage 2, utils."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graspbalance_tpu.labels.focal import binary_focal_loss, focal_loss
from graspbalance_tpu.models.drp import LocalAggregation
from graspbalance_tpu.models.graspbalance import GraspBalance
from graspbalance_tpu.ops.trilinear import trilinear_sample
from graspbalance_tpu.utils import count_params, tree_norm
from graspbalance_tpu.data.synthetic import make_batch
from tests.tiny import TINY_NUM_SEED, TINY_NUM_VIEW, TINY_SCENE, TINY_STAGES


class TestFocal:
    def test_focal_reduces_easy_examples(self, rng):
        target = jnp.asarray(rng.integers(0, 3, 50).astype(np.int32))
        confident = jax.nn.one_hot(target, 3) * 10.0
        uncertain = jnp.zeros((50, 3))
        assert float(focal_loss(confident, target)) < float(
            focal_loss(uncertain, target)
        )

    def test_focal_gamma_zero_close_to_ce(self, rng):
        logits = jnp.asarray(rng.standard_normal((20, 4), dtype=np.float32))
        target = jnp.asarray(rng.integers(0, 4, 20).astype(np.int32))
        fl = float(focal_loss(logits, target, gamma=0.0, smooth=0.0))
        ce = float(
            jnp.mean(
                -jnp.take_along_axis(
                    jax.nn.log_softmax(logits), target[:, None], axis=-1
                )
            )
        )
        np.testing.assert_allclose(fl, ce, rtol=1e-5)

    def test_binary_focal_finite(self, rng):
        logits = jnp.asarray(rng.standard_normal(100, dtype=np.float32))
        target = jnp.asarray((rng.random(100) > 0.5).astype(np.float32))
        loss = float(binary_focal_loss(logits, target))
        assert np.isfinite(loss) and loss > 0


class TestTrilinear:
    def test_exact_at_corners(self, rng):
        vol = jnp.asarray(rng.random((1, 3, 4, 5, 2), dtype=np.float32))
        pts = jnp.asarray([[[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]]])
        out = np.asarray(trilinear_sample(vol, pts))
        np.testing.assert_allclose(out[0, 0], np.asarray(vol)[0, 0, 0, 0], atol=1e-6)
        np.testing.assert_allclose(out[0, 1], np.asarray(vol)[0, 2, 3, 4], atol=1e-6)

    def test_linear_in_between(self):
        vol = jnp.zeros((1, 2, 1, 1, 1)).at[0, 1, 0, 0, 0].set(1.0)
        pts = jnp.asarray([[[0.5, 0.0, 0.0]]])
        out = float(trilinear_sample(vol, pts)[0, 0, 0])
        np.testing.assert_allclose(out, 0.5, atol=1e-6)


class TestLocalAggVariants:
    @pytest.mark.parametrize("ft", ["dp_fj", "dp_fj_df", "pi_dp_fj_df", "dp_df"])
    @pytest.mark.parametrize("grouper", ["ballquery", "knn"])
    def test_forward(self, rng, ft, grouper):
        xyz = jnp.asarray(rng.random((1, 64, 3), dtype=np.float32))
        feats = jnp.asarray(rng.random((1, 64, 8), dtype=np.float32))
        mod = LocalAggregation(
            channels=8, radius=0.3, nsample=4, grouper=grouper, feature_type=ft
        )
        v = mod.init(jax.random.PRNGKey(0), xyz, feats, train=False)
        out = mod.apply(v, xyz, feats, train=False)
        assert out.shape == (1, 64, 8)
        assert np.isfinite(np.asarray(out)).all()


class TestSingleScale:
    def test_forward_and_params(self):
        batch = make_batch(3, 1, TINY_SCENE)
        cloud = jnp.asarray(batch["point_clouds"])
        m = GraspBalance(
            num_view=TINY_NUM_VIEW, backbone_stages=TINY_STAGES,
            num_seed=TINY_NUM_SEED, multi_scale=False,
        )
        v = m.init(jax.random.PRNGKey(0), {"point_clouds": cloud}, train=False)
        # no fuse/gate params in single-scale mode
        assert "fuse_multi_scale" not in v["params"]
        assert "gate_fusion" not in v["params"]
        ep = m.apply(v, {"point_clouds": cloud}, train=False)
        assert ep["grasp_score_pred"].shape == (1, TINY_NUM_SEED, 12, 4)
        assert count_params(v["params"]) > 0
        assert float(tree_norm(v["params"])) > 0


class TestMSGAndSamplers:
    def test_msg_module(self, rng):
        from graspbalance_tpu.nn.sa_fp import SetAbstractionMSG

        xyz = jnp.asarray(rng.random((1, 128, 3), dtype=np.float32))
        feats = jnp.asarray(rng.random((1, 128, 8), dtype=np.float32))
        m = SetAbstractionMSG(
            npoint=32, radii=(0.2, 0.4), nsamples=(8, 16),
            mlps=((16, 16), (16, 32)),
        )
        v = m.init(jax.random.PRNGKey(0), xyz, feats, train=False)
        new_xyz, f, inds = m.apply(v, xyz, feats, train=False)
        assert new_xyz.shape == (1, 32, 3)
        assert f.shape == (1, 32, 16 + 32)
        assert inds.shape == (1, 32)

    def test_random_sample(self, rng):
        from graspbalance_tpu.ops import random_sample

        xyz = jnp.asarray(rng.random((2, 50, 3), dtype=np.float32))
        idx = np.asarray(random_sample(xyz, 20, jax.random.PRNGKey(0)))
        assert idx.shape == (2, 20)
        for b in range(2):
            assert len(set(idx[b].tolist())) == 20  # no replacement
            assert idx[b].min() >= 0 and idx[b].max() < 50


class TestSAVariants:
    """Unused-by-the-live-model SA/LFP variants (pointnet2_modules.py:190-340,
    437-495), kept for module-surface parity."""

    def _scene(self, rng, n=96, c=6):
        xyz = jnp.asarray(rng.random((2, n, 3), dtype=np.float32))
        feats = jnp.asarray(rng.random((2, n, c), dtype=np.float32))
        return xyz, feats

    def test_shift_uses_given_centers(self, rng):
        from graspbalance_tpu.nn.sa_fp import SetAbstractionShift

        xyz, feats = self._scene(rng)
        new_xyz = xyz[:, :16]
        m = SetAbstractionShift(radius=0.3, nsample=8, mlp=(16, 32))
        v = m.init(jax.random.PRNGKey(0), new_xyz, xyz, feats, train=False)
        out = m.apply(v, new_xyz, xyz, feats, train=False)
        assert out.shape == (2, 16, 32)
        # no FPS: shifting the query centers changes outputs, nothing else
        out2 = m.apply(v, xyz[:, 16:32], xyz, feats, train=False)
        assert not np.allclose(np.asarray(out), np.asarray(out2))

    @pytest.mark.parametrize("pooling", ["max", "avg", "rbf"])
    def test_womlp_pooling_semantics(self, rng, pooling):
        from graspbalance_tpu import ops
        from graspbalance_tpu.nn.sa_fp import SetAbstractionWOMLP

        xyz, feats = self._scene(rng)
        m = SetAbstractionWOMLP(
            npoint=16, radius=0.3, nsample=8, pooling=pooling,
            normalize_xyz=True,
        )
        v = m.init(jax.random.PRNGKey(0), xyz, feats, train=False)
        new_xyz, pooled, inds = m.apply(v, xyz, feats, train=False)
        assert v == {}  # WOMLP: parameter-free by construction
        assert pooled.shape == (2, 16, 3 + 6)

        # manual composition oracle (reference :303-333 semantics)
        idx = ops.ball_query(xyz, new_xyz, 0.3, 8)
        gx = (ops.group_points(xyz, idx) - new_xyz[:, :, None, :]) / 0.3
        gf = ops.group_points(feats, idx)
        grouped = np.concatenate([np.asarray(gx), np.asarray(gf)], axis=-1)
        if pooling == "max":
            want = grouped.max(axis=2)
        elif pooling == "avg":
            want = grouped.mean(axis=2)
        else:
            sigma = 0.3 / 2
            rbf = np.exp(-np.square(np.asarray(gx)).sum(-1) / sigma**2 / 2)
            want = (grouped * rbf[..., None]).sum(axis=2) / 8.0
        np.testing.assert_allclose(np.asarray(pooled), want, atol=1e-5)

    def test_lfp_msg_shapes_and_shared_post_mlp(self, rng):
        from graspbalance_tpu.nn.sa_fp import LocalFeaturePropagationMSG

        xyz1, feats1 = self._scene(rng, n=96, c=6)
        xyz2, feats2 = self._scene(rng, n=24, c=4)
        m = LocalFeaturePropagationMSG(
            radii=(0.2, 0.5), nsamples=(8, 16), mlps=((16, 32), (16, 32)),
            post_mlp=(32, 24),
        )
        v = m.init(
            jax.random.PRNGKey(0), xyz2, xyz1, feats2, feats1, train=False
        )
        out = m.apply(v, xyz2, xyz1, feats2, feats1, train=False)
        assert out.shape == (2, 24, 2 * 24)
        # reference builds ONE post_mlp shared by all scales (:453)
        assert "post_mlp" in v["params"]
        assert "post_mlp0" not in v["params"]
