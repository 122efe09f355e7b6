"""DRP backbone (Dense-Residual-Pyramid) — the live feature extractor.

TPU rebuild of TrainModel/drp.py:150-308: four set-abstraction stages
(npoint 2048/1024/512/256, radius .04/.1/.2/.3, nsample 64/32/16/16) each
followed by 3/6/3/3 inverted-residual MLP blocks (PointNeXt-style: ball-query
local aggregation + pointwise expansion MLP, expansion 4), then two feature-
propagation stages back to the 1024-point seed level.

TPU-first deviations (semantics-preserving):
* One FPS pass: greedy FPS re-traces itself on its own output, so the four
  per-stage FPS calls of the reference are prefixes of a single 2048-point
  FPS (verified in tests/test_ops.py::TestFPS::test_prefix_property). The
  stages just slice. This also makes the reference's seed-index bookkeeping
  (fp2_inds = sa1_inds[:, :1024], drp.py:306) exact rather than approximate.
* The data pipeline may supply the 2048 FPS indices (`sa_inds`) so the
  training step contains no sequential sampling at all.
* Channels-last; every 1x1 conv is a Dense on the MXU.
"""

from __future__ import annotations


import jax.numpy as jnp
from flax import linen as nn

from graspbalance_tpu import ops
from graspbalance_tpu.nn.layers import MLPBlock
from graspbalance_tpu.nn.sa_fp import SetAbstraction, FeaturePropagation


def _no_lifted_agg() -> bool:
    """GB_NO_LIFTED_AGG=1 restores the grouped-conv LocalAggregation path
    (A/B escape hatch for the lifted pre-gather matmul formulation)."""
    import os

    return bool(os.environ.get("GB_NO_LIFTED_AGG"))


class LocalAggregation(nn.Module):
    """Local neighborhood aggregation (TrainModel/drp.py:32-67 +
    ModifiedNetTools/group.py:225-253).

    grouper: 'ballquery' (live config) or 'knn'. feature_type follows
    get_aggregation_feautres: 'dp_fj' (live), 'dp_fj_df', 'pi_dp_fj_df',
    'dp_df'. reduction: 'max' (live), 'mean', 'sum'. One conv block with
    BN+ReLU (the reference's last_act=True default), then the reduction
    over neighbors.
    """

    channels: int
    radius: float
    nsample: int
    grouper: str = "ballquery"
    feature_type: str = "dp_fj"
    reduction: str = "max"
    query_order: str = "index"
    dtype: jnp.dtype = jnp.float32

    def _reduce(self, out):
        if self.reduction == "max":
            return jnp.max(out, axis=2)
        if self.reduction in ("mean", "avg"):
            return jnp.mean(out, axis=2)
        if self.reduction == "sum":
            return jnp.sum(out, axis=2)
        raise ValueError(f"unknown reduction {self.reduction}")

    @nn.compact
    def __call__(self, xyz, feats, *, train: bool, bn_momentum=0.1,
                 centers=None, center_feats=None, query_idx=None):
        """Self-aggregation over (xyz, feats). Optional chunked-centers
        form (the point-axis-sharded path, parallel/backbone.py): `centers`
        (B, M, 3) / `center_feats` (B, M, C) restrict the OUTPUT rows to a
        subset while `xyz`/`feats` stay the full support — every op below
        is row-local over centers, so a chunked call bit-matches the
        corresponding rows of the full call."""
        cx = xyz if centers is None else centers
        cf = feats if center_feats is None else center_feats
        if query_idx is not None:
            idx = query_idx
        elif self.grouper == "ballquery":
            idx = ops.ball_query(
                xyz, cx, self.radius, self.nsample, order=self.query_order
            )
        elif self.grouper == "knn":
            _, idx = ops.knn(xyz, cx, self.nsample)
        else:
            raise ValueError(f"unknown grouper {self.grouper}")

        from graspbalance_tpu.ops.pallas.mlpmax_kernel import (
            fold_bn_layers,
            fused_eval_ok,
            mlp_max_fused,
        )

        if self.feature_type == "dp_fj" and fused_eval_ok(self, train, self.nsample):
            # fused eval: conv+BN+ReLU+reduce VMEM-resident, dp|fj concat
            # never materializes (per-part layer-0 split)
            dp = ops.group_points(xyz, idx) - cx[:, :, None, :]
            fj = ops.group_points(feats, idx)
            dp = dp.astype(fj.dtype)
            ((w0, b0),) = fold_bn_layers(
                self.scope.get_variable("params", "conv"),
                self.scope.get_variable("batch_stats", "conv"),
                1,
            )
            return mlp_max_fused(
                (dp, fj),
                (((w0[:3], w0[3:]), b0),),
                reduction="max" if self.reduction == "max" else (
                    "mean" if self.reduction in ("mean", "avg") else "sum"
                ),
            )

        blk = MLPBlock(self.channels, dtype=self.dtype, name="conv")

        if self.feature_type == "dp_fj" and not _no_lifted_agg():
            # Lifted aggregation: the block's single conv commutes with the
            # neighbor gather —
            #   [p_j - c_i, f_j] @ W = [p_j, f_j] @ W - [c_i, 0] @ W
            # so both matmuls run at N rows (not N*K), ONE gather moves the
            # conv outputs (replacing the split xyz+feats gathers), and the
            # grouped (B,N,K,C) tensor is touched only by subtract/BN/act/
            # reduce — no conv on it, hence no conv-demanded relayout copy
            # (the 0.4 ms copies at ops/gather.py:34 in the r3 profile).
            # Exact up to dot-product reassociation; no bias double-count
            # because use_bn=True drops the dense bias. GB_NO_LIFTED_AGG=1
            # restores the grouped-conv path for A/B.
            cat = jnp.concatenate([xyz.astype(feats.dtype), feats], axis=-1)
            e = blk(cat, train=train, bn_momentum=bn_momentum, stage="dense")
            zcat = jnp.concatenate(
                [cx.astype(cf.dtype), jnp.zeros_like(cf)], axis=-1
            )
            cw = blk(zcat, train=train, bn_momentum=bn_momentum, stage="dense")
            pre = ops.group_points(e, idx) - cw[:, :, None, :]
            out = blk(pre, train=train, bn_momentum=bn_momentum, stage="post")
            return self._reduce(out)

        # NOTE: gathering xyz+feats as one concatenated (3+C)-wide gather
        # was measured SLOWER on v5e (backbone 30 -> 35 ms) — unaligned
        # 131-float rows gather worse than two aligned gathers. Keep split.
        dp = ops.group_points(xyz, idx) - cx[:, :, None, :]  # (B,M,K,3)
        fj = ops.group_points(feats, idx)  # (B,M,K,C)
        dp = dp.astype(fj.dtype)

        if self.feature_type == "dp_fj":
            grouped = jnp.concatenate([dp, fj], axis=-1)
        elif self.feature_type == "dp_fj_df":
            df = fj - cf[:, :, None, :]
            grouped = jnp.concatenate([dp, fj, df], axis=-1)
        elif self.feature_type == "pi_dp_fj_df":
            df = fj - cf[:, :, None, :]
            pi = jnp.broadcast_to(
                cx[:, :, None, :].astype(fj.dtype), dp.shape
            )
            grouped = jnp.concatenate([pi, dp, fj, df], axis=-1)
        elif self.feature_type == "dp_df":
            df = fj - cf[:, :, None, :]
            grouped = jnp.concatenate([dp, df], axis=-1)
        else:
            raise ValueError(f"unknown feature_type {self.feature_type}")
        out = blk(grouped, train=train, bn_momentum=bn_momentum)
        return self._reduce(out)


class InvResMLP(nn.Module):
    """Inverted-residual point block (TrainModel/drp.py:70-117).

    LocalAggregation -> pointwise [C -> 4C (BN+ReLU) -> C (BN)] -> +residual
    -> ReLU.
    """

    channels: int
    radius: float
    nsample: int
    expansion: int = 4
    query_order: str = "index"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz, feats, *, train: bool, bn_momentum=0.1,
                 centers=None, center_feats=None, query_idx=None):
        """Optional chunked-centers form (point-axis-sharded path): with
        `centers`/`center_feats` the block computes only those output rows
        against the full (xyz, feats) support — bit-equal to the matching
        rows of the full call (every op is row-local over centers)."""
        identity = feats if center_feats is None else center_feats
        f = LocalAggregation(
            self.channels,
            self.radius,
            self.nsample,
            query_order=self.query_order,
            dtype=self.dtype,
            name="local_agg",
        )(xyz, feats, train=train, bn_momentum=bn_momentum,
          centers=centers, center_feats=center_feats, query_idx=query_idx)
        f = MLPBlock(
            self.channels * self.expansion, dtype=self.dtype, name="pw1"
        )(f, train=train, bn_momentum=bn_momentum)
        f = MLPBlock(self.channels, act=False, dtype=self.dtype, name="pw2")(
            f, train=train, bn_momentum=bn_momentum
        )
        return nn.relu(f + identity)


# (npoint, sa_radius, sa_nsample, mlp, n_blocks, block_radius, block_nsample)
DRP_STAGES = (
    (2048, 0.04, 64, (64, 64, 128), 3, 0.08, 64),
    (1024, 0.10, 32, (128, 128, 256), 6, 0.20, 32),
    (512, 0.20, 16, (128, 128, 256), 3, 0.40, 16),
    (256, 0.30, 16, (128, 128, 256), 3, 0.60, 16),
)


class DRP(nn.Module):
    """Stage table from TrainModel/drp.py:161-259; returns a dict of
    per-stage xyz/features plus the 1024-point seed level (fp2_*)."""

    stages: tuple = DRP_STAGES
    num_seed: int = 1024
    query_order: str = "index"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        pointcloud,
        *,
        sa_inds=None,
        train: bool = False,
        bn_momentum=0.1,
    ):
        """pointcloud (B, N, 3+F). sa_inds: optional (B, 2048) precomputed
        FPS indices of the full cloud (prefix-sliced for all stages).

        Returns dict with input_xyz, sa{1..4}_{xyz,features}, sa1_inds,
        fp2_features (B,1024,256), fp2_xyz (B,1024,3), fp2_inds (B,1024)."""
        xyz = pointcloud[..., :3]
        features = pointcloud[..., 3:] if pointcloud.shape[-1] > 3 else None
        out = {"input_xyz": xyz, "input_features": features}

        if sa_inds is None:
            sa_inds = ops.furthest_point_sample(xyz, self.stages[0][0])
        out["sa1_inds"] = sa_inds

        stage_xyz, stage_feats = [], []
        cur_xyz, cur_feats = xyz, features
        for i, (npoint, radius, nsample, mlp, n_blocks, b_radius, b_nsample) in enumerate(
            self.stages
        ):
            # nested-prefix FPS: stage i samples the first `npoint` of the
            # running FPS ordering (see module docstring).
            if i == 0:
                inds = sa_inds
            else:
                b = cur_xyz.shape[0]
                inds = jnp.broadcast_to(
                    jnp.arange(npoint, dtype=jnp.int32)[None], (b, npoint)
                )
            cur_xyz, cur_feats, _ = SetAbstraction(
                npoint=npoint,
                radius=radius,
                nsample=nsample,
                mlp=mlp,
                normalize_xyz=True,
                query_order=self.query_order,
                dtype=self.dtype,
                name=f"sa{i + 1}",
            )(cur_xyz, cur_feats, inds=inds, train=train, bn_momentum=bn_momentum)
            for j in range(n_blocks):
                cur_feats = InvResMLP(
                    channels=mlp[-1],
                    radius=b_radius,
                    nsample=b_nsample,
                    query_order=self.query_order,
                    dtype=self.dtype,
                    name=f"block{i + 1}_{j}",
                )(cur_xyz, cur_feats, train=train, bn_momentum=bn_momentum)
            out[f"sa{i + 1}_xyz"] = cur_xyz
            out[f"sa{i + 1}_features"] = cur_feats
            stage_xyz.append(cur_xyz)
            stage_feats.append(cur_feats)

        f = FeaturePropagation(mlp=(256, 256), dtype=self.dtype, name="fp1")(
            stage_xyz[2], stage_xyz[3], stage_feats[2], stage_feats[3],
            train=train, bn_momentum=bn_momentum,
        )
        f = FeaturePropagation(mlp=(256, 256), dtype=self.dtype, name="fp2")(
            stage_xyz[1], stage_xyz[2], stage_feats[1], f,
            train=train, bn_momentum=bn_momentum,
        )
        out["fp2_features"] = f
        out["fp2_xyz"] = stage_xyz[1]
        out["fp2_inds"] = sa_inds[:, : self.num_seed]
        return out
