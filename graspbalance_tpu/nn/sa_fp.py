"""Set-abstraction and feature-propagation modules (channels-last).

TPU equivalents of PointnetSAModuleVotes / PointnetFPModule
(PointNet/pointnet2_modules.py:105-188, 402-435): FPS -> ball query ->
grouped relative xyz (optionally radius-normalized) concat features ->
SharedMLP -> max pool; and three_nn -> inverse-distance interpolate ->
concat skip -> SharedMLP.

The grouped tensor is (B, npoint, nsample, C): nsample on sublanes, C on
lanes, so the MLP is one big (B*npoint*nsample, C) matmul on the MXU and the
max-pool is a sublane reduction.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from graspbalance_tpu import ops
from graspbalance_tpu.nn.layers import SharedMLP
from graspbalance_tpu.ops.interpolate import (
    inverse_distance_weights,
    three_interpolate,
)


class SetAbstraction(nn.Module):
    """FPS + ball-query grouping + shared MLP + max pool.

    Args mirror PointnetSAModuleVotes (use_xyz=True, pooling='max'); the DRP
    backbone always sets normalize_xyz=True (TrainModel/drp.py:161-243).
    """

    npoint: int
    radius: float
    nsample: int
    mlp: Sequence[int]
    normalize_xyz: bool = True
    use_xyz: bool = True
    query_order: str = "index"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        xyz,
        features=None,
        *,
        inds=None,
        query_idx=None,
        train: bool = False,
        bn_momentum=0.1,
    ):
        """xyz (B,N,3); features (B,N,C) or None; inds optional (B,npoint)
        precomputed FPS indices (the data pipeline may supply them);
        query_idx optional (B,npoint,nsample) precomputed ball-query
        indices (the point-axis-sharded path computes them with the exact
        sharded query and shards this module over centers —
        parallel/stage1.py; `inds` must be given alongside).

        Returns (new_xyz (B,npoint,3), new_feats (B,npoint,C_out), inds)."""
        if inds is None:
            inds = ops.furthest_point_sample(xyz, self.npoint)
        new_xyz = ops.gather_points(xyz, inds)
        if query_idx is not None:
            idx = query_idx
        else:
            idx = ops.ball_query(
                xyz, new_xyz, self.radius, self.nsample,
                order=self.query_order,
            )
        # (fusing the xyz+feats gathers into one concatenated-width gather
        # was measured slower on v5e — unaligned rows; keep them split)
        grouped_xyz = ops.group_points(xyz, idx) - new_xyz[:, :, None, :]

        from graspbalance_tpu.ops.pallas.mlpmax_kernel import (
            fold_bn_layers,
            fused_eval_ok,
            mlp_max_fused,
        )

        if fused_eval_ok(self, train, self.nsample):
            # fused eval: BN-folded MLP chain + max VMEM-resident; the
            # xyz|feats concat never materializes (per-part layer-0 split)
            # and normalize_xyz folds into the xyz slice of W0
            wts = fold_bn_layers(
                self.scope.get_variable("params", "mlp"),
                self.scope.get_variable("batch_stats", "mlp"),
                len(self.mlp),
            )
            (w0, b0), rest = wts[0], wts[1:]
            scale = 1.0 / self.radius if self.normalize_xyz else 1.0
            if features is not None and self.use_xyz:
                parts = (grouped_xyz, ops.group_points(features, idx))
                w0_parts = (w0[:3] * scale, w0[3:])
            elif features is not None:
                parts = (ops.group_points(features, idx),)
                w0_parts = (w0,)
            else:
                parts = (grouped_xyz,)
                w0_parts = (w0 * scale,)
            new_feats = mlp_max_fused(parts, ((w0_parts, b0), *rest))
            return new_xyz, new_feats, inds

        if self.normalize_xyz:
            grouped_xyz = grouped_xyz / self.radius
        if features is not None:
            grouped_feats = ops.group_points(features, idx)
            grouped = (
                jnp.concatenate(
                    [grouped_xyz.astype(grouped_feats.dtype), grouped_feats], axis=-1
                )
                if self.use_xyz
                else grouped_feats
            )
        else:
            grouped = grouped_xyz
        out = SharedMLP(self.mlp, dtype=self.dtype, name="mlp")(
            grouped.astype(self.dtype), train=train, bn_momentum=bn_momentum
        )
        return new_xyz, jnp.max(out, axis=2), inds


class SetAbstractionMSG(nn.Module):
    """Multi-scale grouping set abstraction (PointnetSAModuleMSG,
    pointnet2_modules.py:15-103 — unused by the live model but part of the
    reference's module surface): one FPS, several (radius, nsample, mlp)
    branches, features concatenated across scales."""

    npoint: int
    radii: tuple
    nsamples: tuple
    mlps: tuple  # tuple of layer-width tuples, one per scale
    normalize_xyz: bool = False
    use_xyz: bool = True
    query_order: str = "index"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz, features=None, *, inds=None, train: bool = False,
                 bn_momentum=0.1):
        if inds is None:
            inds = ops.furthest_point_sample(xyz, self.npoint)
        new_xyz = ops.gather_points(xyz, inds)
        outs = []
        for si, (radius, nsample, mlp) in enumerate(
            zip(self.radii, self.nsamples, self.mlps)
        ):
            idx = ops.ball_query(
                xyz, new_xyz, radius, nsample, order=self.query_order
            )
            grouped_xyz = ops.group_points(xyz, idx) - new_xyz[:, :, None, :]
            if self.normalize_xyz:
                grouped_xyz = grouped_xyz / radius
            if features is not None:
                grouped_feats = ops.group_points(features, idx)
                grouped = (
                    jnp.concatenate(
                        [grouped_xyz.astype(grouped_feats.dtype), grouped_feats],
                        axis=-1,
                    )
                    if self.use_xyz
                    else grouped_feats
                )
            else:
                grouped = grouped_xyz
            f = SharedMLP(mlp, dtype=self.dtype, name=f"mlp{si}")(
                grouped.astype(self.dtype), train=train, bn_momentum=bn_momentum
            )
            outs.append(jnp.max(f, axis=2))
        return new_xyz, jnp.concatenate(outs, axis=-1), inds


class FeaturePropagation(nn.Module):
    """Inverse-distance 3-NN upsampling + skip concat + shared MLP."""

    mlp: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        unknown,
        known,
        unknown_feats,
        known_feats,
        *,
        train: bool = False,
        bn_momentum=0.1,
    ):
        """unknown (B,n,3), known (B,m,3), unknown_feats (B,n,C1) or None,
        known_feats (B,m,C2) -> (B,n,mlp[-1])."""
        dist, idx = ops.three_nn(unknown, known)
        weight = inverse_distance_weights(dist)
        interp = three_interpolate(known_feats, idx, weight)
        if unknown_feats is not None:
            interp = jnp.concatenate([interp, unknown_feats], axis=-1)
        return SharedMLP(self.mlp, dtype=self.dtype, name="mlp")(
            interp.astype(self.dtype), train=train, bn_momentum=bn_momentum
        )


def _pool(out, grouped_xyz, pooling: str, sigma: float, nsample: int):
    """max / avg / rbf pooling over the neighbor axis
    (pointnet2_modules.py:247-259). `grouped_xyz` is the grouper's relative
    (possibly radius-normalized) xyz — the rbf weights use it as-is, exactly
    like the reference's ret_grouped_xyz path."""
    if pooling == "max":
        return jnp.max(out, axis=2)
    if pooling == "avg":
        return jnp.mean(out, axis=2)
    if pooling == "rbf":
        rbf = jnp.exp(
            -jnp.sum(jnp.square(grouped_xyz), axis=-1) / (sigma**2) / 2.0
        )  # (B, np, ns)
        return jnp.sum(out * rbf[..., None], axis=2) / float(nsample)
    raise ValueError(f"unknown pooling: {pooling}")


class SetAbstractionShift(nn.Module):
    """PointnetSAModuleVotesShift (pointnet2_modules.py:190-265): grouping +
    MLP + pool at *caller-provided* centers (no FPS — the 'shift' is that
    new_xyz comes from upstream, e.g. vote centers). Unused by the live
    model; kept for module-surface parity."""

    radius: float
    nsample: int
    mlp: Sequence[int]
    pooling: str = "max"
    sigma: float | None = None
    normalize_xyz: bool = False
    use_xyz: bool = True
    query_order: str = "index"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, new_xyz, xyz, features=None, *, train: bool = False,
                 bn_momentum=0.1):
        """new_xyz (B,M,3) given centers; xyz (B,N,3); -> (B,M,C_out)."""
        sigma = self.sigma if self.sigma is not None else self.radius / 2
        idx = ops.ball_query(
            xyz, new_xyz, self.radius, self.nsample, order=self.query_order
        )
        grouped_xyz = ops.group_points(xyz, idx) - new_xyz[:, :, None, :]
        if self.normalize_xyz:
            grouped_xyz = grouped_xyz / self.radius
        if features is not None:
            grouped_feats = ops.group_points(features, idx)
            grouped = (
                jnp.concatenate(
                    [grouped_xyz.astype(grouped_feats.dtype), grouped_feats],
                    axis=-1,
                )
                if self.use_xyz
                else grouped_feats
            )
        else:
            grouped = grouped_xyz
        out = SharedMLP(self.mlp, dtype=self.dtype, name="mlp")(
            grouped.astype(self.dtype), train=train, bn_momentum=bn_momentum
        )
        return _pool(out, grouped_xyz, self.pooling, sigma, self.nsample)


class SetAbstractionWOMLP(nn.Module):
    """PointnetSAModuleVotes_WOMLP (pointnet2_modules.py:267-340): FPS +
    grouping + pool with NO mlp — raw grouped features pooled directly.
    Unused by the live model; kept for module-surface parity."""

    npoint: int
    radius: float
    nsample: int
    pooling: str = "max"
    sigma: float | None = None
    normalize_xyz: bool = False
    use_xyz: bool = True
    query_order: str = "index"

    @nn.compact
    def __call__(self, xyz, features=None, *, inds=None, train: bool = False,
                 bn_momentum=0.1):
        sigma = self.sigma if self.sigma is not None else self.radius / 2
        if inds is None:
            inds = ops.furthest_point_sample(xyz, self.npoint)
        new_xyz = ops.gather_points(xyz, inds)
        idx = ops.ball_query(
            xyz, new_xyz, self.radius, self.nsample, order=self.query_order
        )
        grouped_xyz = ops.group_points(xyz, idx) - new_xyz[:, :, None, :]
        if self.normalize_xyz:
            grouped_xyz = grouped_xyz / self.radius
        if features is not None:
            grouped_feats = ops.group_points(features, idx)
            grouped = (
                jnp.concatenate(
                    [grouped_xyz.astype(grouped_feats.dtype), grouped_feats],
                    axis=-1,
                )
                if self.use_xyz
                else grouped_feats
            )
        else:
            grouped = grouped_xyz
        pooled = _pool(grouped, grouped_xyz, self.pooling, sigma, self.nsample)
        return new_xyz, pooled, inds


class LocalFeaturePropagationMSG(nn.Module):
    """PointnetLFPModuleMSG (pointnet2_modules.py:437-495): multi-scale
    grouping of level-1 features at level-2 points, per-scale MLP + maxpool,
    concat level-2 skip features, shared post-MLP; concat across scales.
    Unused by the live model; kept for module-surface parity."""

    radii: tuple
    nsamples: tuple
    mlps: tuple  # per-scale layer widths
    post_mlp: Sequence[int]
    use_xyz: bool = True
    query_order: str = "index"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz2, xyz1, features2, features1, *,
                 train: bool = False, bn_momentum=0.1):
        """xyz2 (B,N2,3) targets; xyz1 (B,N1,3) sources; features2 (B,N2,C2)
        or None; features1 (B,N1,C1) or None -> (B, N2, S*post_mlp[-1])."""
        outs = []
        # ONE post-MLP shared by every scale (pointnet2_modules.py:453)
        post = SharedMLP(self.post_mlp, dtype=self.dtype, name="post_mlp")
        for si, (radius, nsample, mlp) in enumerate(
            zip(self.radii, self.nsamples, self.mlps)
        ):
            idx = ops.ball_query(
                xyz1, xyz2, radius, nsample, order=self.query_order
            )
            grouped_xyz = ops.group_points(xyz1, idx) - xyz2[:, :, None, :]
            if features1 is not None:
                grouped_feats = ops.group_points(features1, idx)
                grouped = (
                    jnp.concatenate(
                        [grouped_xyz.astype(grouped_feats.dtype), grouped_feats],
                        axis=-1,
                    )
                    if self.use_xyz
                    else grouped_feats
                )
            else:
                grouped = grouped_xyz
            f = SharedMLP(mlp, dtype=self.dtype, name=f"mlp{si}")(
                grouped.astype(self.dtype), train=train, bn_momentum=bn_momentum
            )
            f = jnp.max(f, axis=2)  # (B, N2, C)
            if features2 is not None:
                f = jnp.concatenate([f, features2.astype(f.dtype)], axis=-1)
            f = post(f, train=train, bn_momentum=bn_momentum)
            outs.append(f)
        return jnp.concatenate(outs, axis=-1)
