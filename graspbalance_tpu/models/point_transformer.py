"""Lightweight Point Transformer segmentation backbone.

The reference DSN imports `PointTransformerBackbone_lightseg` from a
`pct_zh` module that is absent from the repo (TrainModel/dsn.py:14,
SURVEY.md §0) — only its contract is known: pointcloud (B, N, 3) ->
(seed_features (256-d), seed_xyz) at a subsampled seed level (dsn.py:39-54
upsamples the head outputs back to the full cloud with three_interpolate).
This is a from-scratch design honoring that contract, TPU-first:

  embed -> [down(FPS prefix + ball-group pooling) -> k-NN vector-attention
  blocks] x 3 -> features at the 1024-point seed level.

Vector attention (Point Transformer style): per point, attend over a fixed
k-NN neighborhood with a position-encoded subtraction attention — all
fixed-shape gathers + dense matmuls.
"""

from __future__ import annotations


import jax.numpy as jnp
from flax import linen as nn

from graspbalance_tpu import ops
from graspbalance_tpu.nn.layers import MLPBlock


class VectorAttention(nn.Module):
    """Local vector self-attention over k nearest neighbors."""

    channels: int
    knn: int = 16
    dtype: jnp.dtype = jnp.float32
    # 'exact' (conservative default, like every other accuracy knob here) or
    # 'approx' (TPU approx-top-k unit, recall < 1.0): the reference DSN uses
    # an unvendored pct_zh backbone so there is no bit-parity target, but
    # approx still changes numerics — opt in via DSN(knn_method="approx").
    # Measured v5e: exact lax.top_k full sorts were 34 ms of the 55 ms DSN
    # path; approx cuts the DSN+cluster device time to ~20 ms.
    knn_method: str = "exact"

    @nn.compact
    def __call__(self, xyz, feats, *, train: bool, bn_momentum=0.1, knn_idx=None):
        # (B, N, 3), (B, N, C). knn_idx: optional precomputed (B, N, K)
        # neighbor indices — blocks at the same resolution share one kNN
        # (the search depends only on xyz, which is constant per stage).
        if knn_idx is None:
            _, knn_idx = ops.knn(xyz, xyz, self.knn, method=self.knn_method)
        idx = knn_idx  # (B, N, K)
        c = self.channels
        q = nn.Dense(c, dtype=self.dtype, name="q")(feats)
        k = nn.Dense(c, dtype=self.dtype, name="k")(feats)
        v = nn.Dense(c, dtype=self.dtype, name="v")(feats)
        kg = ops.group_points(k, idx)  # (B, N, K, C)
        vg = ops.group_points(v, idx)
        rel = ops.group_points(xyz, idx) - xyz[:, :, None, :]  # (B, N, K, 3)
        pos = nn.Dense(c, dtype=self.dtype, name="pos2")(
            nn.relu(nn.Dense(c, dtype=self.dtype, name="pos1")(rel.astype(self.dtype)))
        )
        attn_in = q[:, :, None, :] - kg + pos
        w = nn.Dense(c, dtype=self.dtype, name="attn2")(
            nn.relu(nn.Dense(c, dtype=self.dtype, name="attn1")(attn_in))
        )
        w = nn.softmax(w, axis=2)
        out = jnp.sum(w * (vg + pos), axis=2)  # (B, N, C)
        return out


class PTBlock(nn.Module):
    """Pre-norm residual vector-attention block + pointwise MLP."""

    channels: int
    knn: int = 16
    dtype: jnp.dtype = jnp.float32
    knn_method: str = "exact"

    @nn.compact
    def __call__(self, xyz, feats, *, train: bool, bn_momentum=0.1, knn_idx=None):
        h = nn.LayerNorm(dtype=self.dtype, name="ln1")(feats)
        h = VectorAttention(self.channels, self.knn, self.dtype,
                            self.knn_method, name="attn")(
            xyz, h, train=train, bn_momentum=bn_momentum, knn_idx=knn_idx
        )
        feats = feats + h
        h = nn.LayerNorm(dtype=self.dtype, name="ln2")(feats)
        h = nn.Dense(self.channels * 2, dtype=self.dtype, name="mlp1")(h)
        h = nn.relu(h)
        h = nn.Dense(self.channels, dtype=self.dtype, name="mlp2")(h)
        return feats + h


class PointTransformerSeg(nn.Module):
    """(B, N, 3) -> dict(seed_xyz (B, S, 3), seed_features (B, S, C_out))."""

    # (npoint, radius, nsample, channels, n_blocks)
    stages: tuple = (
        (2048, 0.05, 32, 64, 1),
        (1024, 0.1, 16, 128, 2),
    )
    out_channels: int = 256
    knn: int = 16
    dtype: jnp.dtype = jnp.float32
    knn_method: str = "exact"  # see VectorAttention.knn_method

    @nn.compact
    def __call__(self, pointcloud, *, sa_inds=None, train: bool = False, bn_momentum=0.1):
        xyz = pointcloud[..., :3]
        feats = MLPBlock(self.stages[0][3], dtype=self.dtype, name="embed")(
            pointcloud.astype(self.dtype), train=train, bn_momentum=bn_momentum
        )
        if sa_inds is None:
            sa_inds = ops.furthest_point_sample(xyz, self.stages[0][0])
        for i, (npoint, radius, nsample, channels, n_blocks) in enumerate(self.stages):
            if i == 0:
                inds = sa_inds
            else:
                b = xyz.shape[0]
                inds = jnp.broadcast_to(
                    jnp.arange(npoint, dtype=jnp.int32)[None], (b, npoint)
                )
            new_xyz = ops.gather_points(xyz, inds)
            idx = ops.ball_query(xyz, new_xyz, radius, nsample)
            grouped_xyz = (ops.group_points(xyz, idx) - new_xyz[:, :, None, :]) / radius
            grouped = jnp.concatenate(
                [grouped_xyz.astype(self.dtype), ops.group_points(feats, idx)],
                axis=-1,
            )
            pooled = MLPBlock(channels, dtype=self.dtype, name=f"down{i}")(
                grouped, train=train, bn_momentum=bn_momentum
            )
            feats = jnp.max(pooled, axis=2)
            xyz = new_xyz
            # one kNN per stage: every block at this resolution attends over
            # the same xyz, so the neighbor search is shared
            knn_idx = None
            if n_blocks > 0:
                _, knn_idx = ops.knn(xyz, xyz, self.knn, method=self.knn_method)
            for j in range(n_blocks):
                feats = PTBlock(
                    channels, self.knn, self.dtype, self.knn_method,
                    name=f"block{i}_{j}"
                )(xyz, feats, train=train, bn_momentum=bn_momentum,
                  knn_idx=knn_idx)
        feats = nn.Dense(self.out_channels, dtype=self.dtype, name="proj")(feats)
        return {"seed_xyz": xyz, "seed_features": feats.astype(jnp.float32)}
