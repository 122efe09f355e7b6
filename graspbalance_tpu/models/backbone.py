"""Plain PointNet++ SSG backbone (legacy alternative to DRP).

Rebuild of TrainModel/backbone.py:14-98: the same four SA stages as DRP but
without the inverted-residual blocks, plus two FP stages back to the
1024-point seed level. The reference's own comments (backbone.py:78-87,
"this fps_inds is just 0,1,...,1023") confirm the nested-prefix FPS property
this implementation builds on (single FPS pass, prefix slices per stage).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from graspbalance_tpu import ops
from graspbalance_tpu.nn.sa_fp import SetAbstraction, FeaturePropagation

SSG_STAGES = (
    (2048, 0.04, 64, (64, 64, 128)),
    (1024, 0.10, 32, (128, 128, 256)),
    (512, 0.20, 16, (128, 128, 256)),
    (256, 0.30, 16, (128, 128, 256)),
)


class Pointnet2Backbone(nn.Module):
    stages: tuple = SSG_STAGES
    num_seed: int = 1024
    query_order: str = "index"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pointcloud, *, sa_inds=None, train: bool = False, bn_momentum=0.1):
        xyz = pointcloud[..., :3]
        features = pointcloud[..., 3:] if pointcloud.shape[-1] > 3 else None
        out = {"input_xyz": xyz, "input_features": features}

        if sa_inds is None:
            sa_inds = ops.furthest_point_sample(xyz, self.stages[0][0])
        out["sa1_inds"] = sa_inds

        stage_xyz, stage_feats = [], []
        cur_xyz, cur_feats = xyz, features
        for i, (npoint, radius, nsample, mlp) in enumerate(self.stages):
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
