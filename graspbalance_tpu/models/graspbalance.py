"""GraspBalance: the full two-stage grasp pose detection model.

Rebuild of TrainModel/graspbalance.py:24-136 as one flax module:

  Stage 1: DRP backbone -> (optional OBS re-seeding at inference) ->
           GraspableDetection (objectness + 300 view scores + top view).
  Label matching (training): on-device process_grasp_labels +
           match_grasp_view_and_label (padded, vmapped — replaces the
           reference's per-batch-item Python loops).
  Stage 2: multi-scale cylinder width grouping (4 radii x 4 depths in one
           fused query) -> 1x1 fuse -> gated fusion with seed features ->
           grasp parameter + tolerance heads.

The universal in-memory interface is a string-keyed dict of arrays
("end_points", like the reference but a JAX pytree). Key inventory:
  inputs:   point_clouds (B,N,3+F); [train] label arrays (see labels/label_gen)
  stage 1:  input_xyz, sa{1..4}_{xyz,features}, sa1_inds, fp2_features,
            fp2_xyz, fp2_inds, objectness_score, view_score,
            grasp_top_view_{inds,score,xyz,rot}
  labels:   batch_grasp_{point,view,view_rot,label,width,tolerance,
            view_label} (+ *_all at the top view)
  stage 2:  grasp_{score,angle_cls,width}_pred, grasp_tolerance_pred
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from graspbalance_tpu.models.drp import DRP
from graspbalance_tpu.models.backbone import Pointnet2Backbone
from graspbalance_tpu.models.heads import (
    GraspableDetection,
    GraspParametersHead,
    MultiScaleWidthGrouping,
    ToleranceHead,
)
from graspbalance_tpu.labels.label_gen import (
    match_grasp_view_and_label,
    process_grasp_labels,
)

EndPoints = dict


class GraspBalance(nn.Module):
    num_view: int = 300
    num_angle: int = 12
    num_depth: int = 4
    cylinder_radius: float = 0.08
    hmin: float = -0.02
    hmax_list: Sequence[float] = (0.01, 0.02, 0.03, 0.04)
    backbone: str = "drp"  # 'drp' | 'pointnet2'
    backbone_stages: tuple | None = None  # override stage table (tests/configs)
    multi_scale: bool = True  # multi-scale stage 2 w/ gated fusion (live
    # config, graspbalance.py:77-119) vs plain single-scale (:52-74)
    num_seed: int = 1024
    query_order: str = "index"
    dtype: jnp.dtype = jnp.float32
    # compute dtype for the stage-2 per-scale SharedMLPs only: bf16 here is
    # a measured 1.8x win on v5e (16.3 -> 9.1 ms bs=4) while bf16 for the
    # backbone measured SLOWER; non-parity speed knob, f32 default.
    width_mlp_dtype: jnp.dtype | None = None
    # 'reduced' skips the view-permuted (B,Ns,V,A,D) label materializations
    # (bit-exact through get_loss, tests/test_label_reduced.py; lower
    # memory, measured perf-neutral — docs/NOTES.md); 'full' keeps the
    # reference layout in end_points (*_all tensors) and is the default.
    label_impl: str = "full"

    @nn.compact
    def __call__(
        self,
        batch: dict,
        *,
        train: bool = False,
        bn_momentum=0.1,
        match_labels: bool | None = None,
    ) -> EndPoints:
        """batch: dict with 'point_clouds' (B,N,3+F); optional 'sa_inds'
        (B,2048) precomputed FPS; when train=True also the padded label
        arrays consumed by labels/label_gen.process_grasp_labels; at
        inference optionally 'seed_cluster' (B,N) instance ids for OBS
        (pre-applied by eval/obs — see ObjectBalanceSampling).

        `train` gates BatchNorm (batch vs running stats); `match_labels`
        gates the label-matching forward path and defaults to `train`. The
        reference's loss-only eval runs eval-mode BN with the training label
        path (net.eval() + constructor is_training=True, train.py:177-196) —
        that is train=False, match_labels=True here."""
        match = train if match_labels is None else match_labels
        bb_cls = DRP if self.backbone == "drp" else Pointnet2Backbone
        bb_kwargs = dict(
            num_seed=self.num_seed,
            query_order=self.query_order,
            dtype=self.dtype,
            name="backbone",
        )
        if self.backbone_stages is not None:
            bb_kwargs["stages"] = self.backbone_stages
        ep = bb_cls(**bb_kwargs)(
            batch["point_clouds"],
            sa_inds=batch.get("sa_inds"),
            train=train,
            bn_momentum=bn_momentum,
        )

        seed_xyz = ep["fp2_xyz"]
        seed_features = ep["fp2_features"]
        # OBS re-seeding (inference): given a DSN instance clustering in
        # batch['seed_cluster'], upsample seed features to the full cloud
        # and re-seed with an equal per-object budget
        # (graspbalance.py:36-46 + modules.py:178-221).
        if "seed_cluster" in batch:
            from graspbalance_tpu.eval.obs import object_balance_indices
            from graspbalance_tpu.ops.interpolate import interpolate_features

            # selection first (it never reads features), then interpolate
            # seed features at just the 1024 selected points — identical to
            # the reference's full-cloud up_sample_features + row gather
            # (graspbalance.py:37-42, modules.py:181-189): interpolation is
            # pointwise in the query, so deferring it commutes with the
            # gather and skips the other ~19k rows.
            obs_inds = object_balance_indices(
                ep["input_xyz"], batch["seed_cluster"], num_seed=self.num_seed
            )
            obs_xyz = jnp.take_along_axis(
                ep["input_xyz"], obs_inds[..., None], axis=1
            )
            obs_feats = interpolate_features(obs_xyz, seed_xyz, seed_features)
            ep["fp2_inds_fps"] = ep["fp2_inds"]
            seed_xyz = ep["fp2_xyz"] = obs_xyz
            seed_features = ep["fp2_features"] = obs_feats
            ep["fp2_inds"] = obs_inds

        ep.update(
            GraspableDetection(
                num_view=self.num_view, dtype=self.dtype, name="graspable"
            )(seed_xyz, seed_features, train=train, bn_momentum=bn_momentum)
        )

        if match:
            grasp_labels = process_grasp_labels(
                seed_xyz, batch, impl=self.label_impl
            )
            matched = match_grasp_view_and_label(
                ep["grasp_top_view_inds"], grasp_labels
            )
            ep.update(matched)
            stage2_seed_xyz = matched["batch_grasp_point"]
            stage2_rot = matched["batch_grasp_view_rot"]
        else:
            stage2_seed_xyz = seed_xyz
            stage2_rot = ep["grasp_top_view_rot"]

        vp = MultiScaleWidthGrouping(
            cylinder_radius=self.cylinder_radius,
            hmin=self.hmin,
            hmax_list=tuple(self.hmax_list),
            scales=(0.25, 0.5, 0.75, 1.0) if self.multi_scale else (1.0,),
            query_order=self.query_order,
            dtype=self.width_mlp_dtype or self.dtype,
            name="width_grouping",
        )(
            stage2_seed_xyz, ep["input_xyz"], stage2_rot,
            train=train, bn_momentum=bn_momentum,
        )  # (B, Ns, D, n_scales*256)
        if self.multi_scale:
            vp = nn.Dense(
                256, dtype=self.dtype, param_dtype=jnp.float32,
                name="fuse_multi_scale",
            )(vp)
            gate = nn.sigmoid(
                nn.Dense(
                    256, dtype=self.dtype, param_dtype=jnp.float32,
                    name="gate_fusion",
                )(seed_features)
            )
            gated = (gate * seed_features.astype(gate.dtype))[:, :, None, :]
            vp_features = vp + gated  # (B, Ns, D, 256)
        else:
            vp_features = vp  # plain GraspPoseStage2 (graspbalance.py:52-74)

        ep.update(
            GraspParametersHead(
                num_angle=self.num_angle,
                num_depth=self.num_depth,
                dtype=self.dtype,
                name="grasp_params",
            )(vp_features, train=train, bn_momentum=bn_momentum)
        )
        ep.update(
            ToleranceHead(
                num_angle=self.num_angle,
                num_depth=self.num_depth,
                dtype=self.dtype,
                name="tolerance",
            )(vp_features, train=train, bn_momentum=bn_momentum)
        )
        return ep
