"""Grasp detection heads (TrainModel/modules.py rebuilt channels-last).

Output layout conventions (differ from the reference's channels-first):
  objectness_score      (B, Ns, 2)
  view_score            (B, Ns, V)
  grasp_score_pred      (B, Ns, A, D)
  grasp_angle_cls_pred  (B, Ns, A, D)
  grasp_width_pred      (B, Ns, A, D)
  grasp_tolerance_pred  (B, Ns, A, D)
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from graspbalance_tpu import ops
from graspbalance_tpu.nn.layers import MLPBlock, SharedMLP
from graspbalance_tpu.labels.geometry import (
    batch_viewpoint_params_to_matrix,
    generate_grasp_views,
)


class GraspableDetection(nn.Module):
    """Objectness + per-view score head (modules.py:49-86).

    Dense stack 256 -> 256 -> (2+V) -> (2+V); picks the argmax view per seed
    and builds its approach rotation (angle 0).
    """

    num_view: int = 300
    seed_feature_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, seed_xyz, seed_features, *, train: bool, bn_momentum=0.1):
        x = MLPBlock(self.seed_feature_dim, dtype=self.dtype, name="conv1")(
            seed_features, train=train, bn_momentum=bn_momentum
        )
        x = MLPBlock(2 + self.num_view, dtype=self.dtype, name="conv2")(
            x, train=train, bn_momentum=bn_momentum
        )
        x = nn.Dense(2 + self.num_view, dtype=self.dtype, param_dtype=jnp.float32,
                     name="conv3")(x)
        objectness_score = x[..., :2].astype(jnp.float32)
        view_score = x[..., 2:].astype(jnp.float32)

        top_view_inds = jnp.argmax(view_score, axis=-1).astype(jnp.int32)  # (B,Ns)
        top_view_scores = jnp.max(view_score, axis=-1)
        templates = generate_grasp_views(self.num_view)  # (V,3)
        vp_xyz = templates[top_view_inds]  # (B,Ns,3)
        angles = jnp.zeros(vp_xyz.shape[:-1], vp_xyz.dtype)
        vp_rot = batch_viewpoint_params_to_matrix(-vp_xyz, angles)  # (B,Ns,3,3)
        return {
            "objectness_score": objectness_score,
            "view_score": view_score,
            "grasp_top_view_inds": top_view_inds,
            "grasp_top_view_score": top_view_scores,
            "grasp_top_view_xyz": vp_xyz,
            "grasp_top_view_rot": vp_rot,
        }


class MultiScaleWidthGrouping(nn.Module):
    """All four cylinder-radius scales of the width-grouping head in one pass.

    The reference instantiates four GraspWidthGrouping modules (radius 0.25/
    0.5/0.75/1.0 x cylinder_radius), each launching 4 cylinder-query kernels
    (one per gripper depth) and its own SharedMLP(3->64->128->256)+maxpool
    (graspbalance.py:84-87, modules.py:89-124). Here one multi_cylinder_query
    computes all 16 neighborhoods in a single sweep over the cloud; each
    scale keeps its own MLP weights, batched as one einsum per layer.

    Returns (B, Ns, D, 4*256) — the per-scale features concatenated.
    """

    nsample: int = 64
    cylinder_radius: float = 0.08
    hmin: float = -0.02
    hmax_list: Sequence[float] = (0.01, 0.02, 0.03, 0.04)
    scales: Sequence[float] = (0.25, 0.5, 0.75, 1.0)
    mlp: Sequence[int] = (64, 128, 256)
    query_order: str = "index"
    impl: str = "auto"  # 'fused_pallas' | 'xla' | 'auto'
    # scale-MLP executor: 'auto' (fused Pallas tail on TPU eval, XLA
    # elsewhere) | 'xla' | 'fused'. The fused path folds eval-mode BN into
    # the dense weights and runs layers 1..n + max-over-K VMEM-resident
    # (ops/pallas/widthmlp_kernel.py); training always uses XLA (batch
    # stats). Numerics: identical algebra, fp reassociation only.
    mlp_impl: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, seed_xyz, cloud_xyz, vp_rot, *, train: bool, bn_momentum=0.1):
        radii = tuple(s * self.cylinder_radius for s in self.scales)
        impl = self.impl
        if impl == "auto":
            # v5e measurement (tools/bench_multicyl_kernel.py, 2026-08):
            # the fused Pallas kernel runs ~256 ms net at production shape
            # (bs=4, 20k pts, 1024 seeds) vs ~96 ms for the XLA
            # query + gather + rotate — its one-hot coordinate-extraction
            # matmuls are MXU-bound at poor utilization. Keep XLA until the
            # kernel's pick path is restructured.
            impl = "xla"
        if impl == "fused_pallas":
            from graspbalance_tpu.ops.pallas.multicyl_kernel import (
                multi_cylinder_group,
            )

            # one fused kernel: 16 queries + group + gripper-frame rotation,
            # VMEM-resident. No gradient flows through grouped geometry
            # (inputs are data / label rotations), mirrored by stop_gradient.
            rel, _ = multi_cylinder_group(
                jax.lax.stop_gradient(cloud_xyz[..., :3]),
                jax.lax.stop_gradient(seed_xyz),
                jax.lax.stop_gradient(vp_rot),
                radii,
                self.hmin,
                tuple(self.hmax_list),
                self.nsample,
                emit_idx=False,  # idx unused: halves the custom-call result
            )  # (B, R, H, Ns, K, 3)
            n_r = len(radii)
        else:
            idx = ops.multi_cylinder_query(
                cloud_xyz,
                seed_xyz,
                vp_rot,
                radii,
                self.hmin,
                tuple(self.hmax_list),
                self.nsample,
                order=self.query_order,
            )  # (B, R, H, Ns, K)
            b, n_r, n_h, ns, k = idx.shape

        mlp_impl = self.mlp_impl
        if mlp_impl == "auto":
            mlp_impl = (
                "fused"
                if (
                    not train
                    and not self.is_initializing()
                    and jax.default_backend() == "tpu"
                    and self.dtype == jnp.float32
                )
                else "xla"
            )
        use_fused_tail = (
            mlp_impl == "fused" and not train and not self.is_initializing()
        )

        if impl != "fused_pallas" and use_fused_tail:
            # seed-major gather, NO rotation or subtraction pass: both fold
            # into the kernel's per-seed layer-0 weights/biases
            # ((p-c)@R@W0 == p@(R@W0) + (b0 - c@(R@W0))), so the rotated
            # rel tensor, the conv emitter's ~3 ms layout copy, and the
            # 6.2 ms broadcast-subtract (profile 2026-08-17) never exist
            idx_t = jnp.transpose(idx, (0, 3, 1, 2, 4))  # (B, S, R, H, K)
            grouped = ops.group_points(
                cloud_xyz, idx_t.reshape(b, ns * n_r * n_h, k)
            ).reshape(b, ns, n_r, n_h, k, 3)
            return self._fused_mlp_rot(grouped, seed_xyz, vp_rot, n_r)

        if impl != "fused_pallas":
            grouped = ops.group_points(
                cloud_xyz, idx.reshape(b, n_r * n_h * ns, k)
            ).reshape(b, n_r, n_h, ns, k, 3)
            # relative, then rotate into the gripper frame (rotate_xyz=True,
            # pointnet2_utils.py:281-284): g' = R^T (p - c)
            rel = grouped - seed_xyz[:, None, None, :, None, :]
            # NOTE (v5e, 2026-08-17): an elementwise-FMA rotation (to dodge
            # the conv emitter's ~3 ms layout copy on this einsum) measured
            # 60.05 vs 60.65 clouds/s e2e — the strided minor-dim-3 slices
            # cost what the copy did. Einsum kept.
            rel = jnp.einsum("brhskj,bsji->brhski", rel, vp_rot)
        if use_fused_tail:
            return self._fused_mlp_tail(rel, n_r)

        feats = []
        for ri in range(n_r):
            f = SharedMLP(self.mlp, dtype=self.dtype, name=f"mlp_scale{ri}")(
                rel[:, ri].astype(self.dtype), train=train, bn_momentum=bn_momentum
            )  # (B, H, Ns, K, C)
            feats.append(jnp.max(f, axis=3))  # (B, H, Ns, C)
        out = jnp.concatenate(feats, axis=-1)  # (B, H, Ns, 4C)
        return jnp.transpose(out, (0, 2, 1, 3))  # (B, Ns, D, 4C)

    def _fused_mlp_tail(self, rel, n_r, *, interpret=None):
        """Eval-only scale MLPs via the fused Pallas tail.

        Reads the SAME param/batch_stats subtrees the standard path
        creates (mlp_scale{ri}/layer{li}/{dense,bn}) and folds eval-mode
        BN (epsilon 1e-5, nn/layers.py BatchNorm default) into effective
        dense weights: y = relu(x @ (W*a) + (beta - mean*a)),
        a = gamma/sqrt(var+eps). The whole per-scale chain + max-over-K
        runs VMEM-resident (ops/pallas/widthmlp_kernel.py)."""
        from graspbalance_tpu.ops.pallas.widthmlp_kernel import width_mlp_fused

        if interpret is None:  # explicit 'fused' off-TPU runs interpreted
            interpret = jax.default_backend() != "tpu"
        out = width_mlp_fused(
            rel, self._folded_mlp_weights(n_r), interpret=interpret
        )
        return jnp.transpose(out, (0, 2, 1, 3))  # (B, Ns, D, R*C)

    def _fused_mlp_rot(self, grouped, seed_xyz, vp_rot, n_r, *, interpret=None):
        """Eval-only scale MLPs with rotation AND center subtraction folded
        into layer 0.

        grouped: (B, S, R, H, K, 3) raw gathered neighbor coords. Output is
        the head's final (B, Ns, D, R*C) layout directly — see
        ops/pallas/widthmlp_kernel.width_mlp_fused_rot."""
        from graspbalance_tpu.ops.pallas.widthmlp_kernel import (
            width_mlp_fused_rot,
        )

        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        return width_mlp_fused_rot(
            grouped,
            seed_xyz,
            vp_rot,
            self._folded_mlp_weights(n_r),
            interpret=interpret,
        )

    def _folded_mlp_weights(self, n_r):
        """Eval-mode BN fold of the mlp_scale{ri} SharedMLP param trees
        (epsilon 1e-5, nn/layers.py BatchNorm default):
        y = relu(x @ (W*a) + (beta - mean*a)), a = gamma/sqrt(var+eps)."""
        weights = []
        for ri in range(n_r):
            p = self.scope.get_variable("params", f"mlp_scale{ri}")
            stats = self.scope.get_variable("batch_stats", f"mlp_scale{ri}")
            layer_ws = []
            for li in range(len(self.mlp)):
                kern = p[f"layer{li}"]["dense"]["kernel"]
                bn = p[f"layer{li}"]["bn"]
                bs = stats[f"layer{li}"]["bn"]
                a = bn["scale"] * jax.lax.rsqrt(bs["var"] + 1e-5)
                layer_ws.append((kern * a[None, :], bn["bias"] - bs["mean"] * a))
            weights.append(tuple(layer_ws))
        return tuple(weights)


class GraspParametersHead(nn.Module):
    """Score / angle-class / width regression head (modules.py:127-152)."""

    num_angle: int = 12
    num_depth: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, vp_features, *, train: bool, bn_momentum=0.1):
        """vp_features (B, Ns, D, 256) -> dict of (B, Ns, A, D)."""
        x = MLPBlock(128, dtype=self.dtype, name="conv1")(
            vp_features, train=train, bn_momentum=bn_momentum
        )
        x = MLPBlock(128, dtype=self.dtype, name="conv2")(
            x, train=train, bn_momentum=bn_momentum
        )
        x = nn.Dense(3 * self.num_angle, dtype=self.dtype, param_dtype=jnp.float32,
                     name="conv3")(x)
        b, ns, d, _ = x.shape
        x = x.reshape(b, ns, d, 3, self.num_angle).astype(jnp.float32)
        x = jnp.moveaxis(x, 2, -1)  # (B, Ns, 3, A, D)
        return {
            "grasp_score_pred": x[:, :, 0],
            "grasp_angle_cls_pred": x[:, :, 1],
            "grasp_width_pred": x[:, :, 2],
        }


class ToleranceHead(nn.Module):
    """Per-angle tolerance regression head (modules.py:155-175)."""

    num_angle: int = 12
    num_depth: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, vp_features, *, train: bool, bn_momentum=0.1):
        x = MLPBlock(128, dtype=self.dtype, name="conv1")(
            vp_features, train=train, bn_momentum=bn_momentum
        )
        x = MLPBlock(128, dtype=self.dtype, name="conv2")(
            x, train=train, bn_momentum=bn_momentum
        )
        x = nn.Dense(self.num_angle, dtype=self.dtype, param_dtype=jnp.float32,
                     name="conv3")(x)
        return {"grasp_tolerance_pred": jnp.moveaxis(x.astype(jnp.float32), 2, -1)}
