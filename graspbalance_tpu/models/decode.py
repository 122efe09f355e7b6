"""Grasp decoding: raw head outputs -> 17-column grasp arrays.

Fixed-shape rebuild of pred_decode (TrainModel/graspbalance.py:139-192):
the reference boolean-filters per batch item on CPU; here every seed is
decoded on device and a validity mask carries the objectness filter, so the
output shape is static: (B, Ns, 17) + (B, Ns) bool.

Column layout (graspnetAPI GraspGroup convention, graspbalance.py:187-191):
  [score, width, height=0.02, depth, rotation(9, row-major), center(3),
   obj_id=-1]
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from graspbalance_tpu.labels.geometry import (
    GRASP_MAX_TOLERANCE,
    GRASP_MAX_WIDTH,
    batch_viewpoint_params_to_matrix,
)


@jax.jit
def pred_decode(end_points: dict) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (grasps (B, Ns, 17) float32, valid (B, Ns) bool)."""
    objectness = end_points["objectness_score"]  # (B,Ns,2)
    score = end_points["grasp_score_pred"]  # (B,Ns,A,D)
    center = end_points["fp2_xyz"]  # (B,Ns,3)
    approaching = -end_points["grasp_top_view_xyz"]  # (B,Ns,3)
    angle_cls_score = end_points["grasp_angle_cls_pred"]  # (B,Ns,A,D)
    width = jnp.clip(
        1.2 * end_points["grasp_width_pred"], 0.0, GRASP_MAX_WIDTH
    )
    tolerance = end_points["grasp_tolerance_pred"]  # (B,Ns,A,D)
    a = angle_cls_score.shape[2]

    # best in-plane angle per (seed, depth)
    angle_cls = jnp.argmax(angle_cls_score, axis=2)  # (B,Ns,D)
    angle = angle_cls.astype(jnp.float32) / a * jnp.pi

    def at_angle(x):
        return jnp.take_along_axis(x, angle_cls[:, :, None, :], axis=2).squeeze(2)

    score = at_angle(score)  # (B,Ns,D)
    width = at_angle(width)
    tolerance = at_angle(tolerance)

    # best depth per seed
    depth_cls = jnp.argmax(score, axis=2, keepdims=True)  # (B,Ns,1)
    depth = (depth_cls.astype(jnp.float32) + 1.0) * 0.01

    def at_depth(x):
        return jnp.take_along_axis(x, depth_cls, axis=2)  # (B,Ns,1)

    score = at_depth(score)
    angle = at_depth(angle)
    width = at_depth(width)
    tolerance = at_depth(tolerance)

    valid = jnp.argmax(objectness, axis=-1) == 1  # (B,Ns)
    confidence = jax.nn.softmax(objectness, axis=-1)[..., 1:2]  # (B,Ns,1)
    score = score * confidence * tolerance / GRASP_MAX_TOLERANCE

    rot = batch_viewpoint_params_to_matrix(
        approaching, angle.squeeze(-1)
    )  # (B,Ns,3,3)
    rot9 = rot.reshape(rot.shape[:-2] + (9,))

    height = jnp.full_like(score, 0.02)
    obj_ids = jnp.full_like(score, -1.0)
    grasps = jnp.concatenate(
        [score, width, height, depth, rot9, center, obj_ids], axis=-1
    )
    return grasps.astype(jnp.float32), valid
