"""Three-point inverse-distance interpolation.

Mirrors pointnet2 three_interpolate (interpolate_gpu.cu:77-159) with the
weight computation from PointnetFPModule (pointnet2_modules.py:413-416).
Channels-last: feats (B, M, C).
"""

from __future__ import annotations

import jax.numpy as jnp

from graspbalance_tpu.ops.gather import group_points
from graspbalance_tpu.ops.knn import three_nn


def three_interpolate(feats: jnp.ndarray, idx: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """feats (B, M, C), idx (B, N, 3), weight (B, N, 3) -> (B, N, C)."""
    gathered = group_points(feats, idx)  # (B, N, 3, C)
    return jnp.sum(gathered * weight[..., None], axis=2)


def inverse_distance_weights(dist: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """(B, N, 3) euclidean distances -> normalized inverse-distance weights."""
    recip = 1.0 / (dist + eps)
    return recip / jnp.sum(recip, axis=-1, keepdims=True)


def interpolate_features(unknown: jnp.ndarray, known: jnp.ndarray, known_feats: jnp.ndarray) -> jnp.ndarray:
    """Upsample features from `known` points onto `unknown` points.

    The three_nn -> inverse-distance -> three_interpolate composite used by
    PointnetFPModule (pointnet2_modules.py:407-420) and the OBS upsampling
    path (TrainModel/graspbalance.py:37-42).
    """
    dist, idx = three_nn(unknown, known)
    return three_interpolate(known_feats, idx, inverse_distance_weights(dist))
