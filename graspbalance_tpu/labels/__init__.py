"""Grasp label geometry, on-device label generation, and losses."""

from graspbalance_tpu.labels.geometry import (
    generate_grasp_views,
    batch_viewpoint_params_to_matrix,
    transform_point_cloud,
)

__all__ = [
    "generate_grasp_views",
    "batch_viewpoint_params_to_matrix",
    "transform_point_cloud",
]
