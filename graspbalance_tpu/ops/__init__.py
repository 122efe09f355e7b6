"""Fixed-shape point-cloud primitives for TPU.

Every op here is jit/vmap-friendly (static shapes, no data-dependent Python
control flow) and replicates the semantics of the reference CUDA extension
packages (see /root/reference/PointNet/_ext_src, pointnet2_batch, KNN), with
the quirks preserved and documented where they are observable downstream.
"""

from graspbalance_tpu.ops.fps import furthest_point_sample, random_sample
from graspbalance_tpu.ops.query import (
    ball_query,
    cylinder_query,
    multi_cylinder_query,
    set_query_batch_chunk,
)
from graspbalance_tpu.ops.knn import knn1, knn, three_nn
from graspbalance_tpu.ops.gather import gather_points, group_points
from graspbalance_tpu.ops.interpolate import three_interpolate

__all__ = [
    "furthest_point_sample",
    "random_sample",
    "ball_query",
    "cylinder_query",
    "multi_cylinder_query",
    "set_query_batch_chunk",
    "knn1",
    "knn",
    "three_nn",
    "gather_points",
    "group_points",
    "three_interpolate",
]
