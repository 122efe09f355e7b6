"""Inference post-processing: grasp NMS, collision filtering, OBS,
all batched on device (the reference runs these on CPU numpy/Open3D)."""

from graspbalance_tpu.eval.collision import (
    collision_detect,
    voxel_downsample,
    voxel_downsample_fixed,
)
from graspbalance_tpu.eval.nms import grasp_nms

__all__ = ["collision_detect", "voxel_downsample", "voxel_downsample_fixed", "grasp_nms"]
