"""graspbalance_tpu — a TPU-native framework for balanced grasp pose detection.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of the reference
GraspBalance pipeline (PyTorch+CUDA): point-cloud set abstraction backbones
(DRP / PointNet++), two-stage grasp pose detection heads, on-device grasp
label generation and multi-task losses with scale-balanced reweighting,
object-balanced seed sampling, grasp decoding / NMS / collision filtering,
and a pjit data-parallel training stack.

Layout:
  ops/       fixed-shape point-cloud primitives (FPS, ball/cylinder query,
             kNN, three-NN interpolation) as pure XLA + Pallas TPU kernels
  nn/        shared MLP / conv-block / norm building blocks (flax.linen)
  models/    DRP backbone, grasp heads, GraspBalance model, DSN segmentation
  labels/    grasp view geometry, on-device label matching, losses
  data/      GraspNet-1B loader with padded fixed-shape labels + synthetic data
  train/     pjit train step, optimizer/schedules, checkpointing, metrics
  eval/      decode, grasp NMS, collision detection (batched, on device)
  parallel/  device mesh + sharding helpers
"""

__version__ = "0.1.0"
