"""NN building blocks (flax.linen), channels-last.

Replaces the reference's L2 stack: pytorch_utils.SharedMLP / Conv1d-2d / FC /
BNMomentumScheduler (PointNet/pytorch_utils.py) and the ModifiedNetTools
conv/norm/activation registries. Every 1x1 conv becomes a Dense over the
trailing feature axis (that IS what a 1x1 conv is), which XLA maps straight
onto the MXU.
"""

from graspbalance_tpu.nn.layers import (
    BatchNorm,
    MLPBlock,
    SharedMLP,
    bn_momentum_schedule,
)
from graspbalance_tpu.nn.sa_fp import (
    SetAbstraction,
    SetAbstractionMSG,
    SetAbstractionShift,
    SetAbstractionWOMLP,
    LocalFeaturePropagationMSG,
    FeaturePropagation,
)
from graspbalance_tpu.nn.registry import CHANNEL_MAP, create_act, create_norm

__all__ = [
    "BatchNorm",
    "MLPBlock",
    "SharedMLP",
    "bn_momentum_schedule",
    "SetAbstraction",
    "SetAbstractionMSG",
    "SetAbstractionShift",
    "SetAbstractionWOMLP",
    "LocalFeaturePropagationMSG",
    "FeaturePropagation",
    "CHANNEL_MAP",
    "create_act",
    "create_norm",
]
