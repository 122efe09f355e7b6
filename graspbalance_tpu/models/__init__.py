"""Model layer: backbones, heads, full GraspBalance model, decode."""

from graspbalance_tpu.models.drp import DRP
from graspbalance_tpu.models.backbone import Pointnet2Backbone
from graspbalance_tpu.models.graspbalance import GraspBalance, EndPoints

__all__ = ["DRP", "Pointnet2Backbone", "GraspBalance", "EndPoints"]
