"""Small shared utilities."""

from graspbalance_tpu.utils.misc import (
    count_params,
    param_bytes,
    tree_norm,
)

__all__ = ["count_params", "param_bytes", "tree_norm"]
