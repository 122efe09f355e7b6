"""Norm/activation registries + grouper feature-dim map.

Rebuild of the reference's vendored openpoints toolbox registries
(ModifiedNetTools/norm.py:48-84, activation.py:5-66). The live GraspBalance
config only ever uses BN+ReLU, but the toolbox is part of the reference API
surface (DRP's block constructors take norm_args/act_args).

Channels-LAST design collapses the reference's 1d/2d layout variants: torch
needs LayerNorm1d/2d permute wrappers and a FastBatchNorm1d because its
channel axis position differs per rank; here every norm acts on the trailing
feature axis, so the dimension suffixes are pure aliases (kept for API
parity). `syncbn` is likewise an alias for BatchNorm: batch stats under our
SPMD mesh are already cross-replica (see nn/layers.BatchNorm notes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from graspbalance_tpu.nn.layers import BatchNorm

# feature-dim calculator per grouper feature mode
# (ModifiedNetTools/activation.py:26-42); x = feature channels, 3 = xyz
CHANNEL_MAP = {
    "fj": lambda x: x,
    "df": lambda x: x,
    "assa": lambda x: x * 3,
    "assa_dp": lambda x: x * 3 + 3,
    "dp_fj": lambda x: 3 + x,
    "pj": lambda x: x,
    "dp": lambda x: 3,
    "pi_dp": lambda x: x + 3,
    "pj_dp": lambda x: x + 3,
    "dp_fj_df": lambda x: x * 2 + 3,
    "dp_fi_df": lambda x: x * 2 + 3,
    "pi_dp_fj_df": lambda x: x * 2 + 6,
    "pj_dp_fj_df": lambda x: x * 2 + 6,
    "pj_dp_df": lambda x: x + 6,
    "dp_df": lambda x: x + 3,
}


def _mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


_ACT_LAYER = {
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "mish": _mish,
    "relu": jax.nn.relu,
    "relu6": jax.nn.relu6,
    "leaky_relu": jax.nn.leaky_relu,
    "leakyrelu": jax.nn.leaky_relu,
    "elu": jax.nn.elu,
    "celu": jax.nn.celu,
    "selu": jax.nn.selu,
    "gelu": jax.nn.gelu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "hard_sigmoid": jax.nn.hard_sigmoid,
    "hard_swish": jax.nn.hard_swish,
}


def create_act(act_args):
    """act_args: None | str | {'act': str, **kwargs} -> callable or None.

    Mirrors activation.py:44-66 minus torch's `inplace` knob (meaningless
    under XLA). 'prelu' is parameterized -> returns a flax module; all
    others are pure functions.
    """
    if act_args is None:
        return None
    if isinstance(act_args, str):
        act_args = {"act": act_args}
    act_args = dict(act_args)
    act = act_args.pop("act", None)
    act_args.pop("inplace", None)
    if act is None:
        return None
    act = act.lower()
    if act == "prelu":
        if "init" in act_args:
            act_args["init_value"] = act_args.pop("init")
        return PReLU(**act_args)
    if act not in _ACT_LAYER:
        raise ValueError(f"activation {act!r} is not supported")
    fn = _ACT_LAYER[act]
    if act_args:
        return lambda x: fn(x, **act_args)
    return fn


class PReLU(nn.Module):
    """Parametric ReLU (torch nn.PReLU equivalent, shared single slope)."""

    num_parameters: int = 1
    init_value: float = 0.25  # named torch's `init`; flax reserves .init

    @nn.compact
    def __call__(self, x, **_):
        a = self.param(
            "alpha",
            lambda _, s: jnp.full(s, self.init_value, jnp.float32),
            (self.num_parameters,),
        )
        return jnp.where(x >= 0, x, a * x)


class _StatlessNorm(nn.Module):
    """Adapter giving LN/GN/IN the same (x, train=..., momentum=...) calling
    convention as BatchNorm so registries compose with MLPBlock."""

    features: int
    kind: str = "ln"
    num_groups: int | None = None
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, *, train: bool = False, momentum=0.1):
        del train, momentum
        if self.kind == "ln":
            return nn.LayerNorm(epsilon=self.epsilon, name="ln")(x)
        if self.kind == "gn":
            return nn.GroupNorm(
                num_groups=self.num_groups or _default_groups(self.features),
                epsilon=self.epsilon,
                name="gn",
            )(x)
        if self.kind == "in":
            # instance norm = GroupNorm with one group per channel
            return nn.GroupNorm(
                num_groups=self.features, epsilon=self.epsilon, name="in"
            )(x)
        raise ValueError(self.kind)


def _default_groups(channels: int) -> int:
    """Largest divisor of `channels` that is <= 32 (torch GroupNorm needs
    num_groups | channels; the reference's registry leaves this to the
    caller)."""
    for g in range(min(32, channels), 0, -1):
        if channels % g == 0:
            return g
    return 1


def create_norm(norm_args, channels: int, dimension=None, name=None):
    """norm_args: None | str | {'norm': str, **kwargs} -> flax module or None.

    Mirrors norm.py:66-84 incl. the dimension-suffix completion ('bn' + '2d'
    -> 'bn2d'); all suffixed variants normalize the trailing feature axis
    here (channels-last collapses the reference's layout-specific classes).
    """
    if norm_args is None:
        return None
    if isinstance(norm_args, dict):
        norm_args = dict(norm_args)
        norm = norm_args.pop("norm", None)
    else:
        norm = norm_args
        norm_args = {}
    if norm is None:
        return None
    norm = norm.lower()
    if dimension is not None:
        dimension = str(dimension).lower()
        if dimension not in norm:
            norm += dimension
    base = norm.removeprefix("fast").removesuffix("1d").removesuffix("2d")
    if base in ("bn", "syncbn"):
        return BatchNorm(epsilon=norm_args.get("eps", 1e-5), name=name)
    if base == "ln":
        return _StatlessNorm(
            features=channels, kind="ln", epsilon=norm_args.get("eps", 1e-5),
            name=name,
        )
    if base == "gn":
        return _StatlessNorm(
            features=channels,
            kind="gn",
            num_groups=norm_args.get("num_groups", _default_groups(channels)),
            epsilon=norm_args.get("eps", 1e-5),
            name=name,
        )
    if base == "in":
        return _StatlessNorm(
            features=channels, kind="in", epsilon=norm_args.get("eps", 1e-5),
            name=name,
        )
    raise ValueError(f"norm {norm!r} is not supported")
