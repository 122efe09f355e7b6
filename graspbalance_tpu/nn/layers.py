"""Core layers: Dense+BN+ReLU blocks with a dynamic BN momentum.

BatchNorm notes (parity with torch.nn.BatchNorm1d/2d):
* torch convention: running <- (1 - m) * running + m * batch, where m is the
  *new-sample* weight. The reference decays m per epoch 0.5 -> 1e-3
  (pytorch_utils.BNMomentumScheduler, train.py:110-113). Here momentum is a
  traced call argument, so the schedule costs zero recompiles.
* normalization uses the biased batch variance; the running-var update uses
  the unbiased one (torch semantics).
* batch stats are stored in the flax 'batch_stats' collection; under pjit
  the axis-mean is the global mean because the batch axis is sharded and the
  reductions run under SPMD (XLA inserts the cross-replica psum).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


def bn_momentum_schedule(
    epoch: jnp.ndarray | int,
    *,
    init: float = 0.5,
    decay_rate: float = 0.5,
    decay_step: int = 2,
    floor: float = 0.001,
):
    """Reference BN momentum schedule (train.py:110-112):
    max(init * decay_rate ** (epoch // decay_step), floor)."""
    e = jnp.asarray(epoch)
    m = init * decay_rate ** (e // decay_step).astype(jnp.float32)
    return jnp.maximum(m, floor)


class BatchNorm(nn.Module):
    """BatchNorm over all axes but the last, torch-momentum convention."""

    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool, momentum=0.1):
        features = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(features, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(features, jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)

        if train:
            reduce_axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=reduce_axes)
            var = jnp.mean(jnp.square(xf), axis=reduce_axes) - jnp.square(mean)
            n = 1
            for a in reduce_axes:
                n *= x.shape[a]
            unbiased = var * (n / max(n - 1, 1))
            if not self.is_initializing():
                m = jnp.asarray(momentum, jnp.float32)
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jnp.asarray(scale, self.dtype) * jnp.asarray(
            1.0 / jnp.sqrt(var + self.epsilon), self.dtype
        )
        return (
            x.astype(self.dtype) - jnp.asarray(mean, self.dtype)
        ) * inv + jnp.asarray(bias, self.dtype)


class MLPBlock(nn.Module):
    """Dense (= 1x1 conv) + optional norm + optional act, orderable.

    Mirrors create_convblock1d/2d (ModifiedNetTools/conv.py:24-145) and
    pytorch_utils.Conv1d/2d: bias dropped when a norm is present regardless
    of `order` (the reference's bias=False-with-norm rule), and
    'norm-act-conv' normalizes the INPUT channel count (conv.py:40-48).
    """

    features: int
    use_bn: bool = True
    act: bool = True
    norm_type: str = "bn"  # any create_norm key (nn/registry.py)
    act_type: str = "relu"  # any create_act key
    order: str = "conv-norm-act"  # | 'norm-act-conv' | 'conv-act-norm'
    dtype: jnp.dtype = jnp.float32

    def _norm(self, x, features, *, train, momentum):
        if self.norm_type == "bn":
            return BatchNorm(dtype=self.dtype, name="bn")(
                x, train=train, momentum=momentum
            )
        from graspbalance_tpu.nn.registry import create_norm

        return create_norm(self.norm_type, features, name="bn")(
            x, train=train, momentum=momentum
        )

    def _act(self, x):
        if self.act_type == "relu":
            return nn.relu(x)
        from graspbalance_tpu.nn.registry import create_act

        return create_act(self.act_type)(x)

    @nn.compact
    def __call__(self, x, *, train: bool, bn_momentum=0.1, stage: str | None = None):
        """stage=None: the full block. stage='dense': only the 1x1 conv;
        stage='post': only norm+act on a precomputed pre-activation. The
        split lets callers commute the conv with a gather (the lifted
        local-aggregation path, models/drp.py) while keeping this module's
        param tree; both partial stages require the default conv-norm-act
        order and together reproduce the full block exactly."""
        if self.order not in ("conv-norm-act", "norm-act-conv", "conv-act-norm"):
            raise NotImplementedError(f"{self.order} is not supported")
        dense = nn.Dense(
            self.features,
            use_bias=not self.use_bn,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="dense",
        )
        if stage is not None:
            if self.order != "conv-norm-act":
                raise ValueError("staged call requires order='conv-norm-act'")
            if stage == "dense":
                return dense(x)
            if stage != "post":
                raise ValueError(f"unknown stage {stage}")
            if self.use_bn:
                x = self._norm(x, self.features, train=train, momentum=bn_momentum)
            if self.act:
                x = self._act(x)
            return x
        if self.order == "norm-act-conv":
            if self.use_bn:
                x = self._norm(x, x.shape[-1], train=train, momentum=bn_momentum)
            if self.act:
                x = self._act(x)
            return dense(x)
        x = dense(x)
        if self.order == "conv-norm-act":
            if self.use_bn:
                x = self._norm(x, self.features, train=train, momentum=bn_momentum)
            if self.act:
                x = self._act(x)
        else:  # conv-act-norm
            if self.act:
                x = self._act(x)
            if self.use_bn:
                x = self._norm(x, self.features, train=train, momentum=bn_momentum)
        return x


class SharedMLP(nn.Module):
    """Stack of MLPBlocks applied pointwise over the trailing feature axis.

    Equivalent of pytorch_utils.SharedMLP (Conv2d 1x1 stacks with BN+ReLU)
    but channels-last: input (..., C_in) -> (..., layers[-1]).
    """

    layers: Sequence[int]
    use_bn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool, bn_momentum=0.1):
        for i, width in enumerate(self.layers):
            x = MLPBlock(
                width, use_bn=self.use_bn, dtype=self.dtype, name=f"layer{i}"
            )(x, train=train, bn_momentum=bn_momentum)
        return x
