"""Focal losses (loss_utils.py:64-150 equivalents).

Defined-but-unused by the reference's live loss (SURVEY.md P10); provided
for completeness and for experiments replacing the graspable CE.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def focal_loss(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    *,
    alpha: jnp.ndarray | None = None,
    gamma: float = 2.0,
    smooth: float = 1e-4,
    valid: jnp.ndarray | None = None,
    reduction: str = "mean",
):
    """Multi-class focal loss (FocalLoss_Ori semantics): per sample,
    -alpha_c * (1 - p_c)^gamma * log(p_c + smooth) at the target class.

    logits (..., C); target (...,) int; alpha optional (C,).
    """
    prob = jax.nn.softmax(logits, axis=-1)
    pt = jnp.take_along_axis(prob, target[..., None].astype(jnp.int32), axis=-1)[..., 0]
    pt = pt + smooth
    logpt = jnp.log(pt)
    a = 1.0 if alpha is None else alpha[target]
    loss = -a * jnp.power(1.0 - pt, gamma) * logpt
    if valid is not None:
        loss = loss * valid
        if reduction == "mean":
            return jnp.sum(loss) / (jnp.sum(valid) + 1e-6)
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def binary_focal_loss(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    *,
    alpha: float = 3.0,
    gamma: float = 2.0,
    smooth: float = 1e-6,
):
    """Binary focal loss (BinaryFocalLoss semantics): positive term
    (1-p)^gamma * -log(p); negative term alpha * p^gamma * -logsigmoid(-x);
    weights stop-gradiented as in the reference (.detach())."""
    prob = jnp.clip(jax.nn.sigmoid(logits), smooth, 1.0 - smooth)
    pos = (target == 1).astype(logits.dtype)
    neg = (target == 0).astype(logits.dtype)
    pos_w = jax.lax.stop_gradient(pos * jnp.power(1.0 - prob, gamma))
    neg_w = jax.lax.stop_gradient(neg * jnp.power(prob, gamma))
    pos_loss = -pos_w * jnp.log(prob)
    neg_loss = -alpha * neg_w * jax.nn.log_sigmoid(-logits)
    return jnp.mean(pos_loss + neg_loss)
