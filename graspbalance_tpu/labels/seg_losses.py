"""Instance-segmentation losses (TrainModel/segmentation_loss.py:143-265).

Weighted losses where each point's weight is the inverse of its label's
population (per batch item), so small objects count as much as large ones.
The reference computes weights with Python loops over unique labels; here a
bincount-gather does it in fixed shape (labels are bounded by the padded
object-slot count).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def inverse_frequency_weights(labels: jnp.ndarray, num_classes: int, *, ignore_zero: bool = False) -> jnp.ndarray:
    """(B, N) int -> (B, N) float32: w = 1 / count(label) per batch item
    (generate_weight_mask, segmentation_loss.py:149-171, weighted=True)."""

    def single(lab):
        counts = jnp.bincount(lab, length=num_classes)
        w = 1.0 / jnp.maximum(counts[lab], 1)
        if ignore_zero:
            w = jnp.where(lab == 0, 0.0, w)
        return w.astype(jnp.float32)

    return jax.vmap(single)(labels.astype(jnp.int32))


def ce_loss_weighted(logits: jnp.ndarray, target: jnp.ndarray, num_classes: int = 2) -> jnp.ndarray:
    """CELossWeighted(weighted=True): CE weighted by inverse class frequency
    of the *target* labels. logits (B, N, C), target (B, N) int."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, target[..., None].astype(jnp.int32), axis=-1)[..., 0]
    w = inverse_frequency_weights(target, num_classes)
    return jnp.sum(ce * w) / jnp.sum(w)


def smooth_l1(x: jnp.ndarray) -> jnp.ndarray:
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


def smooth_l1_loss_weighted(
    pred: jnp.ndarray, target: jnp.ndarray, mask_labels: jnp.ndarray, num_classes: int
) -> jnp.ndarray:
    """SmoothL1LossWeighted(weighted=True): per-point loss summed over the
    3 offset channels, weighted by inverse instance-label frequency.
    pred/target (B, N, 3); mask_labels (B, N) int instance ids."""
    per_point = jnp.sum(smooth_l1(pred - target), axis=-1)
    w = inverse_frequency_weights(mask_labels, num_classes)
    return jnp.sum(per_point * w) / jnp.sum(w)


def bce_with_logits_weighted(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """BCEWithLogitsLossWeighted(weighted=True) for binary {0,1} targets."""
    bce = jnp.maximum(logits, 0) - logits * target + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    w = inverse_frequency_weights(target.astype(jnp.int32), 2)
    return jnp.sum(bce * w) / jnp.sum(w)


def cluster_loss_weighted(
    x1: jnp.ndarray,
    y1: jnp.ndarray,
    x2: jnp.ndarray,
    y2: jnp.ndarray,
    delta: float,
    num_classes: int,
) -> jnp.ndarray:
    """ClusterLossWeighted: pull same-label pairs together (squared
    distance), push different-label pairs past `delta` (hinge^2), weights =
    outer product of inverse label frequencies. x (N, D), y (N,) int."""
    w1 = inverse_frequency_weights(y1[None], num_classes)[0]
    w2 = inverse_frequency_weights(y2[None], num_classes)[0]
    wmat = w1[:, None] * w2[None, :]
    same = (y1[:, None] == y2[None, :]).astype(jnp.float32)
    dist = jnp.linalg.norm(x1[:, None, :] - x2[None, :, :], axis=-1)
    pos = same * dist**2
    neg = (1.0 - same) * jnp.maximum(delta - dist, 0.0) ** 2
    return jnp.sum(wmat * (pos + neg))


def get_seg_loss(end_points: dict, num_classes: int) -> tuple[jnp.ndarray, dict]:
    """DSN loss (TrainModel/dsn.py:145-161): 0.5 * weighted foreground CE
    + 0.5 * weighted SmoothL1 on 3D center offsets.

    Requires: foreground_logits (B,N,2), center_offsets (B,N,3),
    foreground_label (B,N), instance_label (B,N), center_offset_label (B,N,3).
    """
    fg_loss = ce_loss_weighted(
        end_points["foreground_logits"], end_points["foreground_label"], 2
    )
    center_loss = smooth_l1_loss_weighted(
        end_points["center_offsets"],
        end_points["center_offset_label"],
        end_points["instance_label"],
        num_classes,
    )
    loss = 0.5 * fg_loss + 0.5 * center_loss
    return loss, {
        "loss/fg_loss": fg_loss,
        "loss/center_loss": center_loss,
        "loss/seg_loss": loss,
    }
