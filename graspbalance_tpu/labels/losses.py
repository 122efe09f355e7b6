"""Multi-task loss with object-scale reweighting (TrainModel/loss.py rebuild).

total = graspable CE + view MSE + 0.2 * (score huber + angle CE + width huber
+ tolerance huber), every stage-2 term masked by objectness & graspability
and reweighted by the inverse-log object-scale prior.

All metrics use nan-free masked means (the reference's boolean-indexed
``.mean()`` yields NaN on empty masks; we return 0 instead so metric
aggregation stays finite — a deliberate, documented deviation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from graspbalance_tpu.labels.geometry import (
    GRASP_MAX_TOLERANCE,
    GRASP_MAX_WIDTH,
    THRESH_BAD,
    THRESH_GOOD,
)
from graspbalance_tpu.labels.scale_prior import (
    SCALE_BIN_EDGES,
    scale_prior_weights,
)


def huber_loss(error, delta: float = 1.0):
    """loss_utils.py:51-56."""
    abs_err = jnp.abs(error)
    quad = jnp.minimum(abs_err, delta)
    return 0.5 * quad * quad + delta * (abs_err - quad)


def _softmax_ce(logits, labels, axis=-1):
    """Integer-label cross entropy along `axis`, no reduction."""
    logp = jax.nn.log_softmax(logits, axis=axis)
    lab = jnp.expand_dims(labels, axis)
    return -jnp.take_along_axis(logp, lab, axis=axis).squeeze(axis)


def _masked_mean(values, mask, eps: float = 1e-6):
    m = mask.astype(jnp.float32)
    return jnp.sum(values * m) / (jnp.sum(m) + eps)


def reweight_from_target_width(target_w):
    """Scale-prior weight from the per-seed target width (loss.py:33-41):
    bin into the 32 scale intervals with strict inequalities (out-of-range
    -> bin 0) and index the inverse-log prior. target_w (B,Ns) -> (B,Ns)."""
    lo = jnp.asarray(SCALE_BIN_EDGES[:-1], jnp.float32)
    hi = jnp.asarray(SCALE_BIN_EDGES[1:], jnp.float32)
    w = target_w[..., None]
    in_bin = jnp.logical_and(lo < w, hi > w)  # (B,Ns,32)
    bin_id = jnp.sum(
        in_bin.astype(jnp.int32)
        * jnp.arange(lo.shape[0], dtype=jnp.int32),
        axis=-1,
    )
    prior = jnp.asarray(scale_prior_weights())
    return prior[bin_id]


def generate_reweight_mask(label_all, width_all):
    """Per-seed scale-prior weight (loss.py:29-41).

    label_all/width_all (B,Ns,V,A,D); the target width is the width at the
    globally best (argmax over V*A*D) label per seed, binned into the 32
    scale intervals with strict inequalities (out-of-range -> bin 0).
    Returns (B,Ns) float32.
    """
    b, ns = label_all.shape[:2]
    flat_lab = label_all.reshape(b, ns, -1)
    flat_wid = width_all.reshape(b, ns, -1)
    inds = jnp.argmax(flat_lab, axis=2, keepdims=True)
    target_w = jnp.take_along_axis(flat_wid, inds, axis=2).squeeze(2)  # (B,Ns)
    return reweight_from_target_width(target_w)


def _graspable_label(per_view, seed_objectness):
    """'Robust' graspable label (loss.py:62-65): positive iff the seed lies
    on an object AND more than 10 views have a label above THRESH_BAD.
    per_view (B,Ns,V) = max over (A,D) of the rescaled label
    (= batch_grasp_view_label)."""
    cnt = jnp.sum(per_view > THRESH_BAD, axis=-1)  # (B,Ns)
    return (cnt > 10).astype(jnp.int32) * seed_objectness


def compute_robust_graspable_loss(objectness_score, per_view, seed_objectness):
    """CE objectness loss + acc/prec/recall metrics (loss.py:54-75).

    objectness_score (B,Ns,2); per_view (B,Ns,V) per-view max of the
    rescaled label; seed_objectness (B,Ns) int.
    """
    graspable = _graspable_label(per_view, seed_objectness)
    ce = _softmax_ce(objectness_score, graspable)
    loss = jnp.mean(ce)
    pred = jnp.argmax(objectness_score, axis=-1)
    correct = (pred == graspable).astype(jnp.float32)
    metrics = {
        "loss/stage1_graspable_loss": loss,
        "stage1_graspable_acc": jnp.mean(correct),
        "stage1_graspable_prec": _masked_mean(correct, pred == 1),
        "stage1_graspable_recall": _masked_mean(correct, graspable == 1),
    }
    return loss, graspable, metrics


def compute_weighted_view_loss(view_score, view_label, graspable, weight_mask):
    """Masked+reweighted MSE over the 300 view scores (loss.py:78-112)."""
    objectness_mask = (graspable > 0)[..., None]  # (B,Ns,1)
    loss_mask = objectness_mask.astype(jnp.float32) * weight_mask[..., None]
    sq = jnp.square(view_score - view_label)
    # the reference repeats the per-seed mask over all V view channels
    # (loss.py:99-101) before the masked mean, so the denominator carries a
    # factor of V relative to the per-seed mask sum
    v = view_score.shape[-1]
    loss = jnp.sum(sq * loss_mask) / (jnp.sum(loss_mask) * v + 1e-6)
    pos_count = jnp.sum(
        jnp.logical_and(view_score >= THRESH_GOOD, objectness_mask)
    )
    metrics = {
        "loss/stage1_view_loss": loss,
        "stage1_pos_view_pred_count": pos_count,
    }
    return loss, metrics


def compute_weighted_grasp_loss(preds, matched, seed_objectness, weight_mask):
    """Stage-2 losses at the predicted top view (loss.py:114-179).

    preds: dict with grasp_{score,angle_cls,width,tolerance}_pred (B,Ns,A,D).
    matched: top-view labels from match_grasp_view_and_label.
    """
    label = matched["batch_grasp_label"]  # (B,Ns,A,D)
    widths = matched["batch_grasp_width"]
    tol = matched["batch_grasp_tolerance"]
    a = label.shape[2]

    target_inds = jnp.argmax(label, axis=2, keepdims=True)  # (B,Ns,1,D)
    target_labels = jnp.take_along_axis(label, target_inds, axis=2).squeeze(2)
    target_widths = jnp.take_along_axis(widths, target_inds, axis=2).squeeze(2)
    target_tol = jnp.take_along_axis(tol, target_inds, axis=2).squeeze(2)
    target_cls = target_inds.squeeze(2)  # (B,Ns,D)

    graspable_mask = target_labels > THRESH_BAD  # (B,Ns,D)
    obj_mask = (seed_objectness > 0)[..., None]  # (B,Ns,1)
    loss_mask = (
        jnp.logical_and(obj_mask, graspable_mask).astype(jnp.float32)
        * weight_mask[..., None]
    )
    depth_loss_mask = jnp.broadcast_to(
        jnp.max(loss_mask, axis=2, keepdims=True), loss_mask.shape
    )

    def at_target(pred):
        return jnp.take_along_axis(pred, target_inds, axis=2).squeeze(2)

    # 1. grasp score (huber on the raw rescaled score)
    score_loss_el = huber_loss(at_target(preds["grasp_score_pred"]) - target_labels)
    score_loss = jnp.sum(score_loss_el * depth_loss_mask) / (
        jnp.sum(depth_loss_mask) + 1e-6
    )

    # 2. in-plane angle classification
    angle_logits = preds["grasp_angle_cls_pred"]  # (B,Ns,A,D)
    ce = _softmax_ce(angle_logits, target_cls, axis=2)  # (B,Ns,D)
    angle_loss = jnp.sum(ce * loss_mask) / (jnp.sum(loss_mask) + 1e-6)
    angle_pred = jnp.argmax(angle_logits, axis=2)
    diff = jnp.abs(angle_pred - target_cls)
    lm_bool = loss_mask > 0
    acc0 = _masked_mean((angle_pred == target_cls).astype(jnp.float32), lm_bool)
    acc15 = _masked_mean(
        jnp.logical_or(diff <= 1, diff >= a - 1).astype(jnp.float32), lm_bool
    )
    acc30 = _masked_mean(
        jnp.logical_or(diff <= 2, diff >= a - 2).astype(jnp.float32), lm_bool
    )

    # 3. width regression (normalized by GRASP_MAX_WIDTH)
    width_el = huber_loss(
        (at_target(preds["grasp_width_pred"]) - target_widths) / GRASP_MAX_WIDTH
    )
    width_loss = jnp.sum(width_el * loss_mask) / (jnp.sum(loss_mask) + 1e-6)

    # 4. tolerance regression (normalized by GRASP_MAX_TOLERANCE)
    tol_el = huber_loss(
        (at_target(preds["grasp_tolerance_pred"]) - target_tol)
        / GRASP_MAX_TOLERANCE
    )
    tol_loss = jnp.sum(tol_el * loss_mask) / (jnp.sum(loss_mask) + 1e-6)

    grasp_loss = score_loss + angle_loss + width_loss + tol_loss
    metrics = {
        "loss/stage2_grasp_score_loss": score_loss,
        "loss/stage2_grasp_angle_class_loss": angle_loss,
        "loss/stage2_grasp_width_loss": width_loss,
        "loss/stage2_grasp_tolerance_loss": tol_loss,
        "stage2_grasp_angle_class_acc/0_degree": acc0,
        "stage2_grasp_angle_class_acc/15_degree": acc15,
        "stage2_grasp_angle_class_acc/30_degree": acc30,
    }
    return grasp_loss, metrics


def get_loss(end_points: dict) -> tuple[jnp.ndarray, dict]:
    """Total multi-task loss (loss.py:44-51).

    Requires in end_points: objectness_score, view_score, grasp_*_pred,
    batch_grasp_* (either *_all tensors from the full label impl, or
    batch_grasp_target_width from the reduced impl — same values either
    way), objectness_label (B,N), fp2_inds (B,Ns).
    """
    seed_objectness = jnp.take_along_axis(
        end_points["objectness_label"].astype(jnp.int32),
        end_points["fp2_inds"].astype(jnp.int32),
        axis=1,
    )  # (B,Ns)

    if "batch_grasp_target_width" in end_points:
        weight_mask = reweight_from_target_width(
            end_points["batch_grasp_target_width"]
        )
    else:
        weight_mask = generate_reweight_mask(
            end_points["batch_grasp_label_all"],
            end_points["batch_grasp_width_all"],
        )
    # per-view max of the rescaled label == batch_grasp_view_label exactly
    # (max over one view's (A,D) elements commutes with the view gather)
    per_view = end_points["batch_grasp_view_label"]

    objectness_loss, graspable, m1 = compute_robust_graspable_loss(
        end_points["objectness_score"], per_view, seed_objectness
    )
    view_loss, m2 = compute_weighted_view_loss(
        end_points["view_score"],
        end_points["batch_grasp_view_label"],
        graspable,
        weight_mask,
    )
    grasp_loss, m3 = compute_weighted_grasp_loss(
        end_points, end_points, seed_objectness, weight_mask
    )
    loss = objectness_loss + view_loss + 0.2 * grasp_loss
    metrics = {"loss/overall_loss": loss, **m1, **m2, **m3}
    return loss, metrics
