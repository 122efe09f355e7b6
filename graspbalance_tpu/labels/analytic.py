"""Analytic synthetic grasp labels + the closed-loop quality metric.

The reference delegates its only quality signal to graspnetAPI AP on the
real GraspNet-1B dataset (/root/reference/README.md:299-304) — unavailable
here. This module makes the quality axis runnable in-repo: synthetic scenes
get labels that are a *deterministic analytic function of scene geometry*,
so (a) the full training pipeline (label matching -> multi-task loss) has a
genuinely learnable target, and (b) a decoded grasp can be scored directly
against the same rule from its pose alone, with no label tensors at eval.

The rule (single source of truth, shared by the (P, V, A, D) label-tensor
expansion and the per-grasp scorer):

  align(view)    = clip(approach_z, 0, 1)   approach = -view; the camera
                   looks down at the table (+z toward the table plane), so
                   grasps approaching from above score best
  friction u     = clip(1.2 * exp(-2*align + 0.3*sin^2(angle)
                        + 0.1*depth_idx/(D-1)), 1e-4, 1.2)  lower = better,
                   matching the raw GraspNet friction convention that
                   label_gen log-rescales (label_generation.py:110-115);
                   the exponential form makes the rescaled per-view score
                   exactly gain*align, so >10 template views clear
                   THRESH_BAD at every view count (the _graspable_label
                   gate — see ALIGN_GAIN below)
  width          = sum_i |closing_axis_i| * obj_size_i + 0.005   the box
                   extent along the gripper closing axis plus margin
  graspable      = (align > ALIGN_MIN) & (width <= GRASP_MAX_WIDTH)
  label          = u where graspable else 0
  tolerance      = GRASP_MAX_TOLERANCE * align

Learnable signals: objectness (table vs object), view scores (alignment is
view-geometry only), angle scores (sin^2 term), width regression (object
size along the closing axis), tolerance regression (alignment again — and
decode multiplies score by tolerance/0.05, reinforcing aligned views).

Every function takes `xp` (numpy or jax.numpy): the host data generator
(data/synthetic.py) materializes tensors with numpy; the training step
expands them on device with jnp from just (obj_sizes, grasp_pt_obj) so
synthetic training never uploads the 3 x (P,V,A,D) tensors. Parity between
the two backends is asserted in tests/test_quality.py.
"""

from __future__ import annotations

import numpy as np

from graspbalance_tpu.labels.geometry import (
    GRASP_MAX_TOLERANCE,
    GRASP_MAX_WIDTH,
    generate_grasp_views_np,
)

WIDTH_MARGIN = 0.005  # gripper opening margin over the object extent
ON_OBJECT_DIST = 0.02  # max distance from a grasp center to its object box
ALIGN_GAIN = 2.0  # friction falls as exp(-gain*align): after the
# log(u_max/u) rescale (label_generation.py:110-115) the per-view score is
# gain*align, so views with align > THRESH_BAD/gain = 0.05 clear the
# >10-views-above-THRESH_BAD graspability gate (labels/losses.py
# _graspable_label) — 11 of 24 template views at the tiny test scale and
# 142 of 300 at production. Two calibration failures shaped this number
# (round-4): a shallower rule (1.25 - align) left only ~10/24 views above
# THRESH_BAD and the model CORRECTLY learned every seed as non-graspable;
# gain=8 passed the gate but inflated the view-MSE targets to ~7.7 (the
# reference's real labels stay under ~2.5) and the view loss drowned the
# graspable CE in the shared trunk. gain=2 keeps targets in [0, 1.92].
ANGLE_PENALTY = 0.3  # friction exponent penalty at sin^2(angle)=1
DEPTH_PENALTY = 0.1  # friction exponent penalty at the deepest bin
U_MAX = 1.2  # friction at align=0 (the raw GraspNet friction ceiling)
ALIGN_MIN = 0.03  # minimum alignment to be graspable. Deliberately below
# (ANGLE_PENALTY + DEPTH_PENALTY)/ALIGN_GAIN = 0.2: graspable entries with
# align in (0.03, 0.2] saturate the u clip at exactly U_MAX at their worst
# (angle, depth) cell (both view grids contain such views: align 0.0417 and
# 0.125 at V=24, many at V=300), so the batch-global u_max of the
# log-rescale is U_MAX exactly and the rescaled per-view score is
# gain*align with no batch-dependent shift — otherwise u_max floats with
# the worst graspable view present and the shifted scores break the
# >10-views gate at V=24.


def _friction(align, sin2, depth_frac, xp):
    """The analytic friction rule (lower = better); inputs broadcast."""
    return xp.clip(
        U_MAX
        * xp.exp(
            -ALIGN_GAIN * align
            + ANGLE_PENALTY * sin2
            + DEPTH_PENALTY * depth_frac
        ),
        1e-4,
        U_MAX,
    )


def _frame_axes(towards, xp):
    """Grasp-frame axes from the approach direction, exactly the
    batch_viewpoint_params_to_matrix construction (labels/geometry.py:43):
    ax = normalize(towards); ay = normalize([-ax_y, ax_x, 0]) (fallback +y
    when vertical); az = ax x ay. towards (..., 3) -> (ax, ay, az)."""
    ax = towards
    zeros = xp.zeros_like(ax[..., 0])
    ay = xp.stack([-ax[..., 1], ax[..., 0], zeros], axis=-1)
    norm_ay = xp.sqrt(xp.sum(ay * ay, axis=-1, keepdims=True))
    fallback = xp.broadcast_to(
        xp.asarray([0.0, 1.0, 0.0], dtype=ax.dtype), ay.shape
    )
    ay = xp.where(norm_ay == 0, fallback, ay / xp.maximum(norm_ay, 1e-12))
    ax = ax / xp.sqrt(xp.sum(ax * ax, axis=-1, keepdims=True))
    az = xp.cross(ax, ay)
    return ax, ay, az


def _view_grids(num_views: int, num_angles: int, num_depths: int, xp):
    """Per-(view, angle, depth) geometry shared by both label directions:
    returns (align (V,), closing (V, A, 3), u (V, A, D))."""
    views = xp.asarray(generate_grasp_views_np(num_views))  # (V, 3)
    towards = -views
    align = xp.clip(towards[:, 2], 0.0, 1.0)  # (V,)
    _, ay, az = _frame_axes(towards, xp)  # (V, 3) each
    angles = (
        xp.arange(num_angles, dtype=xp.float32) / num_angles * xp.pi
    )  # (A,) — the grid decode inverts (models/decode.py:41)
    cos_t = xp.cos(angles)[None, :, None]
    sin_t = xp.sin(angles)[None, :, None]
    closing = cos_t * ay[:, None, :] + sin_t * az[:, None, :]  # (V, A, 3)
    depth_frac = xp.arange(num_depths, dtype=xp.float32) / max(
        num_depths - 1, 1
    )
    u = _friction(
        align[:, None, None],
        xp.sin(angles)[None, :, None] ** 2,
        depth_frac[None, None, :],
        xp,
    )  # (V, A, D)
    return align, closing, u


def analytic_label_tensors(
    obj_sizes,
    grasp_pt_obj,
    grasp_pt_mask,
    num_views: int,
    num_angles: int,
    num_depths: int,
    xp=np,
):
    """Expand the analytic rule into the padded (P, V, A, D) label tensors
    of the collate contract (data/dataset.py). Per-sample (unbatched).

    obj_sizes (O, 3) box extents per object slot; grasp_pt_obj (P,) owning
    slot; grasp_pt_mask (P,) valid slots. Returns (labels, widths,
    tolerance) each (P, V, A, D) float32.
    """
    align, closing, u = _view_grids(num_views, num_angles, num_depths, xp)
    sizes_p = xp.take(obj_sizes, grasp_pt_obj.astype(xp.int32), axis=0)
    # box extent along the closing axis: sum_i |c_i| * size_i. HIGHEST
    # precision on the jnp path: the default-precision dot drifts ~4e-4 from
    # numpy, enough to flip the width<=GRASP_MAX_WIDTH graspability boundary
    # between the host-emitted and device-expanded tensors.
    if xp is np:
        req = np.einsum("vai,pi->pva", np.abs(closing), sizes_p)
    else:
        import jax

        req = xp.einsum(
            "vai,pi->pva", xp.abs(closing), sizes_p,
            precision=jax.lax.Precision.HIGHEST,
        )
    req = req + WIDTH_MARGIN  # (P, V, A)
    widths = xp.broadcast_to(
        req[..., None].astype(xp.float32),
        req.shape + (num_depths,),
    )
    graspable = xp.logical_and(
        align[None, :, None] > ALIGN_MIN, req <= GRASP_MAX_WIDTH
    )  # (P, V, A)
    graspable = xp.logical_and(graspable, grasp_pt_mask[:, None, None])
    labels = xp.where(
        graspable[..., None], u[None].astype(xp.float32), 0.0
    ).astype(xp.float32)
    tolerance = xp.broadcast_to(
        (GRASP_MAX_TOLERANCE * align).astype(xp.float32)[
            None, :, None, None
        ],
        labels.shape,
    )
    return labels, widths, tolerance


def expand_batch_labels(batch: dict, num_views: int, num_angles: int,
                        num_depths: int) -> dict:
    """Device-side (jnp) batched expansion for the training step: returns
    `batch` plus the grasp_labels/grasp_widths/grasp_tolerance tensors
    computed from the small geometry arrays (obj_sizes (B, O, 3),
    grasp_pt_obj (B, P), grasp_pt_mask (B, P)). The host then never builds
    or uploads the 3 x (B, P, V, A, D) tensors (~1.4 GB at bs=2 production
    shape); on device they are a broadcast-heavy element of the fused label
    pipeline."""
    import jax
    import jax.numpy as jnp

    def one(sizes, pt_obj, pt_mask):
        return analytic_label_tensors(
            sizes, pt_obj, pt_mask, num_views, num_angles, num_depths, xp=jnp
        )

    labels, widths, tolerance = jax.vmap(one)(
        batch["obj_sizes"], batch["grasp_pt_obj"], batch["grasp_pt_mask"]
    )
    out = dict(batch)
    out["grasp_labels"] = labels
    out["grasp_widths"] = widths
    out["grasp_tolerance"] = tolerance
    return out


def analytic_grasp_quality(
    grasps,
    keep,
    obj_centers,
    obj_sizes,
    obj_mask,
    num_depths: int = 4,
    xp=np,
):
    """Score decoded grasps against the analytic rule — the closed-loop
    quality metric (trained model's surviving grasps must score far above an
    untrained model's; asserted in tests/test_quality.py, reported by
    tools/quality_gate.py).

    grasps (..., G, 17) decode rows (models/decode.py column layout), keep
    (..., G) bool survivor mask (NMS + collision), obj_centers/obj_sizes
    (..., O, 3), obj_mask (..., O) valid slots. Returns a dict of scalars:
    quality_mean (mean analytic quality of survivors, 0..1), good_frac
    (fraction of survivors with quality > 0.3), on_object_frac, kept.
    """
    rot = grasps[..., 4:13].reshape(grasps.shape[:-1] + (3, 3))
    approach = rot[..., :, 0]  # x column
    closing = rot[..., :, 1]  # y column
    center = grasps[..., 13:16]
    width = grasps[..., 1]
    depth = grasps[..., 3]

    # distance from the grasp center to each object's box surface
    disp = xp.abs(center[..., :, None, :] - obj_centers[..., None, :, :])
    excess = xp.maximum(disp - obj_sizes[..., None, :, :] / 2.0, 0.0)
    dist = xp.sqrt(xp.sum(excess * excess, axis=-1))  # (..., G, O)
    big = xp.asarray(1e9, dtype=dist.dtype)
    dist = xp.where(obj_mask[..., None, :], dist, big)
    iobj = xp.argmin(dist, axis=-1)  # (..., G)
    dmin = xp.min(dist, axis=-1)
    on_object = dmin <= ON_OBJECT_DIST

    nearest_size = xp.take_along_axis(
        obj_sizes, iobj[..., None], axis=-2
    )  # (..., G, 3)

    align = xp.clip(approach[..., 2], 0.0, 1.0)
    # sin^2(angle) from geometry: az0 is the angle-0 vertical axis of the
    # approach frame; closing = cos*ay0 + sin*az0 (both unit, orthogonal)
    _, _, az0 = _frame_axes(approach, xp)
    sin2 = xp.sum(closing * az0, axis=-1) ** 2
    d_idx = xp.clip(xp.round(depth / 0.01) - 1.0, 0, num_depths - 1)
    u = _friction(align, sin2, d_idx / max(num_depths - 1, 1), xp)
    req = (
        xp.sum(xp.abs(closing) * nearest_size, axis=-1) + WIDTH_MARGIN
    )
    ok = (
        on_object
        & (align > ALIGN_MIN)
        & (req <= GRASP_MAX_WIDTH)
        & (width >= 0.9 * req)
    )
    # quality = the log-rescaled score normalized by the alignment gain:
    # ~align for an on-object, wide-enough, axis-aligned grasp; 1.0 perfect
    quality = xp.where(
        ok, xp.clip(xp.log(U_MAX / u) / ALIGN_GAIN, 0.0, 1.0), 0.0
    )

    keep_f = keep.astype(xp.float32)
    kept = xp.sum(keep_f)
    denom = xp.maximum(kept, 1.0)
    return {
        "quality_mean": float(xp.sum(quality * keep_f) / denom),
        "good_frac": float(
            xp.sum((quality > 0.3).astype(xp.float32) * keep_f) / denom
        ),
        "on_object_frac": float(
            xp.sum(on_object.astype(xp.float32) * keep_f) / denom
        ),
        "kept": float(kept),
    }


AP_TOP_K = 50  # graspnetAPI ranks the top 50 grasps per scene
AP_QUALITY_THRESHOLDS = (0.2, 0.4, 0.6, 0.8)  # analytic analogs of the
# friction-coefficient sweep graspnetAPI averages AP over


def analytic_average_precision(
    grasps, keep, obj_centers, obj_sizes, obj_mask, num_depths: int = 4
) -> float:
    """graspnetAPI-style AP under the analytic rule (numpy, per batch).

    Mirrors the structure of the reference's delegated metric
    (graspnetAPI GraspNetEval: per scene, rank the surviving grasps by
    predicted score, truncate to the top 50, call each a success if it
    beats a quality bar, AP = mean of Precision@k for k=1..50 — absent
    grasps count as failures — then average over the bar sweep). Here the
    success bar is the ANALYTIC quality (labels/analytic.py rule) at
    thresholds AP_QUALITY_THRESHOLDS instead of friction-label lookups.

    grasps (B, G, 17), keep (B, G); scene geometry as in
    analytic_grasp_quality. Returns the scalar AP in [0, 1].
    """
    b = grasps.shape[0]
    ap_sum = 0.0
    for i in range(b):
        rows = grasps[i][keep[i]]
        q = np.zeros((0,), np.float32)
        if rows.shape[0]:
            q = _per_grasp_quality(
                rows, obj_centers[i], obj_sizes[i], obj_mask[i], num_depths
            )
            order = np.argsort(-rows[:, 0], kind="stable")  # decode score
            q = q[order][:AP_TOP_K]
        scene_ap = 0.0
        for t in AP_QUALITY_THRESHOLDS:
            success = (q >= t).astype(np.float64)
            padded = np.zeros(AP_TOP_K)
            padded[: success.shape[0]] = success
            prec_at_k = np.cumsum(padded) / (np.arange(AP_TOP_K) + 1)
            scene_ap += float(prec_at_k.mean())
        ap_sum += scene_ap / len(AP_QUALITY_THRESHOLDS)
    return ap_sum / max(b, 1)


def _per_grasp_quality(rows, centers, sizes, mask, num_depths):
    """(G, 17) decode rows -> (G,) analytic qualities (numpy)."""
    rot = rows[:, 4:13].reshape(-1, 3, 3)
    approach = rot[:, :, 0]
    closing = rot[:, :, 1]
    center = rows[:, 13:16]
    width = rows[:, 1]
    depth = rows[:, 3]
    disp = np.abs(center[:, None, :] - centers[None, :, :])
    excess = np.maximum(disp - sizes[None, :, :] / 2.0, 0.0)
    dist = np.sqrt((excess ** 2).sum(-1))
    dist = np.where(mask[None, :], dist, 1e9)
    iobj = dist.argmin(-1)
    on_object = dist.min(-1) <= ON_OBJECT_DIST
    nearest_size = sizes[iobj]
    align = np.clip(approach[:, 2], 0.0, 1.0)
    _, _, az0 = _frame_axes(approach, np)
    sin2 = (closing * az0).sum(-1) ** 2
    d_idx = np.clip(np.round(depth / 0.01) - 1.0, 0, num_depths - 1)
    u = _friction(align, sin2, d_idx / max(num_depths - 1, 1), np)
    req = (np.abs(closing) * nearest_size).sum(-1) + WIDTH_MARGIN
    ok = (
        on_object & (align > ALIGN_MIN) & (req <= GRASP_MAX_WIDTH)
        & (width >= 0.9 * req)
    )
    return np.where(
        ok, np.clip(np.log(U_MAX / u) / ALIGN_GAIN, 0.0, 1.0), 0.0
    ).astype(np.float32)
