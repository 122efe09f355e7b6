"""Synthetic grasp scenes with analytic labels.

Serves the role the reference left empty (SURVEY.md §4: no fixtures, no fake
backend): deterministic random scenes of box-ish objects on a table plane,
with padded label tensors in exactly the collate contract of the real
GraspNet loader. Used by tests (overfit/one-batch checks without the 200 GB
dataset) and by bench.py (steady-state input shapes identical to training).
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class SceneConfig:
    num_points: int = 20000
    num_views: int = 300
    num_angles: int = 12
    num_depths: int = 4
    max_objects: int = 12
    max_grasp_points: int = 4096
    grasp_points_per_object: int = 300
    num_objects: int = 8
    table_frac: float = 0.4
    # spatial extents (half-widths): the table plane spans +-table_extent
    # in x/y, object centers scatter over +-object_scatter. The quality
    # gate shrinks both (compact clutter): FPS seeds sample by spatial
    # coverage, so a large sparse table absorbs nearly all seeds and
    # starves the graspable-classification signal (measured 6% object
    # seeds at the defaults vs ~40% compact, round-4 calibration)
    table_extent: float = 0.3
    object_scatter: float = 0.25
    # share ONE base label tensor across all scenes/batches (zero-copy
    # broadcast views): scene geometry still varies; use for throughput and
    # smoke-training workloads where per-scene label variety is irrelevant
    static_labels: bool = False
    # analytic labels: scores/widths/tolerance are a deterministic function
    # of scene geometry (labels/analytic.py) instead of random tensors —
    # genuinely learnable, and decoded grasps can be scored against the
    # same rule (the closed-loop quality gate, tools/quality_gate.py)
    analytic_labels: bool = False
    # with analytic_labels, skip materializing the (P, V, A, D) tensors on
    # the host entirely: the training step expands them on device from the
    # small geometry arrays (cfg.data.analytic_labels=True)
    emit_label_tensors: bool = True


_BASE_LABELS: dict = {}
_BCAST_CACHE: dict = {}


def _base_label_tensors(vad: tuple) -> tuple:
    """Per-shape cached (labels, widths, tolerance) base tensors, drawn once
    from a fixed-seed generator (content is independent of scene rng)."""
    if vad not in _BASE_LABELS:
        rng = np.random.default_rng(0xC0FFEE)
        labels = np.zeros(vad, np.float32)
        graspable = rng.random(vad) < 0.5
        labels[graspable] = rng.uniform(0.1, 1.2, int(graspable.sum()))
        widths = rng.uniform(0.0, 0.12, vad).astype(np.float32)
        tolerance = rng.uniform(0.0, 0.05, vad).astype(np.float32)
        _BASE_LABELS[vad] = (labels, widths, tolerance)
    return _BASE_LABELS[vad]


def make_scene(rng: np.random.Generator, cfg: SceneConfig) -> dict:
    """One synthetic scene in the padded collate layout (unbatched)."""
    n_obj = cfg.num_objects
    n_table = int(cfg.num_points * cfg.table_frac)
    n_obj_pts = cfg.num_points - n_table

    # table plane at z ~ 0.5 (camera frame-ish depths)
    te = cfg.table_extent
    table = np.empty((n_table, 3), np.float32)
    table[:, 0] = rng.uniform(-te, te, n_table)
    table[:, 1] = rng.uniform(-te, te, n_table)
    table[:, 2] = 0.5 + rng.normal(0, 0.002, n_table)

    # objects: random boxes above the plane
    sizes = rng.uniform(0.02, 0.08, (n_obj, 3)).astype(np.float32)
    cz = rng.uniform(0.42, 0.48, n_obj)
    if cfg.analytic_labels:
        # rest each box ON the table with a small clearance: the legacy
        # z-draw ignores the box height, so boxes can poke through the
        # plane — a top-down grasp near the bottom then sweeps its fingers
        # through table points and the collision filter rejects every
        # grasp, which would starve the closed-loop quality gate
        cz = 0.5 - sizes[:, 2] / 2.0 - rng.uniform(0.002, 0.01, n_obj)
    oe = cfg.object_scatter
    centers = np.stack(
        [
            rng.uniform(-oe, oe, n_obj),
            rng.uniform(-oe, oe, n_obj),
            cz,
        ],
        axis=-1,
    ).astype(np.float32)

    per_obj = n_obj_pts // n_obj
    obj_points = []
    obj_ids = []
    for i in range(n_obj):
        p = (rng.random((per_obj, 3), dtype=np.float32) - 0.5) * sizes[i] + centers[i]
        obj_points.append(p)
        obj_ids.append(np.full(per_obj, i + 1, np.int32))
    rem = n_obj_pts - per_obj * n_obj
    if rem:
        obj_points.append(table[:rem])
        obj_ids.append(np.zeros(rem, np.int32))
    cloud = np.concatenate([table] + obj_points, axis=0)
    seg = np.concatenate([np.zeros(n_table, np.int32)] + obj_ids)
    perm = rng.permutation(cfg.num_points)
    cloud, seg = cloud[perm], seg[perm]

    # poses: identity rotation + object center translation (labels are in the
    # object frame => label points = sampled object surface - center)
    o_max = cfg.max_objects
    poses = np.zeros((o_max, 3, 4), np.float32)
    obj_mask = np.zeros(o_max, bool)
    for i in range(n_obj):
        poses[i, :, :3] = np.eye(3, dtype=np.float32)
        poses[i, :, 3] = centers[i]
        obj_mask[i] = True

    # label points: random surface-ish points per object (object frame)
    p_max = cfg.max_grasp_points
    gpts = np.zeros((p_max, 3), np.float32)
    gobj = np.zeros(p_max, np.int32)
    gmask = np.zeros(p_max, bool)
    k = cfg.grasp_points_per_object
    total = min(n_obj * k, p_max)
    for i in range(n_obj):
        lo, hi = i * k, min((i + 1) * k, p_max)
        if lo >= p_max:
            break
        cnt = hi - lo
        gpts[lo:hi] = (rng.random((cnt, 3), dtype=np.float32) - 0.5) * sizes[i]
        gobj[lo:hi] = i
        gmask[lo:hi] = True

    sizes_padded = np.zeros((o_max, 3), np.float32)
    sizes_padded[:n_obj] = sizes

    base = {
        "point_clouds": cloud,
        "objectness_label": (seg > 0).astype(np.int32),
        "instance_label": seg,
        "object_poses": poses,
        "obj_mask": obj_mask,
        "obj_sizes": sizes_padded,
        "grasp_points": gpts,
        "grasp_pt_obj": gobj,
        "grasp_pt_mask": gmask,
    }

    if cfg.analytic_labels:
        if cfg.emit_label_tensors:
            from graspbalance_tpu.labels.analytic import analytic_label_tensors

            labels, widths, tolerance = analytic_label_tensors(
                sizes_padded, gobj, gmask,
                cfg.num_views, cfg.num_angles, cfg.num_depths, xp=np,
            )
            base["grasp_labels"] = labels
            base["grasp_widths"] = widths
            base["grasp_tolerance"] = tolerance
        return base

    vad = (p_max, cfg.num_views, cfg.num_angles, cfg.num_depths)
    # The (P, V, A, D) label tensors are ~59M elements each at production
    # shape; drawing them independently per scene costs ~180M RNG draws
    # (~15 s/step on the 1-core host — it starved the prefetch thread and
    # made synthetic training data-bound, measured 2026-08-18). Instead a
    # base tensor per shape is drawn ONCE and each scene takes a cheap
    # random roll along the point axis: per-scene tensors stay
    # deterministic in `rng`, keep the same distributions (~half zero,
    # scores in (0.1, 1.2], widths/tolerance uniform), and decorrelate
    # across scenes enough for overfit/throughput workloads.
    base_l, base_w, base_t = _base_label_tensors(vad)
    if cfg.static_labels:
        # shared read-only views: no per-scene copy at all. Rows of invalid
        # grasp-point slots are never consumed (label_gen masks them out of
        # the nearest-point argmin), so skipping the gmask zeroing is safe.
        labels, widths, tolerance = base_l, base_w, base_t
        rng.integers(0, p_max, 3)  # keep the rng stream position identical
    else:
        shifts = rng.integers(0, p_max, 3)
        labels = np.roll(base_l, int(shifts[0]), axis=0)
        widths = np.roll(base_w, int(shifts[1]), axis=0)
        tolerance = np.roll(base_t, int(shifts[2]), axis=0)
        labels[~gmask] = 0.0

    base["grasp_labels"] = labels
    base["grasp_widths"] = widths
    base["grasp_tolerance"] = tolerance
    return base


def make_batch(seed: int, batch_size: int, cfg: SceneConfig | None = None) -> dict:
    cfg = cfg or SceneConfig()
    rng = np.random.default_rng(seed)
    scenes = [make_scene(rng, cfg) for _ in range(batch_size)]
    out = {}
    for k in scenes[0]:
        if cfg.static_labels and not cfg.analytic_labels and k in (
            "grasp_labels", "grasp_widths", "grasp_tolerance"
        ):
            # all scenes share the base tensor: broadcast a view instead of
            # np.stack-copying 3 x B x 236 MB (measured ~11 s/batch on the
            # 1-core host, 2026-08-18 — it made synthetic training
            # data-bound at 15 s/step vs the 146 ms device step). The view
            # is cached so every batch returns the SAME array object —
            # the train loop's transfer cache then uploads it only once.
            ck = (k, batch_size) + scenes[0][k].shape
            if ck not in _BCAST_CACHE:
                _BCAST_CACHE[ck] = np.broadcast_to(
                    scenes[0][k][None], (batch_size,) + scenes[0][k].shape
                )
            out[k] = _BCAST_CACHE[ck]
        else:
            out[k] = np.stack([s[k] for s in scenes])
    return out
