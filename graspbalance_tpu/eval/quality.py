"""Closed-loop grasp quality evaluation on synthetic analytic scenes.

The reference delegates its only quality measurement to graspnetAPI AP on
the real dataset (/root/reference/README.md:299-304) — unavailable in this
environment. This module chains what the repo already has into the same
kind of end-to-end judgment: model forward -> pred_decode -> grasp NMS ->
collision filter, then every surviving grasp is scored against the analytic
labeling rule (labels/analytic.py) that generated the training targets.
A trained model must score far above an untrained one — asserted at tiny
scale in tests/test_quality.py and measured at production scale by
tools/quality_gate.py (reported in benchmarks/run_all.py).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from graspbalance_tpu.data.synthetic import SceneConfig, make_batch
from graspbalance_tpu.labels.analytic import (
    analytic_average_precision,
    analytic_grasp_quality,
)


def evaluate_quality(
    model,
    variables,
    scene_cfg: SceneConfig,
    num_batches: int = 4,
    batch_size: int = 2,
    seed0: int = 10_000,
    collision_thresh: float = 0.05,
) -> dict:
    """Run the full inference pipeline over held-out synthetic scenes and
    score survivors against the analytic rule.

    seed0 should not overlap the training stream's seeds so the scenes are
    held out. Returns aggregate metrics: quality_mean / good_frac /
    on_object_frac weighted by each batch's survivor count, plus
    kept_per_scene.
    """
    from graspbalance_tpu.eval.pipeline import GraspInference

    infer = GraspInference(
        model, variables, collision_thresh=collision_thresh
    )
    scene_cfg = dataclasses.replace(
        scene_cfg, analytic_labels=True, emit_label_tensors=False
    )

    totals = {"quality_mean": 0.0, "good_frac": 0.0, "on_object_frac": 0.0}
    kept_total = 0.0
    scenes_total = 0
    ap_sum = 0.0
    import jax.numpy as jnp

    for i in range(num_batches):
        batch = make_batch(seed0 + i, batch_size, scene_cfg)
        grasps, keep = infer(jnp.asarray(batch["point_clouds"]))
        centers = batch["object_poses"][:, :, :, 3]
        m = analytic_grasp_quality(
            grasps,
            keep,
            centers,
            batch["obj_sizes"],
            batch["obj_mask"],
            num_depths=scene_cfg.num_depths,
        )
        for k in totals:
            totals[k] += m[k] * m["kept"]
        kept_total += m["kept"]
        # graspnetAPI-style AP: per-scene top-50 by predicted score,
        # success = analytic quality over a threshold sweep
        ap_sum += analytic_average_precision(
            grasps, keep, centers, batch["obj_sizes"], batch["obj_mask"],
            num_depths=scene_cfg.num_depths,
        ) * batch_size
        scenes_total += batch_size

    denom = max(kept_total, 1.0)
    out = {k: v / denom for k, v in totals.items()}
    out["kept_per_scene"] = kept_total / max(scenes_total, 1)
    out["ap_analytic"] = ap_sum / max(scenes_total, 1)
    return out
