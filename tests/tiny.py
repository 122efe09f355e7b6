"""Shared tiny model/scene configuration for fast CPU tests."""

import dataclasses

from graspbalance_tpu.data.synthetic import SceneConfig

TINY_STAGES = (
    (64, 0.08, 8, (16, 16, 32), 1, 0.16, 8),
    (32, 0.20, 8, (16, 16, 32), 1, 0.40, 8),
    (16, 0.40, 4, (16, 16, 32), 1, 0.80, 4),
    (8, 0.60, 4, (16, 16, 32), 1, 1.20, 4),
)
TINY_NUM_SEED = 32
TINY_NUM_VIEW = 24

TINY_SCENE = SceneConfig(
    num_points=256,
    num_views=TINY_NUM_VIEW,
    max_objects=4,
    max_grasp_points=128,
    grasp_points_per_object=24,
    num_objects=3,
)

# Closed-loop quality-gate scene: analytic (learnable) labels expanded on
# device, compact clutter so FPS seeds actually sample the objects
# (labels/analytic.py, data/synthetic.py extent knobs).
TINY_QUALITY_SCENE = dataclasses.replace(
    TINY_SCENE,
    analytic_labels=True,
    emit_label_tensors=False,
    table_extent=0.12,
    object_scatter=0.08,
)
