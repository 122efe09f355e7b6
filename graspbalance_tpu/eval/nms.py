"""Grasp pose NMS on device.

The reference delegates NMS to the external `grasp_nms` pip package
(README.md:77; the graspnetAPI GraspGroup.nms): greedy suppression in score
order, where two grasps conflict iff their translation distance is below
translation_thresh AND the rotation angle between them is below
rotation_thresh. Rebuilt here as a fixed-shape device program: one pairwise
conflict matrix + a sequential-greedy fori_loop (the loop is O(G) scalar
steps over precomputed vectors, so it pipelines fine on the scalar core).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


@functools.partial(jax.jit, static_argnames=())
def grasp_nms(
    grasps: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    *,
    translation_thresh: float = 0.03,
    rotation_thresh: float = 30.0 / 180.0 * jnp.pi,
) -> jnp.ndarray:
    """grasps (G, 17) decoded rows; valid optional (G,) bool.

    Returns keep mask (G,) bool (valid & not suppressed).
    """
    g = grasps.shape[0]
    scores = grasps[:, 0]
    trans = grasps[:, 13:16]
    rot = grasps[:, 4:13].reshape(g, 3, 3)

    if valid is None:
        valid = jnp.ones((g,), bool)
    scores = jnp.where(valid, scores, -jnp.inf)

    d2 = jnp.sum((trans[:, None, :] - trans[None, :, :]) ** 2, axis=-1)
    # angle between rotations: cos = (trace(R_i^T R_j) - 1) / 2
    tr = jnp.einsum("iab,jab->ij", rot, rot)
    cos = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    conflict = (d2 < translation_thresh**2) & (
        jnp.arccos(cos) < rotation_thresh
    )
    conflict &= valid[:, None] & valid[None, :]

    order = jnp.argsort(-scores)  # best first; invalid (-inf) last
    conflict_o = conflict[order][:, order]
    valid_o = valid[order]

    def body(i, state):
        keep, alive = state
        take = alive[i] & valid_o[i]
        keep = keep.at[i].set(take)
        alive = jnp.where(take, alive & ~conflict_o[i], alive)
        # a grasp never suppresses itself
        alive = alive.at[i].set(False)
        return keep, alive

    keep_o, _ = lax.fori_loop(
        0, g, body, (jnp.zeros((g,), bool), jnp.ones((g,), bool))
    )
    # scatter back to original order
    keep = jnp.zeros((g,), bool).at[order].set(keep_o)
    return keep
