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

    # Greedy suppression solves keep[i] = valid[i] & ~any_{j<i}(C[j,i] &
    # keep[j]) — a strictly lower-triangular recurrence. Jacobi-iterate it
    # to the fixpoint: after t sweeps every grasp whose suppression-chain
    # depth is <= t is final, so the first no-change sweep IS the exact
    # greedy solution (induction over score rank). Each sweep is one
    # (G, G) matvec on the MXU; typical scenes converge in < 10 sweeps —
    # vs the former G-step scalar fori_loop whose 1024 tiny
    # dynamic-update-slices dominated the e2e post-processing profile.
    ii = jnp.arange(g)
    lower = conflict_o & (ii[:, None] < ii[None, :])  # C[j, i] for j < i
    lower16 = lower.astype(jnp.bfloat16)

    def cond(state):
        k, prev, it = state
        return jnp.logical_and(jnp.any(k != prev), it < g)

    def step(state):
        k, _, it = state
        hit = (
            jnp.einsum(
                "ji,j->i", lower16, k.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            > 0.5
        )
        return valid_o & ~hit, k, it + 1

    k0 = valid_o
    k1, _, _ = step((k0, jnp.zeros_like(k0), 0))
    keep_o, _, _ = lax.while_loop(cond, step, (k1, k0, 1))
    # scatter back to original order
    keep = jnp.zeros((g,), bool).at[order].set(keep_o)
    return keep
