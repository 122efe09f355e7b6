"""Grasp view geometry (loss_utils.py:11-49 equivalents, jnp).

Constants below are the gripper/label constants from loss_utils.py:6-9.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

GRASP_MAX_WIDTH = 0.1
GRASP_MAX_TOLERANCE = 0.05
THRESH_GOOD = 0.7
THRESH_BAD = 0.1

NUM_VIEWS = 300
NUM_ANGLES = 12
NUM_DEPTHS = 4


@functools.lru_cache(maxsize=None)
def generate_grasp_views_np(n: int = NUM_VIEWS) -> np.ndarray:
    """Fibonacci-sphere template view directions (loss_utils.py:23-31).

    zi = (2i+1)/N - 1; azimuth = 2*pi*i*phi with phi the golden ratio
    conjugate. Returns (n, 3) float32 unit vectors.
    """
    phi = (np.sqrt(5.0) - 1.0) / 2.0
    i = np.arange(n, dtype=np.float64)
    zi = (2.0 * i + 1.0) / n - 1.0
    r = np.sqrt(1.0 - zi * zi)
    xi = r * np.cos(2.0 * np.pi * i * phi)
    yi = r * np.sin(2.0 * np.pi * i * phi)
    return np.stack([xi, yi, zi], axis=-1).astype(np.float32)


def generate_grasp_views(n: int = NUM_VIEWS) -> jnp.ndarray:
    return jnp.asarray(generate_grasp_views_np(n))


def batch_viewpoint_params_to_matrix(towards: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Approach direction + in-plane angle -> rotation matrix.

    Mirrors loss_utils.py:33-49: x-axis = normalized `towards`; y-axis from
    the horizontal perpendicular (fallback +y when towards is vertical);
    z = x × y; then an in-plane rotation about x by `angle`.

    Args: towards (..., 3); angle (...,). Returns (..., 3, 3).
    """
    ax = towards
    zeros = jnp.zeros_like(ax[..., 0])
    ay = jnp.stack([-ax[..., 1], ax[..., 0], zeros], axis=-1)
    degenerate = jnp.linalg.norm(ay, axis=-1, keepdims=True) == 0
    fallback = jnp.broadcast_to(
        jnp.asarray([0.0, 1.0, 0.0], ax.dtype), ay.shape
    )
    ay = jnp.where(degenerate, fallback, ay)
    ax = ax / jnp.linalg.norm(ax, axis=-1, keepdims=True)
    ay = ay / jnp.linalg.norm(ay, axis=-1, keepdims=True)
    az = jnp.cross(ax, ay)
    sin, cos = jnp.sin(angle), jnp.cos(angle)
    ones = jnp.ones_like(cos)
    r1 = jnp.stack(
        [ones, zeros, zeros, zeros, cos, -sin, zeros, sin, cos], axis=-1
    ).reshape(angle.shape + (3, 3))
    r2 = jnp.stack([ax, ay, az], axis=-1)  # columns
    return r2 @ r1


def transform_point_cloud(cloud: jnp.ndarray, transform: jnp.ndarray) -> jnp.ndarray:
    """Apply a (3,3), (3,4) or (4,4) transform to (..., N, 3) points
    (loss_utils.py:11-21)."""
    rot = transform[..., :3, :3]
    out = jnp.einsum("...ij,...nj->...ni", rot, cloud)
    if transform.shape[-1] >= 4:
        out = out + transform[..., :3, 3][..., None, :]
    return out
