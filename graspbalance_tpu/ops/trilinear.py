"""Trilinear volumetric feature sampling.

Equivalent of the reference's TrilinearIntepolation module
(interpolation.py:6-62, unused by the live model): sample a dense feature
volume at continuous 3D points with trilinear weights. Fixed-shape gathers.
"""

from __future__ import annotations

import jax.numpy as jnp


def trilinear_sample(volume: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """volume (B, X, Y, Z, C); points (B, N, 3) in [0,1]^3 normalized
    coordinates -> (B, N, C)."""
    b, x, y, z, c = volume.shape
    dims = jnp.asarray([x - 1, y - 1, z - 1], jnp.float32)
    p = jnp.clip(points, 0.0, 1.0) * dims
    p0 = jnp.floor(p)
    frac = p - p0
    p0 = p0.astype(jnp.int32)
    p1 = jnp.minimum(p0 + 1, dims.astype(jnp.int32))

    def gather(ix, iy, iz):
        flat = (ix * y + iy) * z + iz  # (B, N)
        vol = volume.reshape(b, x * y * z, c)
        return jnp.take_along_axis(vol, flat[..., None], axis=1)

    fx, fy, fz = frac[..., 0:1], frac[..., 1:2], frac[..., 2:3]
    out = (
        gather(p0[..., 0], p0[..., 1], p0[..., 2]) * (1 - fx) * (1 - fy) * (1 - fz)
        + gather(p1[..., 0], p0[..., 1], p0[..., 2]) * fx * (1 - fy) * (1 - fz)
        + gather(p0[..., 0], p1[..., 1], p0[..., 2]) * (1 - fx) * fy * (1 - fz)
        + gather(p0[..., 0], p0[..., 1], p1[..., 2]) * (1 - fx) * (1 - fy) * fz
        + gather(p1[..., 0], p1[..., 1], p0[..., 2]) * fx * fy * (1 - fz)
        + gather(p1[..., 0], p0[..., 1], p1[..., 2]) * fx * (1 - fy) * fz
        + gather(p0[..., 0], p1[..., 1], p1[..., 2]) * (1 - fx) * fy * fz
        + gather(p1[..., 0], p1[..., 1], p1[..., 2]) * fx * fy * fz
    )
    return out
