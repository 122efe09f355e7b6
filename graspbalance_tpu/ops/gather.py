"""Gather/group ops (channels-last).

The reference's gather_points / group_points CUDA kernels with their
atomicAdd backward passes (sampling_gpu.cu:13-62, group_points_gpu.cu:17-101)
reduce to plain XLA gathers here; JAX autodiff produces the deterministic
scatter-add backward for free (vs the reference's nondeterministic atomics).

Layout note: this framework is channels-LAST everywhere — points (B, N, C) —
so the feature axis sits on TPU lanes; the reference is channels-first.
"""

from __future__ import annotations

import jax.numpy as jnp


def gather_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """points (B, N, C), idx (B, M) int -> (B, M, C)."""
    return jnp.take_along_axis(points, idx[..., None].astype(jnp.int32), axis=1)


def group_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """points (B, N, C), idx (B, M, K) int -> (B, M, K, C)."""
    b, n, c = points.shape
    _, m, k = idx.shape
    flat = jnp.take_along_axis(
        points, idx.reshape(b, m * k, 1).astype(jnp.int32), axis=1
    )
    return flat.reshape(b, m, k, c)
