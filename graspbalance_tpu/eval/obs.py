"""Object-balanced seed sampling (OBS) — the paper's balance mechanism.

Rebuild of ObjectBalanceSampling / ForegroundSampling
(TrainModel/modules.py:19-47, 178-221): at inference, instead of the
backbone's geometry-FPS seeds, re-seed with an equal budget per detected
object (1024 // num_objects seeds each, remainder to the last object) so
small objects get as many grasp candidates as large ones.

Fixed-shape version: per object slot, a masked FPS (vmapped across slots —
the sequential greedy loop is shared, the slot axis is parallel) produces up
to `fps_cap` candidates; the output is assembled by quota intervals computed
from the dynamic object count. Deviation: a single object can receive at
most fps_cap seeds (quota cycles beyond that); with >= 1024/fps_cap objects
the result is exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def masked_fps(xyz: jnp.ndarray, valid: jnp.ndarray, num_samples: int) -> jnp.ndarray:
    """Greedy FPS restricted to valid points. Seed = first valid index
    (matches the reference FPS seeding at index 0 of the gathered object
    points). xyz (N, 3), valid (N,) -> (num_samples,) int32."""
    n = xyz.shape[0]
    first = jnp.argmax(valid).astype(jnp.int32)

    def body(carry, _):
        dist, last = carry
        d = jnp.sum((xyz - xyz[last]) ** 2, axis=-1)
        dist = jnp.minimum(dist, d)
        cand = jnp.where(valid, dist, -1.0)
        nxt = jnp.argmax(cand).astype(jnp.int32)
        return (dist, nxt), nxt

    init = (jnp.full((n,), 1e10, jnp.float32), first)
    _, rest = lax.scan(body, init, None, length=num_samples - 1)
    return jnp.concatenate([first[None], rest])


@functools.partial(jax.jit, static_argnames=("num_seed", "fps_cap", "max_objects"))
def object_balance_indices(
    points: jnp.ndarray,
    seed_cluster: jnp.ndarray,
    *,
    num_seed: int = 1024,
    fps_cap: int = 512,
    max_objects: int = 16,
) -> jnp.ndarray:
    """Selection-only OBS: points (B, N, 3); seed_cluster (B, N) int instance
    ids (0 = background) -> obs_inds (B, num_seed) int32.

    The selection never reads features, so callers can defer feature
    interpolation to just the selected rows (the reference materializes
    up_sample_features for the whole cloud and then gathers 1024 of the
    20000 rows, modules.py:181-189 — same math, 20x the work)."""

    def single(pts, labels):
        slots = jnp.arange(1, max_objects + 1)
        masks = labels[None, :] == slots[:, None]  # (O, N)
        present = jnp.any(masks, axis=1)
        k = jnp.maximum(jnp.sum(present), 1)

        quota = jnp.where(present, num_seed // k, 0)
        # remainder goes to the last present object (modules.py:192-193)
        last = (max_objects - 1) - jnp.argmax(present[::-1])
        quota = quota.at[last].add(num_seed % k)

        seqs = jax.vmap(lambda m: masked_fps(pts, m, fps_cap))(masks)  # (O, cap)

        starts = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(quota)[:-1].astype(jnp.int32)]
        )
        p = jnp.arange(num_seed)
        slot_of_p = (
            jnp.sum((starts[None, :] <= p[:, None]).astype(jnp.int32), axis=1) - 1
        )
        slot_of_p = jnp.clip(slot_of_p, 0, max_objects - 1)
        rank = (p - starts[slot_of_p]) % fps_cap
        inds = seqs[slot_of_p, rank]

        # no objects at all: keep the identity prefix (degenerate scenes)
        inds = jnp.where(jnp.any(present), inds, p.astype(jnp.int32))
        return inds.astype(jnp.int32)

    return jax.vmap(single)(points, seed_cluster)


@functools.partial(jax.jit, static_argnames=("num_seed", "fps_cap", "max_objects"))
def object_balance_sampling(
    points: jnp.ndarray,
    features: jnp.ndarray,
    seed_cluster: jnp.ndarray,
    *,
    num_seed: int = 1024,
    fps_cap: int = 512,
    max_objects: int = 16,
):
    """points (B, N, 3); features (B, N, C) full-cloud (upsampled) features;
    seed_cluster (B, N) int instance ids (0 = background).

    Returns (obs_xyz (B, num_seed, 3), obs_features (B, num_seed, C),
    obs_inds (B, num_seed) int32)."""
    inds = object_balance_indices(
        points, seed_cluster,
        num_seed=num_seed, fps_cap=fps_cap, max_objects=max_objects,
    )
    take = jax.vmap(lambda a, i: a[i])
    return take(points, inds), take(features, inds), inds


@functools.partial(jax.jit, static_argnames=("num_seed",))
def foreground_sampling(
    points: jnp.ndarray,
    features: jnp.ndarray,
    fg_mask: jnp.ndarray,
    *,
    num_seed: int = 1024,
):
    """ForegroundSampling (modules.py:19-47): one FPS over all foreground
    points. points (B,N,3), features (B,N,C), fg_mask (B,N) bool."""
    inds = foreground_indices(points, fg_mask, num_seed=num_seed)
    take = jax.vmap(lambda a, i: a[i])
    return take(points, inds), take(features, inds), inds


@functools.partial(jax.jit, static_argnames=("num_seed",))
def foreground_indices(
    points: jnp.ndarray, fg_mask: jnp.ndarray, *, num_seed: int = 1024
) -> jnp.ndarray:
    """Selection-only ForegroundSampling: (B, num_seed) int32 indices."""

    def single(pts, m):
        return masked_fps(pts, m, num_seed).astype(jnp.int32)

    return jax.vmap(single)(points, fg_mask)
