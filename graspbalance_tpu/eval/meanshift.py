"""Gaussian mean-shift clustering, fixed shape, on device.

Rebuild of GaussianMeanShift (segmentation_loss.py:107-140) + the DSN
cluster() driver (dsn.py:68-113) as a single jittable program:

  1. kmeans++-style seed selection among foreground points (distance-
     proportional sampling, select_smart_seeds :66-93) — masked categorical
     draws, fixed num_seeds iterations.
  2. Gaussian-kernel hill climbing, max_iters batched matmul steps (:50-64).
  3. epsilon-ball connected components over the converged seeds. The
     reference uses a quirky one-pass scan with mode-merging (:28-48);
     here proper min-label propagation (iterated to the 2-log bound), a
     documented deviation that only differs when the reference's one-pass
     under-merges chains.
  4. every foreground point takes its nearest seed's component; clusters
     with fewer than min_cluster_size points are dropped and survivors are
     renumbered 1..K in first-seed order (dsn.py:90-111). Background = 0.

Ragged foreground is handled by masking: invalid points get +inf distances
and zero kernel weight, so shapes stay static.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


@functools.partial(
    jax.jit,
    static_argnames=("num_seeds", "max_iters", "min_cluster_size"),
)
def mean_shift_cluster(
    points: jnp.ndarray,
    fg_mask: jnp.ndarray,
    rng: jax.Array,
    *,
    num_seeds: int = 50,
    max_iters: int = 10,
    epsilon: float = 0.05,
    sigma: float = 0.02,
    subsample_factor: int = 5,
    min_cluster_size: int = 10,
):
    """points (N, 3) predicted centers; fg_mask (N,) bool.

    Returns (labels (N,) int32 with 0 = background / 1..K = instances,
    centers (num_seeds, 3) f32, center_valid (num_seeds,) bool).
    """
    n = points.shape[0]
    sub = jnp.arange(0, n, subsample_factor)
    x = points[sub]
    xm = fg_mask[sub]
    m = x.shape[0]

    # -- 1. smart seeds (distance-proportional) --------------------------
    big = jnp.float32(1e9)

    def first_seed(key):
        w = jnp.where(xm, 1.0, 0.0)
        return jax.random.categorical(key, jnp.log(w + 1e-20))

    k0, kloop = jax.random.split(rng)
    i0 = first_seed(k0)

    def seed_body(carry, key):
        min_d, i = carry
        d = jnp.linalg.norm(x - x[i], axis=-1)
        min_d = jnp.minimum(min_d, d)
        w = jnp.where(xm, min_d, 0.0)
        nxt = jax.random.categorical(key, jnp.log(w + 1e-20))
        return (min_d, nxt), i

    keys = jax.random.split(kloop, num_seeds)
    _, seed_idx = lax.scan(
        seed_body, (jnp.full((m,), big), i0), keys
    )
    seeds = x[seed_idx]  # (S, 3)

    # -- 2. hill climbing ------------------------------------------------
    inv2s2 = 0.5 / (sigma * sigma)

    def climb(_, z):
        d2 = jnp.sum((z[:, None, :] - x[None, :, :]) ** 2, axis=-1)
        w = jnp.exp(-inv2s2 * d2) * xm[None, :]
        q = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-20)
        return q @ x

    z = lax.fori_loop(0, max_iters, climb, seeds)

    # -- 3. connected components over seeds ------------------------------
    s = num_seeds
    dz = jnp.linalg.norm(z[:, None, :] - z[None, :, :], axis=-1)
    adj = dz <= epsilon

    def propagate(_, lab):
        return jnp.min(jnp.where(adj, lab[None, :], s), axis=1)

    comp = lax.fori_loop(
        0, s, propagate, jnp.arange(s, dtype=jnp.int32)
    )  # comp[i] = smallest seed index in i's component (s iters >= diameter)

    # -- 4. per-point labels + small-cluster filtering -------------------
    dp = jnp.linalg.norm(points[:, None, :] - z[None, :, :], axis=-1)
    nearest_seed = jnp.argmin(dp, axis=1)
    point_comp = comp[nearest_seed]  # (N,)

    comp_sizes = jnp.zeros((s,), jnp.int32).at[point_comp].add(
        fg_mask.astype(jnp.int32)
    )
    # component representatives: comp[i] == i
    is_rep = comp == jnp.arange(s)
    keep = is_rep & (comp_sizes >= min_cluster_size)
    # renumber kept components 1..K in seed order
    new_id = jnp.cumsum(keep.astype(jnp.int32))  # at rep positions
    label_of_comp = jnp.where(keep, new_id, 0)
    labels = jnp.where(fg_mask, label_of_comp[point_comp], 0).astype(jnp.int32)

    # cluster centers: mean of converged seeds per kept component
    sums = jnp.zeros((s, 3)).at[comp].add(z)
    cnts = jnp.zeros((s,)).at[comp].add(1.0)
    centers = sums / jnp.maximum(cnts[:, None], 1.0)
    return labels, centers, keep
