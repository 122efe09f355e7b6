"""Object-balanced seed sampling (OBS) — the paper's balance mechanism.

Rebuild of ObjectBalanceSampling / ForegroundSampling
(TrainModel/modules.py:19-47, 178-221): at inference, instead of the
backbone's geometry-FPS seeds, re-seed with an equal budget per detected
object (1024 // num_objects seeds each, remainder to the last object) so
small objects get as many grasp candidates as large ones.

Fixed-shape version: per object slot, a masked FPS (batched across slots —
the sequential greedy loop is shared, the slot axis is parallel) produces up
to `fps_cap` candidates; the output is assembled by quota intervals computed
from the dynamic object count. Deviations: a single object can receive at
most fps_cap seeds (quota cycles beyond that; with >= 1024/fps_cap objects
the result is exact), and the FPS candidate pool per object is capped at
`compact_cap` points (objects larger than that are uniformly index-strided
down to compact_cap before FPS — the reference gathers each object's full
point set, modules.py:199; GraspNet-1B objects are far below the cap).

The per-slot FPS runs over COMPACTED object point sets: each slot's points
are gathered into a (compact_cap, 3) buffer first, so the 16-slot greedy
loop scans ~5x fewer points per step than masking the full 20k cloud, and
the whole thing runs as ONE batched Pallas FPS kernel (B*16 interleaved
select chains, VMEM-resident). FPS is gather-invariant: distances between
valid points are unchanged and compaction preserves index order, so the
selection sequence (incl. lowest-index tie-breaks) is identical to masked
FPS over the full cloud whenever the object fits the cap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from graspbalance_tpu.ops.fps import (
    _masked_fps_single_xla,
    furthest_point_sample_masked,
)
from graspbalance_tpu.ops.query import _first_k_by_index


def masked_fps(xyz: jnp.ndarray, valid: jnp.ndarray, num_samples: int) -> jnp.ndarray:
    """Greedy FPS restricted to valid points. Seed = first valid index
    (matches the reference FPS seeding at index 0 of the gathered object
    points). xyz (N, 3), valid (N,) -> (num_samples,) int32."""
    return _masked_fps_single_xla(xyz, valid, num_samples)


def _compact_mask(pts: jnp.ndarray, mask: jnp.ndarray, cap: int):
    """Gather the masked subset of pts into a dense (cap, 3) buffer.

    pts (N, 3), mask (N,) bool -> (cxyz (cap, 3), table (cap,) int32 original
    indices, cvalid (cap,) bool). Exact (all masked points, in index order)
    when the subset has <= cap points; uniformly index-strided down to
    exactly cap points otherwise (the first masked point is always kept, so
    FPS seeding is stable)."""
    n = pts.shape[0]
    rank = jnp.cumsum(mask.astype(jnp.int32))  # 1-based at masked points
    count = jnp.maximum(rank[-1], 1)
    # keep where floor((rank-1)*cap/count) increments: every masked point
    # when count <= cap (the ratio step is >= 1), else exactly cap points
    # uniformly spread over the subset, first masked point included
    hi = ((rank - 1) * cap) // count
    lo = ((rank - 2) * cap) // count
    keep = jnp.logical_and(mask, hi > lo)
    kcount = jnp.sum(keep.astype(jnp.int32))
    # table[j] = index of the (j+1)-th kept point — the same
    # "position of rank j" problem as the query selection, solved with the
    # fused two-level cumsum identity instead of a scatter: XLA scatters
    # serialize on TPU (the vmapped B*16-slot scatter here measured 5.9 ms
    # of the config-2 forward, v5e 2026-08-19; this form is ~50x cheaper —
    # at k=cap the extraction matmuls run with a large M, unlike the k=64
    # query where the same identity is VPU-chain-bound)
    js = jnp.arange(cap, dtype=jnp.int32)
    pos = _first_k_by_index(keep, cap)
    table = jnp.where(js < kcount, pos, 0)  # zero-pad like the scatter init
    cxyz = jnp.take(pts, table, axis=0)
    cvalid = js < kcount
    return cxyz, table, cvalid


@functools.partial(
    jax.jit, static_argnames=("num_seed", "fps_cap", "max_objects", "compact_cap")
)
def object_balance_indices(
    points: jnp.ndarray,
    seed_cluster: jnp.ndarray,
    *,
    num_seed: int = 1024,
    fps_cap: int = 512,
    max_objects: int = 16,
    compact_cap: int = 4096,
) -> jnp.ndarray:
    """Selection-only OBS: points (B, N, 3); seed_cluster (B, N) int instance
    ids (0 = background) -> obs_inds (B, num_seed) int32.

    The selection never reads features, so callers can defer feature
    interpolation to just the selected rows (the reference materializes
    up_sample_features for the whole cloud and then gathers 1024 of the
    20000 rows, modules.py:181-189 — same math, 20x the work)."""
    b, n, _ = points.shape
    o = max_objects
    pts3 = points[..., :3]

    def prep(pts, labels):
        slots = jnp.arange(1, o + 1)
        masks = labels[None, :] == slots[:, None]  # (O, N)
        cxyz, table, cvalid = jax.vmap(
            lambda m: _compact_mask(pts, m, compact_cap)
        )(masks)
        return masks, cxyz, table, cvalid

    masks, cxyz, table, cvalid = jax.vmap(prep)(pts3, seed_cluster)

    # the largest per-slot quota any scene in the batch can read: the last
    # present object gets num_seed // k + num_seed % k (k = object count),
    # cycled into fps_cap — the FPS kernel skips sample phases past this
    present_all = jnp.any(masks, axis=2)  # (B, O)
    counts = jnp.sum(present_all.astype(jnp.int32), axis=1)  # (B,)
    # zero-object rows read nothing (identity prefix) — don't let them
    # force the full fps_cap; treat them as the cheapest case
    kmin = jnp.maximum(jnp.min(jnp.where(counts > 0, counts, o)), 1)
    max_needed = jnp.minimum(num_seed // kmin + num_seed % kmin, fps_cap)

    # one batched FPS over all B*O compacted slots (Pallas kernel on TPU)
    seqs_c = furthest_point_sample_masked(
        cxyz.reshape(b * o, compact_cap, 3),
        cvalid.reshape(b * o, compact_cap),
        fps_cap,
        max_needed=max_needed,
    ).reshape(b, o, fps_cap)
    seqs = jnp.take_along_axis(table, seqs_c, axis=-1)  # original indices

    def assemble(masks_row, seqs_row):
        present = jnp.any(masks_row, axis=1)
        k = jnp.maximum(jnp.sum(present), 1)

        quota = jnp.where(present, num_seed // k, 0)
        # remainder goes to the last present object (modules.py:192-193)
        last = (o - 1) - jnp.argmax(present[::-1])
        quota = quota.at[last].add(num_seed % k)

        starts = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(quota)[:-1].astype(jnp.int32)]
        )
        p = jnp.arange(num_seed)
        slot_of_p = (
            jnp.sum((starts[None, :] <= p[:, None]).astype(jnp.int32), axis=1) - 1
        )
        slot_of_p = jnp.clip(slot_of_p, 0, o - 1)
        rank = (p - starts[slot_of_p]) % fps_cap
        inds = seqs_row[slot_of_p, rank]

        # no objects at all: keep the identity prefix (degenerate scenes)
        inds = jnp.where(jnp.any(present), inds, p.astype(jnp.int32))
        return inds.astype(jnp.int32)

    return jax.vmap(assemble)(masks, seqs)


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
    return furthest_point_sample_masked(points[..., :3], fg_mask, num_seed)
