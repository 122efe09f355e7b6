"""Furthest point sampling (FPS).

Replicates the reference CUDA kernel semantics
(PointNet/_ext_src/src/sampling_gpu.cu:74-234):

* ``idx[0] = 0`` always (deterministic seed).
* points with squared norm <= 1e-3 (near-origin padding) are never selected
  and never update their own min-distance (``skip_origin=True``, variant A).
  The batch variant (pointnet2_batch/src/sampling_gpu.cu) omits the skip
  (``skip_origin=False``, variant B).
* selection is greedy max-min over squared euclidean distance; the running
  per-point distance buffer is initialised to 1e10.

Greedy FPS re-traces itself on its own output: running FPS(k) on an
FPS-ordered point set returns the first k points. The DRP backbone exploits
this (one 2048-point FPS serves all four SA stages as prefixes), matching the
reference's per-stage FPS calls exactly (TrainModel/drp.py:279-306 relies on
the same property for its fp2_inds bookkeeping).

Two implementations:
* ``_fps_xla``     — lax.scan over samples; works on any backend (CPU tests).
* ``_fps_pallas``  — single fused TPU kernel; the point cloud and the running
                     distance buffer stay resident in VMEM across the whole
                     sequential selection loop (a 20k-point cloud is ~240 KB).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

_INIT_DIST = 1e10
_ORIGIN_EPS = 1e-3


def _fps_single_xla(pts: jnp.ndarray, num_samples: int, skip_origin: bool) -> jnp.ndarray:
    """FPS for a single (N, 3) cloud -> (num_samples,) int32."""
    n = pts.shape[0]
    if skip_origin:
        valid = jnp.sum(pts * pts, axis=-1) > _ORIGIN_EPS
    else:
        valid = jnp.ones((n,), dtype=bool)

    def body(carry, _):
        dist, last = carry
        delta = pts - pts[last]
        d = jnp.sum(delta * delta, axis=-1)
        dist = jnp.minimum(dist, d)
        cand = jnp.where(valid, dist, -1.0)
        nxt = jnp.argmax(cand).astype(jnp.int32)
        return (dist, nxt), nxt

    init = (jnp.full((n,), _INIT_DIST, dtype=jnp.float32), jnp.int32(0))
    _, rest = lax.scan(body, init, None, length=num_samples - 1)
    return jnp.concatenate([jnp.zeros((1,), jnp.int32), rest])


@functools.partial(jax.jit, static_argnames=("num_samples", "skip_origin", "use_pallas"))
def furthest_point_sample(
    xyz: jnp.ndarray,
    num_samples: int,
    *,
    skip_origin: bool = True,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Greedy furthest point sampling.

    Args:
      xyz: (B, N, 3) float point clouds.
      num_samples: number of points to select (static).
      skip_origin: exclude near-origin padding points from selection
        (reference variant A, sampling_gpu.cu:105-106).
      use_pallas: force/forbid the fused TPU kernel; default auto
        (pallas on TPU backends, XLA scan elsewhere).

    Returns:
      (B, num_samples) int32 indices into N. idx[:, 0] == 0.
    """
    if xyz.ndim != 3 or xyz.shape[-1] != 3:
        raise ValueError(f"xyz must be (B, N, 3), got {xyz.shape}")
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        # batched-interleaved variant: all batch rows' select chains in one
        # grid step, hiding cross-lane reduction latency (6.18 vs 7.56 ms
        # at (4, 20000)->2048 on v5e, bit-exact; tools/bench_fps_kernel.py)
        from graspbalance_tpu.ops.pallas.fps_kernel import fps_pallas_2d_batched

        return fps_pallas_2d_batched(
            xyz.astype(jnp.float32), num_samples, skip_origin=skip_origin
        )
    fn = functools.partial(
        _fps_single_xla, num_samples=num_samples, skip_origin=skip_origin
    )
    return jax.vmap(fn)(xyz.astype(jnp.float32))


def _masked_fps_single_xla(
    xyz: jnp.ndarray, valid: jnp.ndarray, num_samples: int
) -> jnp.ndarray:
    """Greedy FPS restricted to valid points; seed = first valid index
    (matches the reference FPS seeding at index 0 of the gathered object
    points, modules.py:199-205). xyz (N, 3), valid (N,) -> (num_samples,)."""
    n = xyz.shape[0]
    first = jnp.argmax(valid).astype(jnp.int32)

    def body(carry, _):
        dist, last = carry
        d = jnp.sum((xyz - xyz[last]) ** 2, axis=-1)
        dist = jnp.minimum(dist, d)
        cand = jnp.where(valid, dist, -1.0)
        nxt = jnp.argmax(cand).astype(jnp.int32)
        return (dist, nxt), nxt

    init = (jnp.full((n,), _INIT_DIST, jnp.float32), first)
    _, rest = lax.scan(body, init, None, length=num_samples - 1)
    return jnp.concatenate([first[None], rest])


@functools.partial(jax.jit, static_argnames=("num_samples", "use_pallas"))
def furthest_point_sample_masked(
    xyz: jnp.ndarray,
    valid: jnp.ndarray,
    num_samples: int,
    *,
    max_needed: jnp.ndarray | None = None,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Batched greedy FPS restricted to per-row valid subsets.

    Args:
      xyz: (S, N, 3) float point clouds.
      valid: (S, N) bool candidate masks. Invalid points are never selected
        (a row with no valid point returns index 0s). Seed = first valid
        index per row.
      num_samples: number of points to select (static).
      max_needed: optional traced int32 scalar — the caller promises to
        read only the first max_needed samples per row; later slots are
        unspecified, and the TPU kernel skips whole 128-step phases past it
        (OBS quotas need only num_seed // num_objects of the fps_cap).

    Returns: (S, num_samples) int32. On TPU this runs the batched-interleaved
    Pallas kernel with validity folded into the distance init; elsewhere a
    vmapped lax.scan (bit-identical selection sequences)."""
    if xyz.ndim != 3 or xyz.shape[-1] != 3:
        raise ValueError(f"xyz must be (S, N, 3), got {xyz.shape}")
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from graspbalance_tpu.ops.pallas.fps_kernel import (
            fps_pallas_2d_batched_masked,
        )

        return fps_pallas_2d_batched_masked(
            xyz.astype(jnp.float32), valid, num_samples, max_needed=max_needed
        )
    fn = functools.partial(_masked_fps_single_xla, num_samples=num_samples)
    return jax.vmap(fn)(xyz.astype(jnp.float32), valid)


def random_sample(xyz: jnp.ndarray, num_samples: int, rng: jax.Array) -> jnp.ndarray:
    """Uniform random subsampling without replacement (the reference's
    alternative sampler, ModifiedNetTools/subsample.py random_sample).
    xyz (B, N, 3) -> (B, num_samples) int32."""
    b, n, _ = xyz.shape
    keys = jax.random.split(rng, b)
    return jax.vmap(
        lambda k: jax.random.choice(
            k, n, shape=(num_samples,), replace=False
        ).astype(jnp.int32)
    )(keys)
