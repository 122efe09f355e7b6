"""Fused Pallas TPU kernel for furthest point sampling.

FPS is the one truly sequential primitive in the pipeline (m greedy steps,
each reading the full running min-distance buffer). The XLA scan version pays
per-step kernel dispatch; this kernel keeps the transposed cloud (3, N) and
the distance buffer (1, N) resident in VMEM for the whole selection loop —
one kernel launch per batch, ~240 KB VMEM for a 20k-point cloud.

Semantics match the reference CUDA kernel
(PointNet/_ext_src/src/sampling_gpu.cu:74-234): idx[0]=0, greedy max-min on
squared distance, running buffer init 1e10, optional near-origin skip
(variant A). Ties resolve to the lowest index (first max), which is the
deterministic re-definition of the reference's thread-order-dependent ties.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INIT_DIST = 1e10
_ORIGIN_EPS = 1e-3
_LANES = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fps_kernel(xyz_ref, out_ref, *, num_samples: int, n_actual: int, skip_origin: bool):
    # xyz_ref: (1, 3, Npad) f32; out_ref: (1, 1, Mpad) int32
    x = xyz_ref[0, 0:1, :]  # (1, Npad)
    y = xyz_ref[0, 1:2, :]
    z = xyz_ref[0, 2:3, :]
    n_pad = x.shape[-1]
    iota = lax.broadcasted_iota(jnp.int32, (1, n_pad), dimension=1)
    valid = iota < n_actual
    if skip_origin:
        valid = jnp.logical_and(valid, (x * x + y * y + z * z) > _ORIGIN_EPS)

    m_pad = out_ref.shape[-1]
    iota_m = lax.broadcasted_iota(jnp.int32, (1, m_pad), dimension=1)

    def body(j, carry):
        dist, out_vec, lx, ly, lz = carry
        dx = x - lx
        dy = y - ly
        dz = z - lz
        d = dx * dx + dy * dy + dz * dz
        dist = jnp.minimum(dist, d)
        cand = jnp.where(valid, dist, -1.0)
        mx = jnp.max(cand)
        # first index attaining the max (deterministic tie-break)
        best = jnp.min(jnp.where(cand == mx, iota, n_pad)).astype(jnp.int32)
        # Mosaic forbids dynamic lane-offset scalar stores; select into the
        # output vector instead (16 vregs of VPU work per step).
        out_vec = jnp.where(iota_m == j, best, out_vec)
        sel = iota == best
        nlx = jnp.sum(jnp.where(sel, x, 0.0))
        nly = jnp.sum(jnp.where(sel, y, 0.0))
        nlz = jnp.sum(jnp.where(sel, z, 0.0))
        return dist, out_vec, nlx, nly, nlz

    init = (
        jnp.full((1, n_pad), _INIT_DIST, jnp.float32),
        jnp.zeros((1, m_pad), jnp.int32),
        x[0, 0],
        y[0, 0],
        z[0, 0],
    )
    carry = lax.fori_loop(1, num_samples, body, init)
    out_ref[0] = carry[1]


def _fps_kernel_2d(xyz_ref, out_ref, *, num_samples: int, n_actual: int,
                   skip_origin: bool, rows: int):
    """2D-layout variant: coordinates live as (rows, n_pad/rows) so per-step
    reductions use sublanes as well as lanes (~rows x less reduction depth
    than the (1, N) layout). Point index = r * cols + c."""
    cols = xyz_ref.shape[-1]
    x = xyz_ref[0, 0]  # (rows, cols)
    y = xyz_ref[0, 1]
    z = xyz_ref[0, 2]
    row_ids = lax.broadcasted_iota(jnp.int32, (rows, cols), dimension=0)
    col_ids = lax.broadcasted_iota(jnp.int32, (rows, cols), dimension=1)
    iota = row_ids * cols + col_ids
    valid = iota < n_actual
    if skip_origin:
        valid = jnp.logical_and(valid, (x * x + y * y + z * z) > _ORIGIN_EPS)

    m_pad = out_ref.shape[-1]
    iota_m = lax.broadcasted_iota(jnp.int32, (1, m_pad), dimension=1)
    n_total = rows * cols

    def body(j, carry):
        dist, out_vec, lx, ly, lz = carry
        dx = x - lx
        dy = y - ly
        dz = z - lz
        d = dx * dx + dy * dy + dz * dz
        dist = jnp.minimum(dist, d)
        cand = jnp.where(valid, dist, -1.0)
        mx = jnp.max(cand)
        best = jnp.min(jnp.where(cand == mx, iota, n_total)).astype(jnp.int32)
        out_vec = jnp.where(iota_m == j, best, out_vec)
        sel = iota == best
        nlx = jnp.sum(jnp.where(sel, x, 0.0))
        nly = jnp.sum(jnp.where(sel, y, 0.0))
        nlz = jnp.sum(jnp.where(sel, z, 0.0))
        return dist, out_vec, nlx, nly, nlz

    init = (
        jnp.full((rows, cols), _INIT_DIST, jnp.float32),
        jnp.zeros((1, m_pad), jnp.int32),
        x[0, 0],
        y[0, 0],
        z[0, 0],
    )
    carry = lax.fori_loop(1, num_samples, body, init)
    out_ref[0] = carry[1]


def _fps_kernel_2d_batched(xyz_ref, out_ref, *, num_samples: int,
                           n_actual: int, skip_origin: bool, batch: int):
    """All batch rows in ONE grid step. Three wins over _fps_kernel_2d
    (measured path to the round-3 retune, docs/NOTES.md roadmap #2):

    * the `batch` independent select chains are interleaved in one loop
      body, hiding the cross-lane reduction latency bubbles;
    * validity is folded into the distance buffer init (invalid = -1, and
      min(-1, d) stays -1), removing the per-step `where(valid, ...)` pass;
    * the selected point's coordinates are read back with a dynamic
      sublane slice + one-hot lane pick (O(1)) instead of three full-plane
      masked reductions, and the output index lands in a 1-vreg phase
      buffer flushed every 128 steps instead of an m_pad-wide select.

    Layout: xyz_ref (B, 3, n_rows, 128) with point n at (n // 128, n % 128);
    out_ref (B, 1, m_pad)."""
    n_rows, lanes = xyz_ref.shape[2], xyz_ref.shape[3]
    m_pad = out_ref.shape[-1]
    n_total = n_rows * lanes

    row_ids = lax.broadcasted_iota(jnp.int32, (n_rows, lanes), 0)
    col_ids = lax.broadcasted_iota(jnp.int32, (n_rows, lanes), 1)
    iota2 = row_ids * lanes + col_ids
    lane_iota = lax.broadcasted_iota(jnp.int32, (1, lanes), 1)

    planes = []
    dists = []
    for bi in range(batch):
        x = xyz_ref[bi, 0]
        y = xyz_ref[bi, 1]
        z = xyz_ref[bi, 2]
        planes.append((x, y, z))
        valid = iota2 < n_actual
        if skip_origin:
            valid = jnp.logical_and(valid, (x * x + y * y + z * z) > _ORIGIN_EPS)
        # -1 survives every min(dist, d) (d >= 0): validity needs no
        # per-step mask pass
        dists.append(jnp.where(valid, _INIT_DIST, -1.0).astype(jnp.float32))

    def pick(bi, best):
        """Coordinates of point `best` via sublane slice + one-hot lane."""
        r = best // lanes
        c = best - r * lanes
        hot = lane_iota == c
        out = []
        for axis in range(3):
            rowvec = xyz_ref[bi, axis, pl.ds(r, 1), :]  # (1, lanes)
            out.append(jnp.sum(jnp.where(hot, rowvec, 0.0)))
        return out

    def body(jj, carry):
        new = []
        for bi in range(batch):
            dist, buf, lx, ly, lz = carry[bi]
            x, y, z = planes[bi]
            dx = x - lx
            dy = y - ly
            dz = z - lz
            d = dx * dx + dy * dy + dz * dz
            dist = jnp.minimum(dist, d)
            mx = jnp.max(dist)
            best = jnp.min(jnp.where(dist == mx, iota2, n_total)).astype(jnp.int32)
            buf = jnp.where(lane_iota == jj, best, buf)
            nlx, nly, nlz = pick(bi, best)
            new.append((dist, buf, nlx, nly, nlz))
        return tuple(new)

    carry = tuple(
        (
            dists[bi],
            jnp.zeros((1, lanes), jnp.int32),
            planes[bi][0][0, 0],
            planes[bi][1][0, 0],
            planes[bi][2][0, 0],
        )
        for bi in range(batch)
    )
    for phase in range(m_pad // lanes):
        # phase 0 starts at 1: slot 0 keeps the seed index 0 (idx[0]=0)
        carry = lax.fori_loop(1 if phase == 0 else 0, lanes, body, carry)
        new = []
        for bi in range(batch):
            dist, buf, lx, ly, lz = carry[bi]
            out_ref[bi, :, phase * lanes : (phase + 1) * lanes] = buf
            new.append((dist, jnp.zeros((1, lanes), jnp.int32), lx, ly, lz))
        carry = tuple(new)


def _fps_kernel_2d_batched_masked(needed_ref, xyz_ref, dist0_ref, out_ref, *,
                                  num_samples: int, batch: int):
    """Masked sibling of _fps_kernel_2d_batched: validity arrives as a
    caller-built distance-init plane (valid -> 1e10, invalid -> -1; -1
    survives every min(dist, d)), and the seed is the FIRST VALID index
    (min index with dist0 > 0; 0 if nothing is valid) instead of the
    hard-coded index 0 — matching eval/obs.masked_fps's argmax(valid)
    seeding. Layouts are identical to the unmasked kernel.

    needed_ref is a (1, 1) SMEM scalar: only the first `needed` output
    slots are guaranteed (later slots may be 0) — whole 128-step phases
    past it are skipped at runtime. OBS quotas need only
    num_seed // num_objects (+remainder) of the fps_cap samples, so a
    9-object scene runs 1 of 4 phases."""
    n_rows, lanes = xyz_ref.shape[2], xyz_ref.shape[3]
    m_pad = out_ref.shape[-1]
    n_total = n_rows * lanes

    row_ids = lax.broadcasted_iota(jnp.int32, (n_rows, lanes), 0)
    col_ids = lax.broadcasted_iota(jnp.int32, (n_rows, lanes), 1)
    iota2 = row_ids * lanes + col_ids
    lane_iota = lax.broadcasted_iota(jnp.int32, (1, lanes), 1)

    planes = [
        (xyz_ref[bi, 0], xyz_ref[bi, 1], xyz_ref[bi, 2]) for bi in range(batch)
    ]

    def pick(bi, best):
        r = best // lanes
        c = best - r * lanes
        hot = lane_iota == c
        out = []
        for axis in range(3):
            rowvec = xyz_ref[bi, axis, pl.ds(r, 1), :]  # (1, lanes)
            out.append(jnp.sum(jnp.where(hot, rowvec, 0.0)))
        return out

    def body(jj, carry):
        new = []
        for bi in range(batch):
            dist, buf, lx, ly, lz = carry[bi]
            x, y, z = planes[bi]
            dx = x - lx
            dy = y - ly
            dz = z - lz
            d = dx * dx + dy * dy + dz * dz
            dist = jnp.minimum(dist, d)
            mx = jnp.max(dist)
            best = jnp.min(jnp.where(dist == mx, iota2, n_total)).astype(jnp.int32)
            buf = jnp.where(lane_iota == jj, best, buf)
            nlx, nly, nlz = pick(bi, best)
            new.append((dist, buf, nlx, nly, nlz))
        return tuple(new)

    init = []
    for bi in range(batch):
        dist0 = dist0_ref[bi, 0]
        # seed: first valid index (masked_fps seeds argmax(valid); with no
        # valid points, fall back to 0 like argmax over all-False)
        seed = jnp.min(jnp.where(dist0 > 0.0, iota2, n_total)).astype(jnp.int32)
        seed = jnp.where(seed >= n_total, 0, seed)
        sx, sy, sz = pick(bi, seed)
        buf = jnp.where(lane_iota == 0, seed, jnp.zeros((1, lanes), jnp.int32))
        init.append((dist0, buf, sx, sy, sz))
    carry = tuple(init)
    needed = needed_ref[0, 0]
    for phase in range(m_pad // lanes):
        # phase 0 starts at 1: slot 0 holds the seed written above.
        # phases entirely past `needed` are skipped at runtime.
        carry = lax.cond(
            phase * lanes < needed,
            lambda c: lax.fori_loop(1 if phase == 0 else 0, lanes, body, c),
            lambda c: c,
            carry,
        )
        new = []
        for bi in range(batch):
            dist, buf, lx, ly, lz = carry[bi]
            out_ref[bi, :, phase * lanes : (phase + 1) * lanes] = buf
            new.append((dist, jnp.zeros((1, lanes), jnp.int32), lx, ly, lz))
        carry = tuple(new)


@functools.partial(jax.jit, static_argnames=("num_samples", "interpret"))
def fps_pallas_2d_batched_masked(
    xyz: jnp.ndarray, valid: jnp.ndarray, num_samples: int, *,
    max_needed: jnp.ndarray | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """(S, N, 3) float + (S, N) bool -> (S, num_samples) int32 masked FPS
    (greedy max-min restricted to valid points, seed = first valid index).

    max_needed: optional traced int32 scalar; output slots >= max_needed are
    unspecified (0), and whole 128-step phases past it are skipped."""
    s, n, _ = xyz.shape
    n_pad = _round_up(n, _LANES)
    n_rows = n_pad // _LANES
    xyz_t = jnp.transpose(xyz, (0, 2, 1))  # (S, 3, N)
    if n_pad != n:
        xyz_t = jnp.pad(xyz_t, ((0, 0), (0, 0), (0, n_pad - n)))
    xyz_t = xyz_t.reshape(s, 3, n_rows, _LANES)
    dist0 = jnp.where(valid, _INIT_DIST, -1.0).astype(jnp.float32)
    if n_pad != n:
        dist0 = jnp.pad(dist0, ((0, 0), (0, n_pad - n)), constant_values=-1.0)
    dist0 = dist0.reshape(s, 1, n_rows, _LANES)
    m_pad = _round_up(num_samples, _LANES)
    if max_needed is None:
        needed = jnp.full((1, 1), num_samples, jnp.int32)
    else:
        needed = jnp.clip(
            jnp.asarray(max_needed, jnp.int32), 1, num_samples
        ).reshape(1, 1)
    kernel = functools.partial(
        _fps_kernel_2d_batched_masked, num_samples=num_samples, batch=s
    )
    out = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (s, 3, n_rows, _LANES), lambda i: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (s, 1, n_rows, _LANES), lambda i: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (s, 1, m_pad), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((s, 1, m_pad), jnp.int32),
        interpret=interpret,
    )(needed, xyz_t, dist0)
    return out[:, 0, :num_samples]


@functools.partial(
    jax.jit, static_argnames=("num_samples", "skip_origin", "interpret")
)
def fps_pallas_2d_batched(
    xyz: jnp.ndarray, num_samples: int, *, skip_origin: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, N, 3) -> (B, num_samples) int32; batched-interleaved 2D kernel."""
    b, n, _ = xyz.shape
    n_pad = _round_up(n, _LANES)
    n_rows = n_pad // _LANES
    xyz_t = jnp.transpose(xyz, (0, 2, 1))  # (B, 3, N)
    if n_pad != n:
        xyz_t = jnp.pad(xyz_t, ((0, 0), (0, 0), (0, n_pad - n)))
    xyz_t = xyz_t.reshape(b, 3, n_rows, _LANES)
    m_pad = _round_up(num_samples, _LANES)
    kernel = functools.partial(
        _fps_kernel_2d_batched,
        num_samples=num_samples,
        n_actual=n,
        skip_origin=skip_origin,
        batch=b,
    )
    out = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(
                (b, 3, n_rows, _LANES),
                lambda i: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (b, 1, m_pad), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, 1, m_pad), jnp.int32),
        interpret=interpret,
    )(xyz_t)
    return out[:, 0, :num_samples]


@functools.partial(
    jax.jit, static_argnames=("num_samples", "skip_origin", "rows", "interpret")
)
def fps_pallas_2d(
    xyz: jnp.ndarray, num_samples: int, *, skip_origin: bool = True, rows: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, N, 3) -> (B, num_samples) int32; 2D reduction layout."""
    b, n, _ = xyz.shape
    n_pad = _round_up(n, rows * _LANES)
    cols = n_pad // rows
    xyz_t = jnp.transpose(xyz, (0, 2, 1))  # (B, 3, N)
    if n_pad != n:
        xyz_t = jnp.pad(xyz_t, ((0, 0), (0, 0), (0, n_pad - n)))
    xyz_t = xyz_t.reshape(b, 3, rows, cols)
    m_pad = _round_up(num_samples, _LANES)
    kernel = functools.partial(
        _fps_kernel_2d,
        num_samples=num_samples,
        n_actual=n,
        skip_origin=skip_origin,
        rows=rows,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, 3, rows, cols), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (1, 1, m_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, 1, m_pad), jnp.int32),
        interpret=interpret,
    )(xyz_t)
    return out[:, 0, :num_samples]


@functools.partial(
    jax.jit, static_argnames=("num_samples", "skip_origin", "interpret")
)
def fps_pallas(xyz: jnp.ndarray, num_samples: int, *, skip_origin: bool = True,
               interpret: bool = False) -> jnp.ndarray:
    """(B, N, 3) float32 -> (B, num_samples) int32 FPS indices."""
    b, n, _ = xyz.shape
    n_pad = _round_up(n, _LANES)
    xyz_t = jnp.transpose(xyz, (0, 2, 1))  # (B, 3, N)
    if n_pad != n:
        xyz_t = jnp.pad(xyz_t, ((0, 0), (0, 0), (0, n_pad - n)))
    m_pad = _round_up(num_samples, _LANES)

    kernel = functools.partial(
        _fps_kernel, num_samples=num_samples, n_actual=n, skip_origin=skip_origin
    )
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 3, n_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, 1, m_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, 1, m_pad), jnp.int32),
        interpret=interpret,
    )(xyz_t)
    return out[:, 0, :num_samples]
