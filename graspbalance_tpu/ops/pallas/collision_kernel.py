"""Fused Pallas TPU kernel for the collision filter's box-occupancy counts.

The XLA path in eval/collision.py materializes ~25 (G, N) boolean planes
(three rotated-coordinate planes + the per-box masks) and reduces each to a
per-grasp count; at (G=1024, N=20480) that is several HBM round trips per
scene (~7 ms of the e2e config, docs/NOTES.md). Here everything lives in
VMEM per (grasp-tile, point-tile) grid step: the gripper-frame coordinates
are built by three broadcast FMA passes, the eight box comparisons and the
six occupancy counts reduce in registers, and the only HBM traffic is the
(3, N) scene read (once per grasp tile) and a small per-tile partial-count
write (summed outside — per-tile output slots keep the kernel free of
program_id/revisited-block state so it stays correct under jax.vmap).

Semantics match eval/collision.py collision_detect exactly (same
comparisons against the same box planes; reference geometry from
collision_detector.py:26-48): the six counts are
[left, right, bottom, shifting, overall, inner]. Counts are f32 (exact for
N < 2^24) and the coordinate FMA chain uses the same left-to-right
association as the XLA einsum's K=3 contraction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
N_COUNTS = 6  # left, right, bottom, shifting, overall, inner


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _collision_kernel(pts_ref, valid_ref, par_ref, out_ref):
    """pts (3, tn) f32; valid (1, tn) f32; par (tg, 24) f32;
    out (1, tg, 128) f32 — PARTIAL counts for this point tile (summed over
    the tile axis outside; per-tile slots keep the kernel free of
    program_id / revisited-block state, so jax.vmap's pallas batching rule
    — which prepends a grid axis — cannot skew it).

    par columns: 0-2 rx, 3-5 ry, 6-8 rz (gripper-frame axis vectors =
    rotation columns), 9-11 trans, 12 zlo, 13 zhi, 14 depth, 15 d-FL,
    16 d-FL-FW, 17 d-FL-FW-A, 18 w/2, 19 w/2+FW (20-23 pad).
    """
    tg = par_ref.shape[0]
    tn = pts_ref.shape[1]
    x = jnp.zeros((tg, tn), jnp.float32)
    y = jnp.zeros((tg, tn), jnp.float32)
    z = jnp.zeros((tg, tn), jnp.float32)
    for j in range(3):
        d = pts_ref[j : j + 1, :] - par_ref[:, 9 + j : 10 + j]  # (tg, tn)
        x = x + d * par_ref[:, j : j + 1]
        y = y + d * par_ref[:, 3 + j : 4 + j]
        z = z + d * par_ref[:, 6 + j : 7 + j]

    zlo = par_ref[:, 12:13]
    zhi = par_ref[:, 13:14]
    dep = par_ref[:, 14:15]
    dfl = par_ref[:, 15:16]
    dflw = par_ref[:, 16:17]
    dflwa = par_ref[:, 17:18]
    w2 = par_ref[:, 18:19]
    w2fw = par_ref[:, 19:20]

    vld = valid_ref[0:1, :] > 0.5  # (1, tn), padded tail is 0

    m_h = (z > zlo) & (z < zhi) & vld
    m_d = (x > dfl) & (x < dep)
    m_lo = y > -w2fw
    m_li = y < -w2
    m_ro = y < w2fw
    m_ri = y > w2
    m_b = (x <= dfl) & (x > dflw)
    m_s = (x <= dflw) & (x > dflwa)

    left = m_h & m_d & m_lo & m_li
    right = m_h & m_d & m_ro & m_ri
    bottom = m_h & m_lo & m_ro & m_b
    shifting = m_h & m_lo & m_ro & m_s
    overall = left | right | bottom | shifting
    inner = m_h & m_d & (~m_li) & (~m_ri)

    def acc(col, mask):
        out_ref[0, :, col : col + 1] = jnp.sum(
            mask.astype(jnp.float32), axis=1, keepdims=True
        )

    acc(0, left)
    acc(1, right)
    acc(2, bottom)
    acc(3, shifting)
    acc(4, overall)
    acc(5, inner)
    out_ref[0, :, N_COUNTS:] = jnp.zeros((tg, _LANES - N_COUNTS), jnp.float32)


def pack_grasp_params(
    grasps: jnp.ndarray, approach_dist: float, finger_width: float,
    finger_length: float,
) -> jnp.ndarray:
    """(G, 17) decoded grasp rows -> (G, 24) f32 kernel parameter matrix
    (see _collision_kernel docstring for the column layout)."""
    widths = grasps[:, 1]
    heights = grasps[:, 2]
    depths = grasps[:, 3]
    rot = grasps[:, 4:13].reshape(-1, 3, 3)
    trans = grasps[:, 13:16]
    cols = [
        rot[:, :, 0],  # rx (3)
        rot[:, :, 1],  # ry
        rot[:, :, 2],  # rz
        trans,  # (3)
        (-heights / 2)[:, None],
        (heights / 2)[:, None],
        depths[:, None],
        (depths - finger_length)[:, None],
        (depths - finger_length - finger_width)[:, None],
        (depths - finger_length - finger_width - approach_dist)[:, None],
        (widths / 2)[:, None],
        (widths / 2 + finger_width)[:, None],
        jnp.zeros((grasps.shape[0], 4), grasps.dtype),
    ]
    return jnp.concatenate(cols, axis=-1).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("tg", "tn", "interpret"))
def collision_counts_pallas(
    scene_points: jnp.ndarray,
    scene_valid: jnp.ndarray,
    params: jnp.ndarray,
    *,
    tg: int = 256,
    tn: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """scene_points (N, 3) f32, scene_valid (N,) bool/float,
    params (G, 24) from pack_grasp_params -> (G, 6) f32 occupancy counts
    [left, right, bottom, shifting, overall, inner]."""
    n = scene_points.shape[0]
    g = params.shape[0]
    n_pad = _round_up(n, tn)
    g_pad = _round_up(g, tg)

    pts = jnp.transpose(scene_points.astype(jnp.float32), (1, 0))  # (3, N)
    if n_pad != n:
        pts = jnp.pad(pts, ((0, 0), (0, n_pad - n)))
    vld = scene_valid.astype(jnp.float32)[None, :]  # (1, N)
    if n_pad != n:
        vld = jnp.pad(vld, ((0, 0), (0, n_pad - n)))
    par = params
    if g_pad != g:
        par = jnp.pad(par, ((0, g_pad - g), (0, 0)))

    n_tiles = n_pad // tn
    out = pl.pallas_call(
        _collision_kernel,
        grid=(g_pad // tg, n_tiles),
        in_specs=[
            pl.BlockSpec((3, tn), lambda gi, nj: (0, nj),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda gi, nj: (0, nj),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tg, 24), lambda gi, nj: (gi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tg, _LANES), lambda gi, nj: (nj, gi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, g_pad, _LANES), jnp.float32),
        interpret=interpret,
    )(pts, vld, par)
    # integer-valued f32 partials, exact for N < 2^24
    return jnp.sum(out, axis=0)[:g, :N_COUNTS]
