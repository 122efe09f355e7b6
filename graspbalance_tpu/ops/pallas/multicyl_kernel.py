"""Fused Pallas TPU kernel: multi-cylinder query + group + rotate.

The reference grasp head launches 16 independent cylinder_query CUDA kernels
(4 radii x 4 gripper depths, TrainModel/graspbalance.py:104-116 +
modules.py:89-124), then group_points + a per-seed rotation of the grouped
xyz (pointnet2_utils.py:281-284). Round 1 fused the 16 queries into one XLA
pass (ops/query.py multi_cylinder_query) but still materialized per-combo
hit masks in HBM and ran a separate 16.8M-row random gather for the grouped
coordinates — together ~96 ms of the 138 ms bs=4 forward, almost all memory
traffic.

This kernel keeps the whole pipeline VMEM-resident per chunk of centers:

  1. rotated coords xr/yr/zr = R^T(p-c) and d2 = yr^2+zr^2 for the chunk,
     computed once and shared by all 16 combos. Buffers are built 3D-tiled
     (C, T, 128) from the start (no in-kernel reshapes). xr/yr/zr are also
     split hi/lo into two bf16 planes: a one-hot (0/1) matmul against the
     planes reconstructs the f32 value with <= 2^-17 relative error (each
     plane is picked exactly — single nonzero per one-hot row — and
     hi + lo carries 16 mantissa bits; |rel| <= 0.08 m, so the error is
     < 1e-6 m, far below the data's sensor noise).
  2. per combo: hit mask -> per-tile counts -> cumsum -> the same sort-free
     rank-position selection as ops/query._first_k_from_tiled, with the
     per-slot tile extraction done as batched MXU matmuls on bf16 0/1 hit
     bits (exact; selection itself is all-f32 and bit-identical to the
     reference CUDA semantics: first nsample hits in index order, slots past
     the hit count hold the first hit, 0 when no hits —
     cylinder_query_gpu.cu:20-101).
  3. the selected points' rotated relative coordinates are pulled straight
     from the xr/yr/zr planes with a second one-hot matmul, so the kernel
     directly emits what the width-grouping SharedMLP consumes and the
     downstream gather + rotate disappears. Zero-hit seeds fall back to the
     rotated coords of point 0 (the reference's all-zeros index init).

No gradient: in training the grouping inputs are label-derived rotations and
input coordinates (graspbalance.py:133-136), at inference argmax-selected
view templates — nothing trainable flows through.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_PAD_COORD = 1e9  # finite pad: keeps 0 * pad = 0 in one-hot selections


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _cumsum_last(x):
    """Inclusive scan along the last axis (Hillis–Steele log-shift; Mosaic
    has no cumsum lowering). Exact for integer-valued f32 up to 2^24."""
    n = x.shape[-1]
    shift = 1
    while shift < n:
        pad = jnp.zeros(x.shape[:-1] + (shift,), x.dtype)
        x = x + jnp.concatenate([pad, x[..., :-shift]], axis=-1)
        shift *= 2
    return x


def _split_hi_lo(v):
    hi = v.astype(jnp.bfloat16)
    lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _multicyl_kernel(
    params_ref,  # (RH, 2) f32 in SMEM: per-combo (radius^2, hmax)
    cloud_ref,  # (1, 3, T, 128) f32, padded with _PAD_COORD
    ctr_ref,  # (1, C, 3) f32
    rot_ref,  # (1, C, 9) f32 row-major 3x3
    rel_ref,  # (1, RH, 3, C, K) f32 out
    idx_ref=None,  # (1, RH, C, K) int32 out (absent when emit_idx=False)
    *,
    n_combos: int,
    hmin: float,
    nsample: int,
    chunk: int,
    emit_idx: bool = True,
):
    c = chunk
    t = cloud_ref.shape[2]
    k = nsample
    px = cloud_ref[0, 0]  # (T, 128)
    py = cloud_ref[0, 1]
    pz = cloud_ref[0, 2]

    def col(ref, i):  # (C, 1) column, broadcastable against (C, T, 128)
        return ref[0, :, i : i + 1]

    cx, cy, cz = col(ctr_ref, 0), col(ctr_ref, 1), col(ctr_ref, 2)
    # columns of R are the gripper-frame axes; p' = R^T (p - c)
    r = [col(rot_ref, i) for i in range(9)]

    def bc(v):  # (C, 1) -> (C, 1, 1)
        return v[:, :, None]

    dx = px[None] - bc(cx)  # (C, T, 128)
    dy = py[None] - bc(cy)
    dz = pz[None] - bc(cz)
    xr = bc(r[0]) * dx + bc(r[3]) * dy + bc(r[6]) * dz
    yr = bc(r[1]) * dx + bc(r[4]) * dy + bc(r[7]) * dz
    zr = bc(r[2]) * dx + bc(r[5]) * dy + bc(r[8]) * dz
    d2 = yr * yr + zr * zr

    xr_hi, xr_lo = _split_hi_lo(xr)
    yr_hi, yr_lo = _split_hi_lo(yr)
    zr_hi, zr_lo = _split_hi_lo(zr)

    # zero-hit fallback: the reference's all-zeros init groups point 0
    p0x, p0y, p0z = px[0, 0], py[0, 0], pz[0, 0]
    f0x = p0x - cx  # (C, 1)
    f0y = p0y - cy
    f0z = p0z - cz
    rel0 = (
        r[0] * f0x + r[3] * f0y + r[6] * f0z,
        r[1] * f0x + r[4] * f0y + r[7] * f0z,
        r[2] * f0x + r[5] * f0y + r[8] * f0z,
    )

    iota_t = lax.broadcasted_iota(jnp.int32, (1, k, t), 2)
    iota_lane = lax.broadcasted_iota(jnp.int32, (1, k, _LANES), 2)
    js_i = lax.broadcasted_iota(jnp.int32, (1, k), 1)  # slot ranks 0..k-1
    js_f = js_i.astype(jnp.float32)

    def combo_body(combo, _):
            r2 = params_ref[combo, 0]
            hmax_c = params_ref[combo, 1]
            hit = (d2 < r2) & (xr > hmin) & (xr < hmax_c)  # (C, T, 128)
            hit16 = hit.astype(jnp.bfloat16)  # 0/1 exact in bf16
            tile_cnt = jnp.sum(hit16.astype(jnp.float32), axis=-1)  # (C, T)
            tile_cum = _cumsum_last(tile_cnt)  # inclusive (C, T)
            count = tile_cum[:, t - 1 :]  # (C, 1)
            # tile of the (j+1)-th hit: #{tiles with cum <= j}
            tj = jnp.sum(
                (tile_cum[:, None, :] <= js_f[..., None]).astype(jnp.int32),
                axis=-1,
            )  # (C, k)
            tj = jnp.minimum(tj, t - 1)
            onehot = (iota_t == tj[..., None]).astype(jnp.bfloat16)  # (C,k,T)
            excl = tile_cum - tile_cnt  # exclusive cumsum (C, T)
            base = jnp.sum(
                onehot.astype(jnp.float32) * excl[:, None, :], axis=-1
            )  # (C, k)
            # pull each slot's hit tile: batched (k,T)@(T,128) on the MXU
            tiles = lax.dot_general(
                onehot,
                hit16,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (C, k, 128) of 0/1
            local_cs = _cumsum_last(tiles)
            r_local = (js_f + 1.0 - base)[..., None]  # (C, k, 1)
            pos_local = jnp.sum(
                (local_cs < r_local).astype(jnp.int32), axis=-1
            )  # (C, k)
            pos = tj * _LANES + pos_local
            pad = jnp.where(count > 0, pos[:, 0:1], 0).astype(jnp.int32)
            final = jnp.where(js_f < count, pos, pad)  # (C, k) int32

            # gather the selected points' rotated coords from the planes
            ftile = final // _LANES
            flane = final - ftile * _LANES
            oh2 = (iota_t == ftile[..., None]).astype(jnp.bfloat16)
            lane_oh = (iota_lane == flane[..., None]).astype(jnp.float32)

            def pick(hi_plane, lo_plane, oh2=oh2, lane_oh=lane_oh):
                def mm(plane):  # (C,k,T) @ (C,T,128) batched over C
                    return lax.dot_general(
                        oh2,
                        plane,
                        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    )  # (C, k, 128)

                vt = mm(hi_plane) + mm(lo_plane)
                return jnp.sum(lane_oh * vt, axis=-1)  # (C, k)

            has_hit = count > 0  # (C, 1)
            relx = jnp.where(has_hit, pick(xr_hi, xr_lo), rel0[0])
            rely = jnp.where(has_hit, pick(yr_hi, yr_lo), rel0[1])
            relz = jnp.where(has_hit, pick(zr_hi, zr_lo), rel0[2])

            rel_ref[0, combo, 0] = relx
            rel_ref[0, combo, 1] = rely
            rel_ref[0, combo, 2] = relz
            if emit_idx:
                idx_ref[0, combo] = final
            return 0

    # one traced body for all combos: keeps the Mosaic IR ~16x smaller than
    # a Python unroll (the unrolled variant compiled pathologically slowly)
    lax.fori_loop(0, n_combos, combo_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "radii", "hmin", "hmaxs", "nsample", "chunk", "call_chunk",
        "emit_idx", "interpret",
    ),
)
def multi_cylinder_group(
    cloud: jnp.ndarray,
    centers: jnp.ndarray,
    rot: jnp.ndarray,
    radii: tuple,
    hmin: float,
    hmaxs: tuple,
    nsample: int,
    *,
    chunk: int = 16,
    call_chunk: int = 256,
    emit_idx: bool = True,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray | None]:
    """All (radius, hmax) cylinder queries + grouping + gripper-frame rotation
    in one kernel pass over the cloud.

    Args:
      cloud: (B, N, 3) f32 support points.
      centers: (B, M, 3) f32 seed points.
      rot: (B, M, 3, 3) f32 gripper->world rotations.
      radii / hmaxs: the 4x4 combo grid (static).
      nsample: neighbors per combo (static, <= 128).
      chunk: centers per grid step (VMEM scales ~linearly with it).
      call_chunk: centers per pallas_call. XLA:TPU stack-allocates a custom
        call's operand+result buffers in scoped VMEM (16 MB limit); the full
        (B, 16, 3, M, K) f32 result is ~50 MB at production shape, which
        aborts compilation. Slicing the centers axis across several calls
        keeps each call's I/O under the limit while still computing the
        rotated coordinates once per center for all 16 combos.
      emit_idx: also return the query indices (the grasp head only consumes
        the rotated coordinates; dropping idx halves the result traffic).

    Returns:
      rel: (B, R, H, M, nsample, 3) f32 — R^T (p_k - c), the rotated grouped
           relative coordinates (== CylinderQueryAndGroup's grouped_xyz after
           rotate_xyz, pointnet2_utils.py:281-284; ~1e-6 m abs tolerance from
           the hi/lo bf16 reconstruction).
      idx: (B, R, H, M, nsample) int32 — reference-exact query indices
           (None when emit_idx=False).
    """
    b, n, _ = cloud.shape
    m = centers.shape[1]
    n_r, n_h = len(radii), len(hmaxs)
    rh = n_r * n_h
    if nsample > _LANES:
        raise ValueError(f"nsample must be <= {_LANES}")
    t = _round_up(n, _LANES * 8) // _LANES  # T multiple of 8 sublanes
    n_pad = t * _LANES
    call_chunk = max(chunk, min(call_chunk, _round_up(m, chunk)))
    call_chunk = _round_up(call_chunk, chunk)
    m_pad = _round_up(m, call_chunk)

    cloud_t = jnp.transpose(cloud, (0, 2, 1))  # (B, 3, N)
    cloud_t = jnp.pad(
        cloud_t, ((0, 0), (0, 0), (0, n_pad - n)), constant_values=_PAD_COORD
    ).reshape(b, 3, t, _LANES)
    ctr_p = jnp.pad(centers, ((0, 0), (0, m_pad - m), (0, 0)))  # (B, Mp, 3)
    rot_p = jnp.pad(
        rot.reshape(b, m, 9), ((0, 0), (0, m_pad - m), (0, 0))
    )  # (B, Mp, 9)

    params = jnp.asarray(
        [[r * r, h] for r in radii for h in hmaxs], jnp.float32
    )  # (RH, 2): row-major (radius, hmax) combo order matches the XLA path

    kernel = functools.partial(
        _multicyl_kernel,
        n_combos=rh,
        hmin=hmin,
        nsample=nsample,
        chunk=chunk,
        emit_idx=emit_idx,
    )
    grid = (b, call_chunk // chunk)
    out_specs = [
        pl.BlockSpec(
            (1, rh, 3, chunk, nsample),
            lambda i, j: (i, 0, 0, j, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((b, rh, 3, call_chunk, nsample), jnp.float32),
    ]
    if emit_idx:
        out_specs.append(
            pl.BlockSpec(
                (1, rh, chunk, nsample),
                lambda i, j: (i, 0, j, 0),
                memory_space=pltpu.VMEM,
            )
        )
        out_shapes.append(
            jax.ShapeDtypeStruct((b, rh, call_chunk, nsample), jnp.int32)
        )

    # Mosaic checks its computed per-kernel VMEM demand against a 16 MB
    # default ("scoped vmem") limit; this kernel's tile buffers legitimately
    # need more at 20k-point clouds (v5e has 128 MB physical VMEM).
    # older jax spells it TPUCompilerParams and has no CompilerParams attr
    params_cls = getattr(pltpu, "CompilerParams", None) or pltpu.TPUCompilerParams
    compiler_params = params_cls(vmem_limit_bytes=100 * 1024 * 1024)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        compiler_params=compiler_params,
        in_specs=[
            pl.BlockSpec(
                (rh, 2), lambda i, j: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, 3, t, _LANES), lambda i, j: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, chunk, 3), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, chunk, 9), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )

    rel_parts, idx_parts = [], []
    for s in range(m_pad // call_chunk):
        lo = s * call_chunk
        outs = call(
            params,
            cloud_t,
            lax.slice_in_dim(ctr_p, lo, lo + call_chunk, axis=1),
            lax.slice_in_dim(rot_p, lo, lo + call_chunk, axis=1),
        )
        rel_parts.append(outs[0])
        if emit_idx:
            idx_parts.append(outs[1])
    rel = rel_parts[0] if len(rel_parts) == 1 else jnp.concatenate(rel_parts, axis=3)

    rel = rel[:, :, :, :m].reshape(b, n_r, n_h, 3, m, nsample)
    rel = jnp.transpose(rel, (0, 1, 2, 4, 5, 3))  # (B,R,H,M,K,3)
    if not emit_idx:
        return rel, None
    idx = idx_parts[0] if len(idx_parts) == 1 else jnp.concatenate(idx_parts, axis=2)
    idx = idx[:, :, :m].reshape(b, n_r, n_h, m, nsample)
    return rel, idx
