"""Ball query and cylinder query with reference-exact padding semantics.

The reference CUDA kernels (PointNet/_ext_src/src/ball_query_gpu.cu:9-54,
cylinder_query_gpu.cu:20-101) scan points in index order and keep the first
``nsample`` hits; before the first hit every slot holds the first hit's
index, and a center with zero hits keeps the all-zeros initialisation. The
neighbor *set* feeds a permutation-invariant max-pool, so order never matters
downstream, but which-k-of-many does; we reproduce the reference's
first-k-by-index rule exactly (``order='index'``) and additionally offer
nearest-k (``order='nearest'``), which costs the same here and tends to give
slightly better features (flag-gated, off by default for parity).

Implementation: tiled distance computation (centers chunked to bound the
(chunk, N) intermediate) + sort-free selection. 'index' mode uses a
cumsum/position-count identity (see _first_k_by_index) — pure fused
compare+reduce VPU work; 'nearest' uses exact top-k; 'nearest_approx' uses
the TPU hardware approximate top-k unit.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax import lax

_BIG = jnp.int32(0x3FFFFFFF)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _first_k_by_index(hit: jnp.ndarray, nsample: int, tile: int = 128) -> jnp.ndarray:
    """(..., N) bool -> (..., nsample) int32: indices of the first nsample
    hits in index order, with reference padding (slots past the hit count
    hold the first hit's index; 0 when no hits — ball_query_gpu.cu:33-41).

    Sort-free two-level selection: split N into tiles; the (j+1)-th hit's
    tile is found by counting tiles whose inclusive hit-count cumsum is <= j
    (the identity pos_of_rank(r) = #\\{prefix counts < r\\}), then the position
    inside the gathered tile by the same identity on the tile-local cumsum.
    Work per row: O(N + k*(N/tile + tile)) instead of a top-k sort over N
    (~25x faster than lax.top_k at N=20k on TPU v5e; tile=128 = one
    vreg per tile row measured fastest, 1.75x over 256).
    """
    n = hit.shape[-1]
    t = _round_up(n, tile) // tile
    if t * tile != n:
        hit = jnp.pad(
            hit, [(0, 0)] * (hit.ndim - 1) + [(0, t * tile - n)]
        )
    h = hit.reshape(hit.shape[:-1] + (t, tile))
    return _first_k_from_tiled(h, nsample)


_COUNT_MATMUL = _os.environ.get("GB_COUNT_MATMUL", "") not in ("", "0")


def set_count_matmul(on: bool) -> None:
    """A/B knob for _tile_count's MXU-matvec form (trace-time constant)."""
    global _COUNT_MATMUL
    _COUNT_MATMUL = bool(on)


def _tile_count(h: jnp.ndarray) -> jnp.ndarray:
    """(..., T, TILE) 0/1 hits -> (..., T) int32 per-tile counts.

    Two exact forms: a VPU reduce over the minor TILE axis (default), or an
    MXU matvec against a ones vector (GB_COUNT_MATMUL=1). The reduce's fused
    consumer prefers the hit plane C-minor while the slot-tile extraction
    dots want it TILE-minor — the layout conflict behind the residual
    ~3.5 ms of transpose copies (docs/NOTES.md planes-form entry). The
    matvec variant aligns both consumers on TILE-minor. Exact either way:
    bf16 0/1 products accumulate in f32 on the MXU, counts <= TILE."""
    if _COUNT_MATMUL:
        ones = jnp.ones((h.shape[-1],), jnp.bfloat16)
        cnt = jnp.einsum(
            "...tl,l->...t", h.astype(jnp.bfloat16), ones,
            preferred_element_type=jnp.float32,
        )
        return cnt.astype(jnp.int32)
    return jnp.sum(h.astype(jnp.int32), axis=-1)


def _first_k_from_tiled(h: jnp.ndarray, nsample: int) -> jnp.ndarray:
    """(..., T, TILE) bool hits (padding = False) -> (..., nsample) int32."""
    t, tile = h.shape[-2:]
    tile_cnt = _tile_count(h)  # (..., t)
    tile_cum = jnp.cumsum(tile_cnt, axis=-1)  # inclusive (..., t)
    count = tile_cum[..., -1:]
    js = jnp.arange(nsample, dtype=jnp.int32)
    # tile index of the (j+1)-th hit
    tj = jnp.sum(
        (tile_cum[..., None] <= js).astype(jnp.int32), axis=-2
    )  # (..., k)
    tj = jnp.minimum(tj, t - 1)
    # per-slot tile extraction as one-hot matmuls (MXU) — dynamic gathers
    # along the tile axis lower poorly on TPU. The extracted values are hit
    # bits (0/1) so bf16 accumulation is exact; the prefix-count matvec
    # carries values up to N and stays f32.
    onehot16 = jax.nn.one_hot(tj, t, dtype=jnp.bfloat16)  # (..., k, t)
    excl = jnp.concatenate(
        [jnp.zeros_like(tile_cum[..., :1]), tile_cum[..., :-1]], axis=-1
    )
    base = jnp.einsum(
        "...kt,...t->...k",
        onehot16.astype(jnp.float32),
        excl.astype(jnp.float32),
    ).astype(jnp.int32)  # hits before the tile (..., k)
    tiles = jnp.einsum(
        "...kt,...tl->...kl", onehot16, h.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )  # (..., k, tile) of 0/1
    local_cs = jnp.cumsum(tiles, axis=-1)
    r = (js + 1 - base)[..., None].astype(jnp.float32)  # local target rank
    pos_local = jnp.sum((local_cs < r).astype(jnp.int32), axis=-1)
    pos = tj * tile + pos_local
    pad = jnp.where(count > 0, pos[..., 0:1], 0)
    return jnp.where(js < count, pos, pad).astype(jnp.int32)


def _nearest_k(hit: jnp.ndarray, d2: jnp.ndarray, nsample: int) -> jnp.ndarray:
    keyf = jnp.where(hit, d2, jnp.inf)
    neg_vals, idxs = lax.top_k(-keyf, nsample)
    is_hit = neg_vals > -jnp.inf
    first = jnp.where(is_hit[..., 0:1], idxs[..., 0:1], 0)
    return jnp.where(is_hit, idxs, first).astype(jnp.int32)


def _nearest_k_approx(hit: jnp.ndarray, d2: jnp.ndarray, nsample: int) -> jnp.ndarray:
    """Nearest-k via the TPU-native approximate top-k unit (lax.approx_min_k,
    ~25x faster than exact top_k at N=20k). Recall < 1.0: an opt-in speed
    mode, not parity."""
    keyf = jnp.where(hit, d2, jnp.inf)
    vals, idxs = lax.approx_min_k(keyf, nsample)
    is_hit = jnp.isfinite(vals)
    first = jnp.where(is_hit[..., 0:1], idxs[..., 0:1], 0)
    return jnp.where(is_hit, idxs, first).astype(jnp.int32)


def _select(hit: jnp.ndarray, d2: jnp.ndarray, nsample: int, order: str) -> jnp.ndarray:
    if order == "index":
        return _first_k_by_index(hit, nsample)
    if order == "nearest":
        return _nearest_k(hit, d2, nsample)
    if order == "nearest_approx":
        return _nearest_k_approx(hit, d2, nsample)
    raise ValueError(f"unknown query order: {order}")


def _check_ascending(radii, hmaxs):
    if len(radii) > 7 or len(hmaxs) > 7:
        raise ValueError("class encoding supports at most 7 radii/hmaxs")
    # the rank-count decode (rc <= ri, hc <= hi) is only equivalent to the
    # per-combo masks when thresholds are ascending; reject silent misuse
    if list(radii) != sorted(radii) or list(hmaxs) != sorted(hmaxs):
        raise ValueError(
            "multi_cylinder_query order='index' requires ascending radii and "
            f"hmaxs (got radii={radii}, hmaxs={hmaxs}); sort them and remap "
            "the output combo axes, or use order='nearest'"
        )


def _class_plane(xr, d2, radii, hmin, hmaxs):
    """(C, N) f32 class plane: rc*8 + hc, 63 = never-hit (see _multi_first_k).

    hit(r_i, h_j) == (class//8 <= i) & (class%8 <= j) — every comparison
    against the original thresholds is preserved exactly."""
    rc = jnp.zeros_like(d2)
    for radius in radii:
        rc = rc + (d2 >= radius * radius).astype(jnp.float32)
    hc = jnp.zeros_like(xr)
    for hmax in hmaxs:
        hc = hc + (xr >= hmax).astype(jnp.float32)
    return jnp.where(xr > hmin, rc * 8.0 + hc, 63.0)


def _multi_first_k(xr, d2, radii, hmin, hmaxs, nsample, tile: int = 128):
    """First-k-by-index for all len(radii) x len(hmaxs) cylinder combos.

    Traffic-optimal formulation (v5e profile, 2026-08): the naive version
    re-reads the (C, N) f32 xr/d2 planes for every one of the 16 combo
    masks, which makes the query HBM-bound (~27 ms at production shape).
    Instead each point's combo membership is compressed into ONE bf16
    "class" plane materialized once:

        rc = #{radii r_j : d2 >= r_j^2}     (0..R; 0 = inside the smallest)
        hc = #{hmaxs h_j : xr >= h_j}       (0..H)
        class = rc * 8 + hc, or 63 when xr <= hmin (never a hit)

    so hit(r, h) == (class//8 <= r) & (class%8 <= h) — every comparison
    against the original thresholds is preserved exactly, and all combo
    counts + per-slot tile extractions read the single bf16 plane (class
    values <= 63 are exact in bf16; the one-hot extraction matmul picks
    exactly one element per row, so reconstruction is exact).
    """
    _check_ascending(radii, hmaxs)
    c, n = d2.shape
    t = _round_up(n, tile) // tile
    pad = t * tile - n
    cls = _class_plane(xr, d2, radii, hmin, hmaxs)
    cls = jnp.pad(cls, ((0, 0), (0, pad)), constant_values=63.0)
    cls_t = cls.reshape(c, t, tile).astype(jnp.bfloat16)
    # NOTE (v5e, 2026-08): batching all 16 combos' slot-tile extractions
    # into one (C, RH*k, t) einsum was tried and is 4x SLOWER — the decoded
    # (C, RH, k, tile) f32 cumsum/compare chains materialize ~134 MB per
    # chunk. Per-combo extraction keeps the working set per step small.
    # Grouping a SMALL number of combos per extraction matmul (so the MXU
    # sees M = group*nsample rows instead of 64) is a separate knob:
    # see _first_k_from_class_group / set_query_extract_group.
    combos = [(ri, hi) for ri in range(len(radii)) for hi in range(len(hmaxs))]
    g = max(1, _EXTRACT_GROUP)
    res = {}
    for s in range(0, len(combos), g):
        grp = combos[s:s + g]
        for combo, out in zip(grp, _first_k_from_class_group(cls_t, grp, nsample)):
            res[combo] = out
    return jnp.stack(
        [
            jnp.stack([res[(ri, hi)] for hi in range(len(hmaxs))], axis=0)
            for ri in range(len(radii))
        ],
        axis=0,
    )  # (R, H, C, nsample)


# how many combos share one slot-tile extraction matmul in _multi_first_k.
# 1 = the round-2 per-combo path. Grouping raises the extraction matmul's M
# from nsample (=64, ~half MXU sublane utilization) to group*nsample while
# keeping the decode/cumsum chains per-combo (the working-set failure mode
# of the all-16 batching). Trace-time constant; set before jit
# (GB_QUERY_EXTRACT_GROUP env knob for A/B tools).
_EXTRACT_GROUP = int(_os.environ.get("GB_QUERY_EXTRACT_GROUP", "1"))


def set_query_extract_group(n: int) -> None:
    """Set how many combos share one extraction matmul (see _EXTRACT_GROUP)."""
    global _EXTRACT_GROUP
    if n < 1:
        raise ValueError(f"extract group must be >= 1: {n}")
    _EXTRACT_GROUP = n


def _first_k_from_class_group(cls_t: jnp.ndarray, grp, nsample: int):
    """first-k-by-index from the bf16 class plane for a GROUP of combos
    (see _multi_first_k). Returns one (C, nsample) int32 array per combo.

    Same two-level rank-position selection as _first_k_from_tiled, but the
    per-slot tile extraction pulls CLASS values (exact one-hot matmul) and
    decodes the hit bit locally, so the only (C, N)-sized operand every
    combo touches is the shared class plane. All combos in ``grp`` share
    ONE extraction matmul (one-hots concatenated along k) so the MXU runs
    at M = len(grp)*nsample; the per-combo cumsum/compare chains are left
    separate to bound the live working set.
    """
    c, t, tile = cls_t.shape
    clsf = cls_t.astype(jnp.float32)
    cls_div = jnp.floor(clsf * 0.125)
    cls_mod = clsf - cls_div * 8.0
    js = jnp.arange(nsample, dtype=jnp.int32)
    onehots, tjs, bases, counts = [], [], [], []
    for ri, hi in grp:
        hit = (cls_div <= ri + 0.5) & (cls_mod <= hi + 0.5)
        tile_cnt = _tile_count(hit)  # (C, t)
        tile_cum = jnp.cumsum(tile_cnt, axis=-1)
        counts.append(tile_cum[..., -1:])
        tj = jnp.sum((tile_cum[..., None] <= js).astype(jnp.int32), axis=-2)
        tj = jnp.minimum(tj, t - 1)
        tjs.append(tj)
        onehots.append(jax.nn.one_hot(tj, t, dtype=jnp.bfloat16))  # (C, k, t)
        excl = tile_cum - tile_cnt  # exclusive cumsum
        # base via the one-hot matvec, NOT take_along_axis: the gather
        # lowering breaks XLA's fusion grouping here and costs ~3x on the
        # whole query (measured v5e 2026-08: 71.6 ms vs 22.5 ms total)
        bases.append(
            jnp.einsum(
                "...kt,...t->...k",
                onehots[-1].astype(jnp.float32),
                excl.astype(jnp.float32),
            ).astype(jnp.int32)
        )
    oh = onehots[0] if len(grp) == 1 else jnp.concatenate(onehots, axis=-2)
    # extract the slot tiles' CLASS values: exactly one 1 per one-hot row,
    # bf16 products of integer-valued operands <= 63 are exact
    tiles_cls = jnp.einsum(
        "...kt,...tl->...kl", oh, cls_t,
        preferred_element_type=jnp.float32,
    )  # (C, len(grp)*k, tile)
    outs = []
    for i, (ri, hi) in enumerate(grp):
        tc = tiles_cls[..., i * nsample:(i + 1) * nsample, :]
        tc_div = jnp.floor(tc * 0.125)
        tc_mod = tc - tc_div * 8.0
        tiles = ((tc_div <= ri + 0.5) & (tc_mod <= hi + 0.5)).astype(jnp.float32)
        local_cs = jnp.cumsum(tiles, axis=-1)
        r = (js + 1 - bases[i])[..., None].astype(jnp.float32)
        pos_local = jnp.sum((local_cs < r).astype(jnp.int32), axis=-1)
        pos = tjs[i] * tile + pos_local
        pad = jnp.where(counts[i] > 0, pos[..., 0:1], 0)
        outs.append(jnp.where(js < counts[i], pos, pad).astype(jnp.int32))
    return outs


def _first_k_from_class(cls_t: jnp.ndarray, ri: int, hi: int, nsample: int) -> jnp.ndarray:
    """Single-combo view of _first_k_from_class_group (kept for tests)."""
    return _first_k_from_class_group(cls_t, [(ri, hi)], nsample)[0]


# default batch-chunk for the query vmaps when the call site passes
# batch_chunk=None. 4 is the single-device fast-path shape; SPMD callers
# (train loop, multichip dryrun) raise it to 4 * n_data_shards via
# set_query_batch_chunk so a chunk never slices INSIDE the sharded batch
# axis — a global slice narrower than the shard count would leave devices
# idle per chunk (GSPMD masks them out), serializing the query.
_DEFAULT_BATCH_CHUNK = 4


def set_query_batch_chunk(n: int) -> None:
    """Set the default query batch-chunk (baked into jaxprs at trace time).

    Use 4 * n_data_shards when tracing under a data-sharded mesh; 4 on a
    single device (the v5e reduce-fusion fast-path shape, docs/NOTES.md)."""
    global _DEFAULT_BATCH_CHUNK
    if n < 1:
        raise ValueError(f"batch chunk must be >= 1: {n}")
    _DEFAULT_BATCH_CHUNK = n


def _batch_chunked_vmap(fn, args, batch_chunk: int | None):
    """vmap fn over the leading batch axis in slices of <= batch_chunk rows,
    statically unrolled.

    The rank-position selection's count/cumsum reduce fusions fall off
    XLA's fast path when the vmapped batch dim exceeds 4 on v5e (measured
    2026-08-17: the ~180 convert_reduce fusions of a bs=8 forward cost
    37.2 ms vs 2.9 ms at bs=4 — 12.8x at identical op count, the whole
    bs>4 throughput collapse). Chunking the batch keeps every reduce at
    the fast-path shape; same total work, linear scaling restored."""
    if batch_chunk is None:
        batch_chunk = _DEFAULT_BATCH_CHUNK
    b = args[0].shape[0]
    if b <= batch_chunk:
        return jax.vmap(fn)(*args)
    outs = []
    for s in range(0, b, batch_chunk):
        e = min(s + batch_chunk, b)
        outs.append(jax.vmap(fn)(*(a[s:e] for a in args)))
    return jnp.concatenate(outs, axis=0)


def _chunked_centers(fn, centers_like, chunk: int):
    """Run fn over center chunks of a pytree whose leaves lead with the m
    axis. Statically unrolled (few chunks; a lax.map here nests a scan under
    vmap, which the TPU compiler handles far worse than the flat unroll)."""
    m = jax.tree_util.tree_leaves(centers_like)[0].shape[0]
    m_pad = _round_up(m, chunk)
    padded = jax.tree_util.tree_map(
        lambda a: jnp.pad(a, [(0, m_pad - m)] + [(0, 0)] * (a.ndim - 1)), centers_like
    )
    outs = []
    for i in range(m_pad // chunk):
        piece = jax.tree_util.tree_map(
            lambda a: lax.slice_in_dim(a, i * chunk, (i + 1) * chunk, axis=0),
            padded,
        )
        outs.append(fn(piece))
    out = jnp.concatenate(outs, axis=0)[:m]
    return out


@functools.partial(
    jax.jit, static_argnames=("nsample", "order", "chunk", "batch_chunk")
)
def ball_query(
    xyz: jnp.ndarray,
    centers: jnp.ndarray,
    radius: float,
    nsample: int,
    *,
    valid: jnp.ndarray | None = None,
    order: str = "index",
    chunk: int = 512,
    batch_chunk: int | None = None,
) -> jnp.ndarray:
    """Fixed-radius neighbor indices.

    Args:
      xyz: (B, N, 3) support points.
      centers: (B, M, 3) query centers.
      radius: ball radius.
      nsample: neighbors per center (static).
      valid: optional (B, N) bool mask; invalid points never match.
      order: 'index' (reference semantics) or 'nearest'.

    Returns:
      (B, M, nsample) int32 indices into N.
    """
    r2 = jnp.float32(radius * radius)

    def per_batch(args):
        pts, ctr, vld = args
        # coordinate-planes form: the (C, N, 3) delta + minor-3 reduce
        # lowers to a TPU contraction whose batch-in-sublanes (C-minor)
        # output layout forces a transpose copy of every (C, N) hit plane
        # downstream (measured 2026-08-20: ~2.5 ms/forward across the
        # queries). Three (C, N) elementwise planes keep N minor
        # everywhere. Bit-exact: d2 accumulates in the same k order and
        # 0 + x == x.
        pts_t = pts.T  # (3, N)

        def per_chunk(c):
            dx = c[:, 0:1] - pts_t[0][None, :]
            dy = c[:, 1:2] - pts_t[1][None, :]
            dz = c[:, 2:3] - pts_t[2][None, :]
            d2 = dx * dx + dy * dy + dz * dz
            hit = d2 < r2
            if vld is not None:
                hit = jnp.logical_and(hit, vld[None, :])
            return _select(hit, d2, nsample, order)

        return _chunked_centers(per_chunk, ctr, chunk)

    if valid is None:
        return _batch_chunked_vmap(
            lambda p, c: per_batch((p, c, None)), (xyz, centers), batch_chunk
        )
    return _batch_chunked_vmap(
        lambda p, c, v: per_batch((p, c, v)), (xyz, centers, valid), batch_chunk
    )


def _rot_planes(pts, ctr, rot):
    """Gripper-frame coordinate planes for one chunk of centers.

    pts (N,3), ctr (C,3), rot (C,3,3) -> (xr, d2) as (C, N) planes, where
    p' = R^T (p - c) (columns of R are the gripper frame axes) and
    d2 = y'^2 + z'^2. Planes-form FMAs, NOT an einsum: the "cnk,ck->cn"
    contraction lowers to a TPU convolution whose batch-in-sublanes
    (C-minor) output layout forces a transpose copy on every consumer of
    the (C, N) planes (measured 2026-08-20, ~2.5 ms/forward across the
    queries). Bit-exact vs the einsum form on CPU: (p-c) == -(c-p) and
    negation commutes with addition, same k accumulation order.
    """
    px, py, pz = pts[:, 0][None, :], pts[:, 1][None, :], pts[:, 2][None, :]
    dx = px - ctr[:, 0:1]
    dy = py - ctr[:, 1:2]
    dz = pz - ctr[:, 2:3]
    xr = dx * rot[:, 0:1, 0] + dy * rot[:, 1:2, 0] + dz * rot[:, 2:3, 0]
    yr = dx * rot[:, 0:1, 1] + dy * rot[:, 1:2, 1] + dz * rot[:, 2:3, 1]
    zr = dx * rot[:, 0:1, 2] + dy * rot[:, 1:2, 2] + dz * rot[:, 2:3, 2]
    return xr, yr * yr + zr * zr


def _cyl_hits(pts, ctr, rot, r2, hmin, hmax, vld):
    """Rotated-frame hit mask for one chunk of centers.

    pts (N,3), ctr (C,3), rot (C,3,3). Reference geometry
    (cylinder_query_gpu.cu:56-75): p' = R^T (p - c); hit iff
    y'^2+z'^2 < r^2 and hmin < x' < hmax.
    """
    xr, d2 = _rot_planes(pts, ctr, rot)
    hit = (d2 < r2) & (xr > hmin) & (xr < hmax)
    if vld is not None:
        hit = jnp.logical_and(hit, vld[None, :])
    return hit, d2


@functools.partial(
    jax.jit, static_argnames=("nsample", "order", "chunk", "batch_chunk")
)
def cylinder_query(
    xyz: jnp.ndarray,
    centers: jnp.ndarray,
    rot: jnp.ndarray,
    radius: float,
    hmin: float,
    hmax: float,
    nsample: int,
    *,
    valid: jnp.ndarray | None = None,
    order: str = "index",
    chunk: int = 256,
    batch_chunk: int | None = None,
) -> jnp.ndarray:
    """Gripper-aligned cylinder neighbor indices.

    Args:
      xyz: (B, N, 3); centers: (B, M, 3); rot: (B, M, 3, 3) gripper->world.

    Returns: (B, M, nsample) int32.
    """
    r2 = jnp.float32(radius * radius)

    def per_batch(pts, ctr, rr, vld):
        def per_chunk(args):
            c, rc = args
            hit, d2 = _cyl_hits(pts, c, rc, r2, hmin, hmax, vld)
            return _select(hit, d2, nsample, order)

        return _chunked_centers(per_chunk, (ctr, rr), chunk)

    if valid is None:
        return _batch_chunked_vmap(
            lambda p, c, rr: per_batch(p, c, rr, None),
            (xyz, centers, rot),
            batch_chunk,
        )
    return _batch_chunked_vmap(per_batch, (xyz, centers, rot, valid), batch_chunk)


@functools.partial(
    jax.jit,
    static_argnames=(
        "radii", "hmaxs", "nsample", "order", "chunk", "tile", "impl",
        "interpret", "batch_chunk",
    ),
)
def multi_cylinder_query(
    xyz: jnp.ndarray,
    centers: jnp.ndarray,
    rot: jnp.ndarray,
    radii: tuple,
    hmin: float,
    hmaxs: tuple,
    nsample: int,
    *,
    order: str = "index",
    chunk: int = 256,
    tile: int = 128,
    impl: str = "auto",
    interpret: bool = False,
    batch_chunk: int | None = None,
) -> jnp.ndarray:
    """All (radius, hmax) cylinder queries in one pass over the cloud.

    The reference grasp head launches len(radii)*len(hmaxs)=16 independent
    cylinder_query kernels per forward (TrainModel/graspbalance.py:104-107,
    modules.py:104-111), each recomputing the same rotated coordinates. Here
    the rotation/distance work is done once per center chunk and reused for
    all 16 masks.

    impl: 'auto' (= 'xla') | 'xla' | 'pallas_select'. Both index paths are
    bit-exact; the selection-only Pallas kernel measured ~4x SLOWER than the
    fused XLA path on v5e (91.8 vs 21.2 ms e2e at bench shapes, 2026-08-17:
    materializing the (B, M, N) class plane to HBM costs more than XLA's
    fused chunked recompute — see docs/NOTES.md), so it stays flag-gated
    for study, never the default.

    Returns: (B, len(radii), len(hmaxs), M, nsample) int32.
    """

    n_r, n_h = len(radii), len(hmaxs)
    if impl == "auto":
        impl = "xla"
    if impl == "pallas_select" and order == "index":
        return _multi_cylinder_query_pallas(
            xyz, centers, rot, radii, hmin, hmaxs, nsample, chunk=chunk,
            interpret=interpret,
        )

    def per_batch(pts, ctr, rr):
        def per_chunk(args):
            c, rc = args
            # planes-form rotation (see _rot_planes): the einsum lowers to
            # a C-minor-layout convolution that forces a transpose copy of
            # the class plane per chunk (132 copies, 2.5 ms/forward).
            xr, d2 = _rot_planes(pts, c, rc)
            if order == "index":
                return _multi_first_k(
                    xr, d2, radii, hmin, hmaxs, nsample, tile=tile
                )
            outs = []
            for radius in radii:
                row = []
                for hmax in hmaxs:
                    hit = (d2 < radius * radius) & (xr > hmin) & (xr < hmax)
                    row.append(_select(hit, d2, nsample, order))
                outs.append(jnp.stack(row, axis=0))
            return jnp.stack(outs, axis=0)  # (R, H, C, nsample)

        out = _chunked_centers_leading(per_chunk, (ctr, rr), chunk, len(radii), len(hmaxs), nsample)
        return out

    return _batch_chunked_vmap(per_batch, (xyz, centers, rot), batch_chunk)


def _multi_cylinder_query_pallas(
    xyz, centers, rot, radii, hmin, hmaxs, nsample, *, chunk: int = 256,
    interpret: bool = False,
):
    """index-order multi-cylinder query via the selection-only Pallas kernel
    (ops/pallas/select_kernel.py): XLA computes the rotated coordinates and
    the shared bf16 class plane (chunked, MXU einsums); the kernel runs the
    16 combos' rank-position selection VMEM-resident. Bit-exact vs the XLA
    path (tests/test_multicyl_kernel.py)."""
    from graspbalance_tpu.ops.pallas.select_kernel import multicyl_select

    _check_ascending(radii, hmaxs)
    b, m, _ = centers.shape
    n = xyz.shape[1]

    def per_batch(pts, ctr, rr):
        def per_chunk(args):
            c, rc = args
            xr, d2 = _rot_planes(pts, c, rc)
            return _class_plane(xr, d2, radii, hmin, hmaxs).astype(jnp.bfloat16)

        return _chunked_centers(per_chunk, (ctr, rr), chunk)

    cls = jax.vmap(per_batch)(xyz, centers, rot)  # (B, M, N) bf16
    out = multicyl_select(
        cls.reshape(b * m, n), len(radii), len(hmaxs), nsample,
        interpret=interpret,
    )  # (B*M, RH, k)
    out = out.reshape(b, m, len(radii), len(hmaxs), nsample)
    return jnp.transpose(out, (0, 2, 3, 1, 4))


def _chunked_centers_leading(fn, centers_like, chunk, n_r, n_h, nsample):
    """Like _chunked_centers but fn returns (R, H, chunk, k); output (R, H, m, k)."""
    m = jax.tree_util.tree_leaves(centers_like)[0].shape[0]
    m_pad = _round_up(m, chunk)
    padded = jax.tree_util.tree_map(
        lambda a: jnp.pad(a, [(0, m_pad - m)] + [(0, 0)] * (a.ndim - 1)), centers_like
    )
    outs = []
    for i in range(m_pad // chunk):
        piece = jax.tree_util.tree_map(
            lambda a: lax.slice_in_dim(a, i * chunk, (i + 1) * chunk, axis=0),
            padded,
        )
        outs.append(fn(piece))  # (R, H, chunk, k)
    return jnp.concatenate(outs, axis=2)[:, :, :m]
