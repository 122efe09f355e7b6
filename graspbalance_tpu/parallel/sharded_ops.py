"""Point-axis (sequence-parallel analog) sharded ops.

SURVEY.md §5: the reference scales point count only on one device; the TPU
equivalent for very large clouds is sharding the point axis across ICI.
Here: ball query with the support points sharded over a 'point' mesh axis —
each shard selects its local first-k hits, an all-gather merges the
candidates, and a small sort recovers the exact global first-k-by-index
result (the global first k hits are always contained in the union of
per-shard first-k hits). Exactness is tested against the unsharded op on
the virtual 8-device CPU mesh.
"""

from __future__ import annotations


import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.7
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from graspbalance_tpu.ops.query import _first_k_by_index

_BIG = jnp.int32(0x3FFFFFFF)


def sharded_ball_query(
    mesh: Mesh,
    xyz: jnp.ndarray,
    centers: jnp.ndarray,
    radius: float,
    nsample: int,
) -> jnp.ndarray:
    """xyz (B, N, 3) sharded (data, point); centers (B, M, 3) sharded
    (data,); returns (B, M, nsample) int32 == ops.ball_query(xyz, centers).
    """
    n = xyz.shape[1]
    n_shards = mesh.shape["point"]
    assert n % n_shards == 0
    local_n = n // n_shards
    r2 = jnp.float32(radius * radius)

    def local_fn(xyz_l, ctr):
        # xyz_l (B, local_n, 3); ctr (B, M, 3)
        sid = lax.axis_index("point")
        delta = ctr[:, :, None, :] - xyz_l[:, None, :, :]
        d2 = jnp.sum(delta * delta, axis=-1)  # (B, M, local_n)
        hit = d2 < r2
        local_idx = _first_k_by_index(hit, nsample)  # (B, M, k) local indices
        count = jnp.sum(hit, axis=-1)  # (B, M)
        js = jnp.arange(nsample, dtype=jnp.int32)
        cand = jnp.where(
            js[None, None, :] < count[..., None],
            local_idx + sid * local_n,
            _BIG,
        )
        all_cand = lax.all_gather(cand, "point", axis=0)  # (S, B, M, k)
        s = all_cand.shape[0]
        merged = jnp.moveaxis(all_cand, 0, 2).reshape(
            cand.shape[0], cand.shape[1], s * nsample
        )
        vals = jnp.sort(merged, axis=-1)[..., :nsample]
        first = jnp.where(vals[..., 0:1] < _BIG, vals[..., 0:1], 0)
        return jnp.where(vals < _BIG, vals, first).astype(jnp.int32)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P("data", "point"), P("data")),
        out_specs=P("data"),
        check_vma=False,  # output is replicated over 'point' post all-gather
    )
    return fn(xyz, centers)


def sharded_fps(
    mesh: Mesh,
    xyz: jnp.ndarray,
    num_samples: int,
    *,
    skip_origin: bool = True,
) -> jnp.ndarray:
    """Exact furthest point sampling with the point axis sharded over ICI.

    xyz (B, N, 3) sharded (data, point) -> (B, num_samples) int32, bit-equal
    to ops.furthest_point_sample on the gathered cloud (greedy max-min, seed
    idx[0]=0, ties to the lowest global index, optional near-origin skip —
    PointNet/_ext_src/src/sampling_gpu.cu:74-234 semantics).

    Per greedy step each shard reduces its local running-min distances; the
    global winner is found with a pmax over the mesh plus a pmin index
    tie-break, and its coordinates are broadcast by a psum of the owner's
    contribution — three scalar-sized collectives per step riding ICI, with
    the O(N) distance buffer staying shard-local. For clouds that fit one
    chip prefer ops/pallas fps; this is the >HBM-cloud path (SURVEY.md §5
    long-context analog).
    """
    b, n, _ = xyz.shape
    n_shards = mesh.shape["point"]
    assert n % n_shards == 0, "point axis must divide evenly across shards"
    local_n = n // n_shards

    def local_fn(xyz_l):  # (B_local, local_n, 3): batch is data-sharded too
        bl = xyz_l.shape[0]
        sid = lax.axis_index("point")
        base = sid * local_n
        gidx = base + jnp.arange(local_n, dtype=jnp.int32)  # (local_n,)
        valid = jnp.ones((bl, local_n), bool)
        if skip_origin:
            valid = jnp.sum(xyz_l * xyz_l, axis=-1) > 1e-3

        def coords_of(best):  # (B,) global index -> (B, 3) via owner psum
            sel = gidx[None, :] == best[:, None]  # (B, local_n)
            contrib = jnp.sum(
                jnp.where(sel[..., None], xyz_l, 0.0), axis=1
            )
            return lax.psum(contrib, "point")

        iota_m = jnp.arange(num_samples, dtype=jnp.int32)
        last0 = coords_of(jnp.zeros((bl,), jnp.int32))  # reference idx[0]=0

        def body(j, carry):
            dist, out, last = carry
            d = jnp.sum(jnp.square(xyz_l - last[:, None, :]), axis=-1)
            dist = jnp.minimum(dist, d)
            cand = jnp.where(valid, dist, -1.0)
            mx = lax.pmax(jnp.max(cand, axis=-1), "point")  # (B,)
            idx_l = jnp.min(
                jnp.where(cand == mx[:, None], gidx[None, :], _BIG), axis=-1
            )
            best = lax.pmin(idx_l, "point").astype(jnp.int32)  # (B,)
            out = jnp.where(iota_m[None, :] == j, best[:, None], out)
            return dist, out, coords_of(best)

        init = (
            jnp.full((bl, local_n), 1e10, jnp.float32),
            jnp.zeros((bl, num_samples), jnp.int32),
            last0,
        )
        _, out, _ = lax.fori_loop(1, num_samples, body, init)
        return out

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P("data", "point"),),
        out_specs=P("data"),
        check_vma=False,  # collectives leave the result replicated on 'point'
    )
    return fn(xyz)
