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
