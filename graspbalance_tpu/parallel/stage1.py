"""Point-axis-sharded DRP stage-1 forward (SURVEY.md §5 long-context
analog, VERDICT r3 #10).

The reference scales cloud size only on one GPU; the TPU answer for clouds
beyond one chip is sharding the POINT axis over ICI. Stage 1 is the only
part of the backbone that touches all N points (everything after runs at
npoint=2048 rows), and its three phases shard differently:

  1. FPS over the sharded cloud      -> parallel/sharded_ops.sharded_fps
     (exact: per-step pmax/pmin/psum scalar collectives, O(N) distance
     buffers stay shard-local)
  2. ball query, support sharded     -> sharded_ball_query (exact: local
     first-k + all-gather + index-sort merge)
  3. grouping gather + MLP + max     -> the SetAbstraction module itself,
     shard_mapped over the CENTER axis (each shard computes its centers'
     neighborhoods; the support xyz is replicated — 3 floats/point, the
     one tensor that must be visible to every shard's gather)

The module runs UNCHANGED inside shard_map (flax apply is pure jax), fed
precomputed `inds`/`query_idx` chunks — so sharded and unsharded paths
share one implementation and exactness is structural, not re-derived.
Tested against the unsharded SetAbstraction on the virtual 8-device CPU
mesh in tests/test_sharded_ops.py.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.7
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from graspbalance_tpu.parallel.sharded_ops import (
    sharded_ball_query,
    sharded_fps,
)


def sharded_sa_forward(
    mesh: Mesh,
    sa,
    variables,
    xyz: jnp.ndarray,
    *,
    skip_origin: bool = True,
):
    """Point-axis-sharded forward of one SetAbstraction stage.

    mesh: ('data', 'point') mesh; sa: a SetAbstraction module (features=None
    stage — DRP stage 1's shape); variables: its params/batch_stats;
    xyz (B, N, 3) with N divisible by mesh.shape['point'] and npoint
    divisible likewise. Returns (new_xyz (B, npoint, 3), new_feats
    (B, npoint, C_out), inds (B, npoint)) == sa.apply on one device.
    """
    npoint = sa.npoint
    n_centers_shards = mesh.shape["point"]
    assert npoint % n_centers_shards == 0

    inds = sharded_fps(mesh, xyz, npoint, skip_origin=skip_origin)
    new_xyz = jnp.take_along_axis(xyz, inds[..., None], axis=1)
    idx = sharded_ball_query(mesh, xyz, new_xyz, sa.radius, sa.nsample)

    def chunk_fn(xyz_rep, inds_l, idx_l):
        # xyz_rep (B, N, 3) replicated support; inds_l (B, npoint/S);
        # idx_l (B, npoint/S, K): the module computes this chunk's
        # neighborhoods + MLP + max exactly as the unsharded call would
        _, feats, _ = sa.apply(
            variables, xyz_rep, None,
            inds=inds_l, query_idx=idx_l, train=False,
        )
        return feats

    fn = shard_map(
        chunk_fn,
        mesh=mesh,
        in_specs=(P("data", None, None), P("data", "point"),
                  P("data", "point")),
        out_specs=P("data", "point"),
        check_vma=False,  # xyz is replicated over 'point' by its spec
    )
    new_feats = fn(xyz, inds, idx)
    return new_xyz, new_feats, inds
