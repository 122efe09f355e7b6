"""Point-axis-sharded FULL DRP backbone forward (VERDICT r4 #8).

Extends parallel/stage1.py from one demonstrated stage to the whole
backbone: clouds too large for one chip's HBM run stage 1 with the point
axis sharded over ICI, and every later stage/block/FP shards its CENTER
(output-row) axis while the small support tensors replicate. The result
bit-matches the unsharded `DRP.apply` eval forward (tested on the 8-device
CPU mesh, tests/test_sharded_ops.py).

Sharding strategy per phase (reference analog: the single-GPU 50k-point
cap, /root/reference/DataProcessing/graspnet_dataset.py:19):

  stage-1 FPS            sharded_fps      O(N) distance buffers shard-local
  stage-1 ball query     sharded_ball_query   exact local-first-k merge
  stage-1 group+MLP+max  shard_map over centers; support xyz replicated
                         (3 floats/point — the one O(N) replicated tensor)
  stages 2-4 SA          shard_map over centers; support (<= 2048 rows
                         after stage 1) replicated, module unchanged
  InvResMLP blocks       shard_map over centers via the chunked-centers
                         form (models/drp.py LocalAggregation/InvResMLP
                         `centers=` args); support replicated
  FP upsampling          shard_map over the query (`unknown`) axis —
                         FeaturePropagation is row-local over it, module
                         unchanged

Every op inside a chunk is row-local over its output rows, so exactness
is structural (the same module code runs on a row subset), not re-derived.
XLA inserts the all-gathers between differently-sharded shard_maps.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.7
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from graspbalance_tpu.nn.sa_fp import FeaturePropagation, SetAbstraction
from graspbalance_tpu.models.drp import InvResMLP
from graspbalance_tpu.parallel.sharded_ops import (
    sharded_ball_query,
    sharded_fps,
)


def _sub_vars(variables: dict, name: str) -> dict:
    out = {"params": variables["params"][name]}
    bs = variables.get("batch_stats", {})
    if name in bs:
        out["batch_stats"] = bs[name]
    return out


def sharded_drp_forward(
    mesh: Mesh,
    drp,
    variables,
    pointcloud: jnp.ndarray,
    *,
    skip_origin: bool = True,
) -> dict:
    """Full point-axis-sharded DRP eval forward.

    mesh: ('data', 'point'); drp: a models/drp.DRP instance (its stage
    table/width config is read, its code is reused via submodule apply);
    variables: DRP.init variables; pointcloud (B, N, 3+) with N and every
    stage npoint divisible by mesh.shape['point'].

    Returns the same dict as drp.apply(variables, pointcloud, train=False):
    input_xyz, sa{1..4}_{xyz,features}, sa1_inds, fp2_features, fp2_xyz,
    fp2_inds — bit-equal on the CPU mesh.
    """
    s_pt = mesh.shape["point"]
    xyz = pointcloud[..., :3]
    assert pointcloud.shape[-1] == 3, "feature-carrying clouds: stage-1 " \
        "feature gather would need sharded support features (not needed " \
        "by the live model, which feeds bare xyz)"
    out = {"input_xyz": xyz, "input_features": None}

    stages = drp.stages
    n0 = stages[0][0]
    inds = sharded_fps(mesh, xyz, n0, skip_origin=skip_origin)
    out["sa1_inds"] = inds

    stage_xyz, stage_feats = [], []
    cur_xyz, cur_feats = xyz, None
    for i, (npoint, radius, nsample, mlp, n_blocks, b_radius, b_nsample) in enumerate(
        stages
    ):
        assert npoint % s_pt == 0
        sa = SetAbstraction(
            npoint=npoint, radius=radius, nsample=nsample, mlp=mlp,
            normalize_xyz=True, query_order=drp.query_order,
            dtype=drp.dtype,
        )
        sa_vars = _sub_vars(variables, f"sa{i + 1}")
        if i == 0:
            # support axis = full cloud: sharded FPS + sharded ball query,
            # then the module over center chunks with replicated support
            new_xyz = jnp.take_along_axis(cur_xyz, inds[..., None], axis=1)
            qidx = sharded_ball_query(mesh, cur_xyz, new_xyz, radius, nsample)

            def sa1_chunk(xyz_rep, inds_l, qidx_l):
                _, feats, _ = sa.apply(
                    sa_vars, xyz_rep, None,
                    inds=inds_l, query_idx=qidx_l, train=False,
                )
                return feats

            cur_feats = shard_map(
                sa1_chunk,
                mesh=mesh,
                in_specs=(P("data"), P("data", "point"), P("data", "point")),
                out_specs=P("data", "point"),
                check_vma=False,
            )(cur_xyz, inds, qidx)
            cur_xyz = new_xyz
        else:
            # support <= 2048 rows: replicate it, shard the center rows
            # (inds is the arange prefix — DRP's nested-prefix sampling)
            b = cur_xyz.shape[0]
            pref = jnp.broadcast_to(
                jnp.arange(npoint, dtype=jnp.int32)[None], (b, npoint)
            )

            def sa_chunk(xyz_rep, feats_rep, inds_l):
                nx, nf, _ = sa.apply(
                    sa_vars, xyz_rep, feats_rep, inds=inds_l, train=False,
                )
                return nx, nf

            cur_xyz, cur_feats = shard_map(
                sa_chunk,
                mesh=mesh,
                in_specs=(P("data"), P("data"), P("data", "point")),
                out_specs=(P("data", "point"), P("data", "point")),
                check_vma=False,
            )(cur_xyz, cur_feats, pref)

        for j in range(n_blocks):
            blk = InvResMLP(
                channels=mlp[-1], radius=b_radius, nsample=b_nsample,
                query_order=drp.query_order, dtype=drp.dtype,
            )
            blk_vars = _sub_vars(variables, f"block{i + 1}_{j}")

            def blk_chunk(xyz_rep, feats_rep, cx_l, cf_l):
                return blk.apply(
                    blk_vars, xyz_rep, feats_rep,
                    centers=cx_l, center_feats=cf_l, train=False,
                )

            # the same arrays enter twice: replicated as support, chunked
            # as centers — shard_map slices per spec
            cur_feats = shard_map(
                blk_chunk,
                mesh=mesh,
                in_specs=(P("data"), P("data"),
                          P("data", "point"), P("data", "point")),
                out_specs=P("data", "point"),
                check_vma=False,
            )(cur_xyz, cur_feats, cur_xyz, cur_feats)

        out[f"sa{i + 1}_xyz"] = cur_xyz
        out[f"sa{i + 1}_features"] = cur_feats
        stage_xyz.append(cur_xyz)
        stage_feats.append(cur_feats)

    def fp_chunk_fn(fp, fp_vars):
        def fp_chunk(x1_l, f1_l, x2_rep, f2_rep):
            return fp.apply(
                fp_vars, x1_l, x2_rep, f1_l, f2_rep, train=False,
            )

        return fp_chunk

    f = stage_feats[3]
    for k, fine in enumerate((2, 1)):  # fp1: -> stage3 rows; fp2: -> stage2

        fp = FeaturePropagation(mlp=(256, 256), dtype=drp.dtype)
        fp_vars = _sub_vars(variables, f"fp{k + 1}")
        f = shard_map(
            fp_chunk_fn(fp, fp_vars),
            mesh=mesh,
            in_specs=(P("data", "point"), P("data", "point"),
                      P("data"), P("data")),
            out_specs=P("data", "point"),
            check_vma=False,
        )(stage_xyz[fine], stage_feats[fine],
          stage_xyz[fine + 1], f)

    out["fp2_features"] = f
    out["fp2_xyz"] = stage_xyz[1]
    out["fp2_inds"] = inds[:, : drp.num_seed]
    return out
