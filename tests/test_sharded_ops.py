"""Point-axis sharded ops vs unsharded references (virtual 8-dev mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graspbalance_tpu import ops
from graspbalance_tpu.parallel.mesh import make_mesh
from graspbalance_tpu.parallel.sharded_ops import sharded_ball_query


@pytest.mark.parametrize("n_point", [2, 4])
def test_sharded_ball_query_exact(rng, n_point):
    n_data = 8 // n_point
    mesh = make_mesh(n_data, n_point)
    b, n, m = n_data, 512, 64
    pts = (rng.random((b, n, 3), dtype=np.float32) - 0.5)
    ctr = pts[:, :m, :]
    want = np.asarray(ops.ball_query(jnp.asarray(pts), jnp.asarray(ctr), 0.2, 16))
    with mesh:
        got = np.asarray(
            sharded_ball_query(mesh, jnp.asarray(pts), jnp.asarray(ctr), 0.2, 16)
        )
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("skip_origin", [True, False])
def test_sharded_fps_exact(rng, skip_origin):
    from graspbalance_tpu.parallel.sharded_ops import sharded_fps

    mesh = make_mesh(2, 4)
    b, n, m = 2, 256, 32
    pts = (rng.random((b, n, 3), dtype=np.float32) - 0.5)
    if skip_origin:
        pts[:, 5] = 0.0  # near-origin points the variant-A kernel skips
    want = np.asarray(
        ops.furthest_point_sample(
            jnp.asarray(pts), m, skip_origin=skip_origin
        )
    )
    with mesh:
        got = np.asarray(
            sharded_fps(mesh, jnp.asarray(pts), m, skip_origin=skip_origin)
        )
    np.testing.assert_array_equal(got, want)


def test_sharded_full_drp_matches_unsharded(rng):
    """Point-axis-sharded FULL DRP backbone (parallel/backbone.py,
    VERDICT r4 #8): stage-1 sharded over the support axis, stages 2-4 +
    InvResMLP blocks sharded over their center rows (chunked-centers
    module form), FP sharded over the query axis — the composed forward
    must match the unsharded DRP.apply eval forward on every output."""
    from graspbalance_tpu.models.drp import DRP
    from graspbalance_tpu.parallel.backbone import sharded_drp_forward

    mesh = make_mesh(2, 4)
    b, n = 2, 1024
    # tiny stage table, same structure as DRP_STAGES (every npoint
    # divisible by the 4-way point axis)
    stages = (
        (128, 0.1, 16, (16, 16, 32), 2, 0.2, 16),
        (64, 0.2, 8, (16, 16, 32), 2, 0.3, 8),
        (32, 0.3, 8, (16, 16, 32), 1, 0.4, 8),
        (16, 0.4, 8, (16, 16, 32), 1, 0.5, 8),
    )
    pts = jnp.asarray((rng.random((b, n, 3), dtype=np.float32) - 0.5))
    drp = DRP(stages=stages, num_seed=64)
    variables = drp.init(jax.random.PRNGKey(0), pts, train=False)

    want = drp.apply(variables, pts, train=False)
    with mesh:
        got = jax.jit(
            lambda v, p: sharded_drp_forward(mesh, drp, v, p)
        )(variables, pts)
    for k in ("sa1_inds", "fp2_inds"):
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]))
    for k in ("sa1_xyz", "sa2_xyz", "sa3_xyz", "sa4_xyz", "fp2_xyz"):
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]))
    for k in ("sa1_features", "sa2_features", "sa3_features",
              "sa4_features", "fp2_features"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=1e-6, atol=1e-6,
            err_msg=k,
        )


def test_sharded_sa_stage1_matches_unsharded(rng):
    """Point-axis-sharded DRP stage-1 SA forward (parallel/stage1.py):
    sharded FPS + sharded ball query + the SetAbstraction module itself
    shard_mapped over centers must reproduce the single-device module
    exactly (FPS/query indices are exact by construction; the per-center
    MLP+max math is identical — the center axis is batch-like in every
    dot, so partitioning it does not reassociate anything)."""
    from graspbalance_tpu.nn.sa_fp import SetAbstraction
    from graspbalance_tpu.parallel.stage1 import sharded_sa_forward

    mesh = make_mesh(2, 4)
    b, n = 2, 512
    pts = jnp.asarray((rng.random((b, n, 3), dtype=np.float32) - 0.5))
    sa = SetAbstraction(
        npoint=64, radius=0.2, nsample=16, mlp=(16, 16, 32),
        normalize_xyz=True,
    )
    variables = sa.init(jax.random.PRNGKey(0), pts, None)

    want_xyz, want_feats, want_inds = sa.apply(variables, pts, None)
    with mesh:
        got_xyz, got_feats, got_inds = sharded_sa_forward(
            mesh, sa, variables, pts
        )
    np.testing.assert_array_equal(np.asarray(got_inds), np.asarray(want_inds))
    np.testing.assert_array_equal(np.asarray(got_xyz), np.asarray(want_xyz))
    np.testing.assert_allclose(
        np.asarray(got_feats), np.asarray(want_feats), rtol=1e-6, atol=1e-6
    )
