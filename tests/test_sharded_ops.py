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
