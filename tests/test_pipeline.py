"""End-to-end inference pipeline test (tiny, CPU): DSN clustering -> OBS
re-seeded GraspBalance forward -> decode -> NMS -> collision filter."""

import numpy as np
import jax
import jax.numpy as jnp

from graspbalance_tpu.data.synthetic import make_batch
from graspbalance_tpu.eval.pipeline import GraspInference, to_grasp_group_array
from graspbalance_tpu.models.dsn import DSN
from graspbalance_tpu.models.graspbalance import GraspBalance
from tests.tiny import TINY_NUM_SEED, TINY_NUM_VIEW, TINY_SCENE, TINY_STAGES


def test_full_pipeline_with_obs():
    batch = make_batch(11, 1, TINY_SCENE)
    cloud = jnp.asarray(batch["point_clouds"])

    model = GraspBalance(
        num_view=TINY_NUM_VIEW, backbone_stages=TINY_STAGES, num_seed=TINY_NUM_SEED
    )
    mvars = model.init(
        jax.random.PRNGKey(0), {"point_clouds": cloud}, train=False
    )
    dsn = DSN(pt_stages=((64, 0.2, 8, 16, 1), (32, 0.4, 8, 32, 1)))
    dvars = dsn.init(jax.random.PRNGKey(1), cloud, train=False)

    infer = GraspInference(model, mvars, dsn, dvars, use_obs=True)
    grasps, keep = infer(cloud)
    assert grasps.shape == (1, TINY_NUM_SEED, 17)
    assert keep.shape == (1, TINY_NUM_SEED)
    assert np.isfinite(grasps).all()

    arr = to_grasp_group_array(grasps[0], keep[0])
    assert arr.ndim == 2 and arr.shape[1] == 17
    # kept grasps pass NMS: pairwise (trans, rot) conflicts absent
    if len(arr) > 1:
        t = arr[:, 13:16]
        d = np.linalg.norm(t[:, None] - t[None], axis=-1)
        rots = arr[:, 4:13].reshape(-1, 3, 3)
        tr = np.einsum("iab,jab->ij", rots, rots)
        ang = np.arccos(np.clip((tr - 1) / 2, -1, 1))
        conflict = (d < 0.03) & (ang < np.deg2rad(30))
        np.fill_diagonal(conflict, False)
        assert not conflict.any()


def test_pipeline_without_obs():
    batch = make_batch(12, 2, TINY_SCENE)
    cloud = jnp.asarray(batch["point_clouds"])
    model = GraspBalance(
        num_view=TINY_NUM_VIEW, backbone_stages=TINY_STAGES, num_seed=TINY_NUM_SEED
    )
    mvars = model.init(jax.random.PRNGKey(0), {"point_clouds": cloud[:1]}, train=False)
    infer = GraspInference(model, mvars)
    grasps, keep = infer(cloud)
    assert grasps.shape == (2, TINY_NUM_SEED, 17)
