"""End-to-end forward parity: the reference's OWN assembled GraspBalance
(TrainModel/graspbalance.py, eval mode, native ops supplied by the pure-torch
shim tools/ref_torch_shim.py) vs our jax GraspBalance with the ported
weights, on the same cloud.

This closes the gap between per-head parity (test_weight_port.py) and full
parity: FPS, the nested-prefix stage sampling, all ball/cylinder queries,
the 4-stage DRP, head wiring, multi-scale gated fusion and decode are all
exercised in ONE comparison against reference code executing end-to-end.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402

from tools.port_torch_ckpt import convert_state_dict  # noqa: E402

N_POINTS = 2560  # >= 2048 (stage-1 FPS width, TrainModel/drp.py:162)


@pytest.fixture(scope="module")
def ref_net():
    try:
        from tests.ref_harness import load_reference_model

        ref_model = load_reference_model()
        from tools import ref_torch_shim

        ref_torch_shim.install()
    except Exception as e:  # pragma: no cover - toolchain-dependent
        pytest.skip(f"reference model unavailable: {e}")
    torch.manual_seed(0)
    net = ref_model.graspbalance.GraspBalance(
        input_feature_dim=0, num_view=300, num_angle=12, num_depth=4,
        cylinder_radius=0.08, hmin=-0.02, hmax_list=[0.01, 0.02, 0.03, 0.04],
        is_training=False,
    )
    with torch.no_grad():
        for p in net.parameters():
            p.normal_(0.0, 0.1)
        for name, b in net.named_buffers():
            if name.endswith("running_mean"):
                b.normal_(0.0, 0.5)
            elif name.endswith("running_var"):
                b.uniform_(0.5, 2.0)
    net.eval()
    return net, load_reference_model()


def test_full_forward_matches_reference(ref_net, rng):
    from graspbalance_tpu.train.config import Config, DataConfig
    from graspbalance_tpu.train.train_step import build_model

    net, ref_model = ref_net
    cloud = (rng.random((1, N_POINTS, 3)) - 0.5).astype(np.float32)

    with torch.no_grad():
        ref_ep = net({"point_clouds": torch.from_numpy(cloud.copy())})

    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    variables = convert_state_dict(sd)
    model = build_model(Config(data=DataConfig(num_points=N_POINTS)))
    ep = model.apply(variables, {"point_clouds": jnp.asarray(cloud)}, train=False)

    # geometry/selection must be IDENTICAL (same FPS + query semantics)
    np.testing.assert_array_equal(
        np.asarray(ep["fp2_xyz"]), ref_ep["fp2_xyz"].numpy()
    )
    np.testing.assert_array_equal(
        np.asarray(ep["grasp_top_view_inds"]),
        ref_ep["grasp_top_view_inds"].numpy(),
    )
    # head outputs: f32 accumulation-order differences only
    np.testing.assert_allclose(
        np.asarray(ep["objectness_score"]),
        np.moveaxis(ref_ep["objectness_score"].numpy(), 1, 2),
        atol=2e-3, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(ep["view_score"]),
        ref_ep["view_score"].numpy(),
        atol=2e-3, rtol=1e-3,
    )
    for key in (
        "grasp_score_pred",
        "grasp_angle_cls_pred",
        "grasp_width_pred",
        "grasp_tolerance_pred",
    ):
        np.testing.assert_allclose(
            np.asarray(ep[key]),
            np.moveaxis(ref_ep[key].numpy(), 1, 2),
            atol=2e-3, rtol=1e-3, err_msg=key,
        )

    # decoded grasp arrays through each side's own pred_decode
    from graspbalance_tpu.models.decode import pred_decode

    want = [g.numpy() for g in ref_model.graspbalance.pred_decode(ref_ep)]
    grasps, valid = pred_decode(ep)
    grasps, valid = np.asarray(grasps), np.asarray(valid)
    got = grasps[0][valid[0]]
    assert got.shape == want[0].shape
    # column 0 is the score (f32 noise only); geometry columns must agree
    np.testing.assert_allclose(got, want[0], atol=5e-3, rtol=1e-2)
