"""Weight-port validation: the reference torch GraspBalance's state_dict
converts onto our flax tree exactly, and per-head forwards agree with the
reference's own modules (CPU torch) after conversion."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from graspbalance_tpu.models.heads import (
    GraspableDetection,
    GraspParametersHead,
    ToleranceHead,
)
from graspbalance_tpu.nn.layers import SharedMLP

import sys, os  # noqa: E401

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.port_torch_ckpt import convert_state_dict  # noqa: E402
from tests.ref_harness import load_reference_model  # noqa: E402


@pytest.fixture(scope="module")
def ref_model():
    try:
        return load_reference_model()
    except Exception as e:
        pytest.skip(f"reference model unavailable: {e}")


@pytest.fixture(scope="module")
def converted(ref_model):
    torch.manual_seed(0)
    net = ref_model.graspbalance.GraspBalance(
        input_feature_dim=0, num_view=300, num_angle=12, num_depth=4,
        cylinder_radius=0.08, hmin=-0.02, hmax_list=[0.01, 0.02, 0.03, 0.04],
    )
    # randomize every parameter and BN buffer so parity is non-trivial
    # (std 0.1: at 0.5 the assembled forward's deep MLP stacks amplify
    # activations past f32 range and the decoded score overflows to -inf)
    with torch.no_grad():
        for p in net.parameters():
            p.normal_(0.0, 0.1)
        for name, b in net.named_buffers():
            if name.endswith("running_mean"):
                b.normal_(0.0, 0.5)
            elif name.endswith("running_var"):
                b.uniform_(0.5, 2.0)
    net.eval()
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    return net, convert_state_dict(sd)


def test_tree_structure_matches_model(converted):
    """Every reference tensor lands somewhere, and the converted tree is
    exactly our GraspBalance variable tree (paths AND shapes)."""
    from graspbalance_tpu.train.config import Config
    from graspbalance_tpu.train.train_step import build_model

    _, variables = converted
    model = build_model(Config())
    want = jax.eval_shape(
        lambda r, b: model.init(r, b, train=False),
        jax.random.PRNGKey(0),
        {"point_clouds": jnp.zeros((1, 20000, 3), jnp.float32)},
    )
    for col in ("params", "batch_stats"):
        got_paths = {
            jax.tree_util.keystr(p): v.shape
            for p, v in jax.tree_util.tree_flatten_with_path(variables[col])[0]
        }
        want_paths = {
            jax.tree_util.keystr(p): v.shape
            for p, v in jax.tree_util.tree_flatten_with_path(want[col])[0]
        }
        assert got_paths == want_paths, (
            f"{col}: extra={sorted(set(got_paths) - set(want_paths))[:5]} "
            f"missing={sorted(set(want_paths) - set(got_paths))[:5]}"
        )


def test_ported_weights_drive_assembled_forward(converted, rng):
    """Chain the full converted tree through the ASSEMBLED GraspBalance
    forward + pred_decode (per-head parity alone would miss wiring bugs
    between heads): production architecture, reduced cloud size."""
    from graspbalance_tpu.models.decode import pred_decode
    from graspbalance_tpu.train.config import Config, DataConfig
    from graspbalance_tpu.train.train_step import build_model

    _, variables = converted
    model = build_model(Config(data=DataConfig(num_points=2560)))
    cloud = jnp.asarray(
        (rng.random((1, 2560, 3)) - 0.5).astype(np.float32)
    )
    ep = model.apply(variables, {"point_clouds": cloud}, train=False)
    # every endpoint the loss/decoder consumes exists, correctly shaped
    ns = ep["fp2_xyz"].shape[1]
    assert ep["objectness_score"].shape == (1, ns, 2)
    assert ep["view_score"].shape == (1, ns, 300)
    assert ep["grasp_score_pred"].shape == (1, ns, 12, 4)
    assert ep["grasp_tolerance_pred"].shape == (1, ns, 12, 4)
    for k, v in ep.items():
        arr = np.asarray(v)
        if arr.dtype.kind == "f":  # index/bool endpoints have no inf notion
            assert np.all(np.isfinite(arr)), k
    grasps, valid = pred_decode(ep)
    assert grasps.shape == (1, ns, 17)
    assert valid.dtype == jnp.bool_
    # invalid rows carry a -inf score sentinel; everything valid is finite
    g, v = np.asarray(grasps), np.asarray(valid)
    assert np.all(np.isfinite(g[v]))
    assert np.all(np.isfinite(g[..., 1:]))  # geometry columns always finite


def test_graspable_head_forward_parity(converted, rng):
    net, variables = converted
    b, ns, c = 2, 40, 256
    feats = rng.normal(size=(b, c, ns)).astype(np.float32)
    seed_xyz = rng.normal(size=(b, ns, 3)).astype(np.float32)

    with torch.no_grad():
        ref_ep = net.view_estimator.GraspableClasification(
            torch.from_numpy(seed_xyz), torch.from_numpy(feats), {}
        )

    head = GraspableDetection(num_view=300)
    sub = {
        "params": variables["params"]["graspable"],
        "batch_stats": variables["batch_stats"]["graspable"],
    }
    ours = head.apply(
        sub, jnp.asarray(seed_xyz), jnp.asarray(np.moveaxis(feats, 1, 2)),
        train=False,
    )
    np.testing.assert_allclose(
        np.asarray(ours["objectness_score"]),
        np.moveaxis(ref_ep["objectness_score"].numpy(), 1, 2),
        atol=2e-4, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ours["view_score"]), ref_ep["view_score"].numpy(),
        atol=2e-4, rtol=1e-4,
    )
    np.testing.assert_array_equal(
        np.asarray(ours["grasp_top_view_inds"]),
        ref_ep["grasp_top_view_inds"].numpy(),
    )
    np.testing.assert_allclose(
        np.asarray(ours["grasp_top_view_rot"]),
        ref_ep["grasp_top_view_rot"].numpy(), atol=1e-5,
    )


def test_param_and_tolerance_head_forward_parity(converted, rng):
    net, variables = converted
    b, ns, d = 2, 30, 4
    vp = rng.normal(size=(b, 256, ns, d)).astype(np.float32)

    with torch.no_grad():
        ref_ep = net.grasp_generator.GraspParameters(torch.from_numpy(vp), {})
        ref_ep = net.grasp_generator.tolerance(torch.from_numpy(vp), ref_ep)

    vp_ours = jnp.asarray(np.moveaxis(vp, 1, 3))  # (B,Ns,D,256)
    gp = GraspParametersHead().apply(
        {
            "params": variables["params"]["grasp_params"],
            "batch_stats": variables["batch_stats"]["grasp_params"],
        },
        vp_ours, train=False,
    )
    tol = ToleranceHead().apply(
        {
            "params": variables["params"]["tolerance"],
            "batch_stats": variables["batch_stats"]["tolerance"],
        },
        vp_ours, train=False,
    )
    for key in ("grasp_score_pred", "grasp_angle_cls_pred", "grasp_width_pred"):
        np.testing.assert_allclose(
            np.asarray(gp[key]),
            np.moveaxis(ref_ep[key].numpy(), 1, 2),  # (B,A,Ns,D)->(B,Ns,A,D)
            atol=2e-4, rtol=1e-4, err_msg=key,
        )
    np.testing.assert_allclose(
        np.asarray(tol["grasp_tolerance_pred"]),
        np.moveaxis(ref_ep["grasp_tolerance_pred"].numpy(), 1, 2),
        atol=2e-4, rtol=1e-4,
    )


def test_width_group_mlp_forward_parity(converted, rng):
    net, variables = converted
    b, ns, k = 2, 16, 32
    grouped = rng.normal(size=(b, 3, ns, k)).astype(np.float32)

    with torch.no_grad():
        want = net.grasp_generator.WidthGroup1.mlps(torch.from_numpy(grouped))

    mlp = SharedMLP((64, 128, 256))
    sub = {
        "params": variables["params"]["width_grouping"]["mlp_scale0"],
        "batch_stats": variables["batch_stats"]["width_grouping"]["mlp_scale0"],
    }
    ours = mlp.apply(
        sub, jnp.asarray(np.moveaxis(grouped, 1, 3)), train=False
    )  # (B,Ns,K,256)
    np.testing.assert_allclose(
        np.asarray(ours), np.moveaxis(want.numpy(), 1, 3),
        atol=2e-4, rtol=1e-4,
    )
