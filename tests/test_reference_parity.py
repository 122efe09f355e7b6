"""Parity against the reference's OWN torch code (CPU).

Runs /root/reference's label_generation.py, TrainModel/loss.py and
pred_decode (graspbalance.py:139-192) on shared random inputs via
tests/ref_harness.py and asserts fp32 closeness against labels/label_gen.py,
labels/losses.py and models/decode.py. This replaces "we transcribed the
semantics" with "the reference agrees" (the round-1 oracles remain as
fast sanity checks).
"""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from graspbalance_tpu.labels.label_gen import (
    match_grasp_view_and_label,
    process_grasp_labels,
)
from graspbalance_tpu.labels.losses import get_loss
from graspbalance_tpu.models.decode import pred_decode

from tests.ref_harness import load_reference

B, NS, V, A, D = 2, 32, 60, 12, 4
MAX_OBJ, MAX_PTS = 4, 64


@pytest.fixture(scope="module")
def ref():
    try:
        return load_reference()
    except Exception as e:  # toolchain missing -> skip, don't fail
        pytest.skip(f"reference harness unavailable: {e}")


def _random_pose(rng):
    a = rng.normal(size=(3, 3))
    q, _ = np.linalg.qr(a)
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    t = (rng.random(3) - 0.5) * 0.3
    return np.concatenate([q, t[:, None]], axis=1).astype(np.float32)


def make_scenario(seed=0):
    """One shared random scenario in both input formats."""
    rng = np.random.default_rng(seed)
    ref_ep = {
        "object_poses_list": [],
        "grasp_points_list": [],
        "grasp_labels_list": [],
        "grasp_offsets_list": [],
        "grasp_tolerance_list": [],
    }
    ours = {
        "object_poses": np.zeros((B, MAX_OBJ, 3, 4), np.float32),
        "obj_mask": np.zeros((B, MAX_OBJ), bool),
        "grasp_points": np.zeros((B, MAX_PTS, 3), np.float32),
        "grasp_pt_obj": np.zeros((B, MAX_PTS), np.int32),
        "grasp_pt_mask": np.zeros((B, MAX_PTS), bool),
        "grasp_labels": np.zeros((B, MAX_PTS, V, A, D), np.float32),
        "grasp_widths": np.zeros((B, MAX_PTS, V, A, D), np.float32),
        "grasp_tolerance": np.zeros((B, MAX_PTS, V, A, D), np.float32),
    }
    seeds = (rng.random((B, NS, 3)) - 0.5).astype(np.float32) * 0.4

    for i in range(B):
        n_obj = int(rng.integers(2, MAX_OBJ))
        poses, pts_l, lab_l, off_l, tol_l = [], [], [], [], []
        p_cursor = 0
        for o in range(n_obj):
            np_i = int(rng.integers(8, 16))
            pose = _random_pose(rng)
            pts = (rng.random((np_i, 3)) - 0.5).astype(np.float32) * 0.1
            lab = (rng.random((np_i, V, A, D)) * 1.2).astype(np.float32)
            lab[rng.random(lab.shape) < 0.2] = 0.0  # some non-graspable
            off = rng.random((np_i, V, A, D, 3)).astype(np.float32)
            off[..., 2] = off[..., 2] * 0.11 + 0.005  # widths, some > max
            tol = (rng.random((np_i, V, A, D)) * 0.05).astype(np.float32)
            poses.append(torch.from_numpy(pose))
            pts_l.append(torch.from_numpy(pts))
            lab_l.append(torch.from_numpy(lab))
            off_l.append(torch.from_numpy(off))
            tol_l.append(torch.from_numpy(tol))

            ours["object_poses"][i, o] = pose
            ours["obj_mask"][i, o] = True
            sl = slice(p_cursor, p_cursor + np_i)
            ours["grasp_points"][i, sl] = pts
            ours["grasp_pt_obj"][i, sl] = o
            ours["grasp_pt_mask"][i, sl] = True
            ours["grasp_labels"][i, sl] = lab
            ours["grasp_widths"][i, sl] = off[..., 2]
            ours["grasp_tolerance"][i, sl] = tol
            p_cursor += np_i
        ref_ep["object_poses_list"].append(poses)
        ref_ep["grasp_points_list"].append(pts_l)
        ref_ep["grasp_labels_list"].append(lab_l)
        ref_ep["grasp_offsets_list"].append(off_l)
        ref_ep["grasp_tolerance_list"].append(tol_l)

    ref_ep["input_xyz"] = torch.zeros(B, 8, 3)
    ref_ep["fp2_xyz"] = torch.from_numpy(seeds)
    top_views = rng.integers(0, V, size=(B, NS))
    return ref_ep, ours, seeds, top_views, rng


KEYMAP = [  # ours -> reference (after its process_grasp_labels)
    ("batch_grasp_point", "batch_grasp_point"),
    ("batch_grasp_view", "batch_grasp_view"),
    ("batch_grasp_view_rot", "batch_grasp_view_rot"),
    ("batch_grasp_label", "batch_grasp_label"),
    ("batch_grasp_tolerance", "batch_grasp_tolerance"),
    ("batch_grasp_view_label", "batch_grasp_view_label"),
]


def run_both_label_pipelines(ref, scenario):
    ref_ep, ours, seeds, top_views, rng = scenario
    ref_ep = dict(ref_ep)
    ref_out = ref.label_generation.process_grasp_labels(ref_ep)

    labels = {k: jnp.asarray(v) for k, v in ours.items()}
    our_out = process_grasp_labels(jnp.asarray(seeds), labels)
    return ref_out, our_out, top_views


class TestLabelParity:
    def test_process_grasp_labels(self, ref):
        ref_out, our_out, _ = run_both_label_pipelines(ref, make_scenario(0))
        for ok, rk in KEYMAP:
            got = np.asarray(our_out[ok])
            want = ref_out[rk].numpy()
            np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5,
                                       err_msg=ok)
        np.testing.assert_allclose(
            np.asarray(our_out["batch_grasp_width"]),
            ref_out["batch_grasp_offset"][..., 2].numpy(),
            atol=2e-5, rtol=1e-5,
        )

    def test_match_grasp_view_and_label(self, ref):
        ref_out, our_out, top_views = run_both_label_pipelines(
            ref, make_scenario(1)
        )
        tv = torch.from_numpy(top_views.astype(np.int64))
        ref_out["grasp_top_view_inds"] = tv
        _, _, _, _, ref_matched = ref.label_generation.match_grasp_view_and_label(
            ref_out
        )
        ours = match_grasp_view_and_label(
            jnp.asarray(top_views.astype(np.int32)), our_out
        )
        pairs = [
            ("batch_grasp_view_rot", ref_matched["batch_grasp_view_rot"]),
            ("batch_grasp_view", ref_matched["batch_grasp_view"]),
            ("batch_grasp_view_all", ref_matched["batch_grasp_view_all"]),
            ("batch_grasp_label", ref_matched["batch_grasp_label"]),
            ("batch_grasp_label_all", ref_matched["batch_grasp_label_all"]),
            ("batch_grasp_width", ref_matched["batch_grasp_offset"][..., 2]),
            ("batch_grasp_width_all",
             ref_matched["batch_grasp_offset_all"][..., 2]),
            ("batch_grasp_tolerance", ref_matched["batch_grasp_tolerance"]),
        ]
        for key, want in pairs:
            np.testing.assert_allclose(
                np.asarray(ours[key]), want.numpy(), atol=2e-5, rtol=1e-5,
                err_msg=key,
            )


LOSS_KEYS = [
    "loss/overall_loss",
    "loss/stage1_graspable_loss",
    "loss/stage1_view_loss",
    "loss/stage2_grasp_score_loss",
    "loss/stage2_grasp_angle_class_loss",
    "loss/stage2_grasp_width_loss",
    "loss/stage2_grasp_tolerance_loss",
    "stage1_graspable_acc",
    "stage1_graspable_prec",
    "stage1_graspable_recall",
    "stage1_pos_view_pred_count",
    "stage2_grasp_angle_class_acc/0_degree",
    "stage2_grasp_angle_class_acc/15_degree",
    "stage2_grasp_angle_class_acc/30_degree",
]


class TestLossParity:
    def test_get_loss(self, ref):
        scenario = make_scenario(2)
        ref_out, our_out, top_views = run_both_label_pipelines(ref, scenario)
        rng = np.random.default_rng(42)

        tv = torch.from_numpy(top_views.astype(np.int64))
        ref_out["grasp_top_view_inds"] = tv
        _, _, _, _, ref_ep = ref.label_generation.match_grasp_view_and_label(
            ref_out
        )
        matched = match_grasp_view_and_label(
            jnp.asarray(top_views.astype(np.int32)), our_out
        )

        n_cloud = 512
        objness = rng.integers(0, 2, size=(B, n_cloud)).astype(np.int64)
        fp2_inds = rng.integers(0, n_cloud, size=(B, NS)).astype(np.int64)
        obj_score = rng.normal(size=(B, NS, 2)).astype(np.float32)
        view_score = (rng.random((B, NS, V)) * 1.2).astype(np.float32)
        score_p = rng.normal(size=(B, NS, A, D)).astype(np.float32)
        angle_p = rng.normal(size=(B, NS, A, D)).astype(np.float32)
        width_p = (rng.random((B, NS, A, D)) * 0.1).astype(np.float32)
        tol_p = (rng.random((B, NS, A, D)) * 0.05).astype(np.float32)

        ref_ep.update(
            objectness_label=torch.from_numpy(objness),
            fp2_inds=torch.from_numpy(fp2_inds),
            objectness_score=torch.from_numpy(
                np.moveaxis(obj_score, 2, 1).copy()
            ),
            view_score=torch.from_numpy(view_score),
            grasp_score_pred=torch.from_numpy(np.moveaxis(score_p, 2, 1).copy()),
            grasp_angle_cls_pred=torch.from_numpy(
                np.moveaxis(angle_p, 2, 1).copy()
            ),
            grasp_width_pred=torch.from_numpy(np.moveaxis(width_p, 2, 1).copy()),
            grasp_tolerance_pred=torch.from_numpy(
                np.moveaxis(tol_p, 2, 1).copy()
            ),
        )
        ref_loss, ref_ep = ref.loss.get_loss(ref_ep)

        ep = {
            "objectness_label": jnp.asarray(objness.astype(np.int32)),
            "fp2_inds": jnp.asarray(fp2_inds.astype(np.int32)),
            "objectness_score": jnp.asarray(obj_score),
            "view_score": jnp.asarray(view_score),
            "grasp_score_pred": jnp.asarray(score_p),
            "grasp_angle_cls_pred": jnp.asarray(angle_p),
            "grasp_width_pred": jnp.asarray(width_p),
            "grasp_tolerance_pred": jnp.asarray(tol_p),
            "batch_grasp_view_label": our_out["batch_grasp_view_label"],
            **matched,
        }
        loss, metrics = get_loss(ep)

        np.testing.assert_allclose(
            float(loss), float(ref_loss), atol=1e-5, rtol=1e-5
        )
        for k in LOSS_KEYS:
            want = float(ref_ep[k])
            if np.isnan(want):
                continue  # documented deviation: our metrics are nan-free
            np.testing.assert_allclose(
                float(metrics[k]), want, atol=1e-5, rtol=1e-5, err_msg=k
            )


class TestDecodeParity:
    def test_pred_decode(self, ref):
        rng = np.random.default_rng(3)
        obj_score = rng.normal(size=(B, NS, 2)).astype(np.float32)
        score_p = rng.normal(size=(B, NS, A, D)).astype(np.float32)
        angle_p = rng.normal(size=(B, NS, A, D)).astype(np.float32)
        width_p = (rng.random((B, NS, A, D)) * 0.12).astype(np.float32)
        tol_p = (rng.random((B, NS, A, D)) * 0.06).astype(np.float32)
        centers = (rng.random((B, NS, 3)) - 0.5).astype(np.float32) * 0.4
        vps = rng.normal(size=(B, NS, 3)).astype(np.float32)
        vps /= np.linalg.norm(vps, axis=-1, keepdims=True)

        ref_ep = {
            "point_clouds": torch.zeros(B, 4, 3),
            "objectness_score": torch.from_numpy(
                np.moveaxis(obj_score, 2, 1).copy()
            ),
            "grasp_score_pred": torch.from_numpy(np.moveaxis(score_p, 2, 1).copy()),
            "grasp_angle_cls_pred": torch.from_numpy(
                np.moveaxis(angle_p, 2, 1).copy()
            ),
            "grasp_width_pred": torch.from_numpy(np.moveaxis(width_p, 2, 1).copy()),
            "grasp_tolerance_pred": torch.from_numpy(
                np.moveaxis(tol_p, 2, 1).copy()
            ),
            "fp2_xyz": torch.from_numpy(centers),
            "grasp_top_view_xyz": torch.from_numpy(vps),
        }
        want = [g.numpy() for g in ref.pred_decode(ref_ep)]

        ep = {
            "objectness_score": jnp.asarray(obj_score),
            "grasp_score_pred": jnp.asarray(score_p),
            "grasp_angle_cls_pred": jnp.asarray(angle_p),
            "grasp_width_pred": jnp.asarray(width_p),
            "grasp_tolerance_pred": jnp.asarray(tol_p),
            "fp2_xyz": jnp.asarray(centers),
            "grasp_top_view_xyz": jnp.asarray(vps),
        }
        grasps, valid = pred_decode(ep)
        grasps, valid = np.asarray(grasps), np.asarray(valid)
        for i in range(B):
            got = grasps[i][valid[i]]
            assert got.shape == want[i].shape
            np.testing.assert_allclose(
                got, want[i], atol=2e-5, rtol=1e-5
            )
