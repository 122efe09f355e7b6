"""Label-pipeline parity: full numpy-loop oracle of process_grasp_labels
(label_generation.py:18-126) with non-trivial object rotations, vs the
vmapped padded device implementation."""

import numpy as np
import jax.numpy as jnp

from graspbalance_tpu.labels.geometry import (
    GRASP_MAX_WIDTH,
    generate_grasp_views_np,
)
from graspbalance_tpu.labels.label_gen import (
    match_grasp_view_and_label,
    process_grasp_labels,
)


def viewpoint_matrix_np(towards, angle):
    ax = towards.astype(np.float64)
    ay = np.stack([-ax[:, 1], ax[:, 0], np.zeros(len(ax))], -1)
    deg = np.linalg.norm(ay, axis=-1) == 0
    ay[deg] = [0, 1, 0]
    ax = ax / np.linalg.norm(ax, axis=-1, keepdims=True)
    ay = ay / np.linalg.norm(ay, axis=-1, keepdims=True)
    az = np.cross(ax, ay)
    c, s = np.cos(angle), np.sin(angle)
    r1 = np.stack(
        [np.ones_like(c), 0 * c, 0 * c, 0 * c, c, -s, 0 * c, s, c], -1
    ).reshape(-1, 3, 3)
    r2 = np.stack([ax, ay, az], -1)
    return (r2 @ r1).astype(np.float32)


def oracle_process(seed_xyz, scenes):
    """Literal transcription of label_generation.py:18-126 per scene, with
    ragged per-object lists. scenes: list of dicts with poses (O,3,4),
    per-object points/labels/widths/tolerance lists."""
    v = scenes[0]["labels"][0].shape[1]
    views = generate_grasp_views_np(v)
    angles = np.zeros(v)
    rot_templates = viewpoint_matrix_np(-views, angles)  # (V,3,3)

    out = {k: [] for k in ("point", "view", "view_rot", "label", "width", "tol")}
    for b, scene in enumerate(scenes):
        pts_m, views_m, rot_m, lab_m, wid_m, tol_m = [], [], [], [], [], []
        for o in range(len(scene["poses"])):
            pose = scene["poses"][o]
            gp = scene["points"][o]
            lab = scene["labels"][o]
            wid = scene["widths"][o]
            tol = scene["tols"][o]
            r = pose[:, :3]
            gp_t = gp @ r.T + pose[:, 3]
            views_t = views @ r.T
            rot_t = np.einsum("ij,vjk->vik", r, rot_templates)
            # view re-index: for template v, nearest transformed view
            d = np.linalg.norm(views[:, None] - views_t[None], axis=-1)
            vi = np.argmin(d, axis=1)
            pts_m.append(gp_t)
            views_m.append(np.tile(views_t[vi][None], (len(gp), 1, 1)))
            rot_m.append(np.tile(rot_t[vi][None], (len(gp), 1, 1, 1)))
            lab_m.append(lab[:, vi])
            wid_m.append(wid[:, vi])
            tol_m.append(tol[:, vi])
        pts_m = np.concatenate(pts_m)
        views_m = np.concatenate(views_m)
        rot_m = np.concatenate(rot_m)
        lab_m = np.concatenate(lab_m)
        wid_m = np.concatenate(wid_m)
        tol_m = np.concatenate(tol_m)
        nn = np.argmin(
            np.linalg.norm(seed_xyz[b][:, None] - pts_m[None], axis=-1), axis=1
        )
        out["point"].append(pts_m[nn])
        out["view"].append(views_m[nn])
        out["view_rot"].append(rot_m[nn])
        out["label"].append(lab_m[nn])
        out["width"].append(wid_m[nn])
        out["tol"].append(tol_m[nn])
    out = {k: np.stack(vv) for k, vv in out.items()}
    u_max = out["label"].max()
    mask = (out["label"] > 0) & (out["width"] <= GRASP_MAX_WIDTH)
    resc = np.where(mask, np.log(u_max / np.maximum(out["label"], 1e-12)), 0.0)
    out["label"] = resc
    out["view_label"] = resc.max(axis=(-2, -1))
    return out


def random_rotation(rng):
    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ],
        np.float32,
    )


def build_inputs(rng, b=2, n_obj=3, n_pts=40, v=20, a=4, d=2, o_max=4, p_max=160, ns=16):
    scenes, padded = [], {
        "object_poses": np.zeros((b, o_max, 3, 4), np.float32),
        "obj_mask": np.zeros((b, o_max), bool),
        "grasp_points": np.zeros((b, p_max, 3), np.float32),
        "grasp_pt_obj": np.zeros((b, p_max), np.int32),
        "grasp_pt_mask": np.zeros((b, p_max), bool),
        "grasp_labels": np.zeros((b, p_max, v, a, d), np.float32),
        "grasp_widths": np.zeros((b, p_max, v, a, d), np.float32),
        "grasp_tolerance": np.zeros((b, p_max, v, a, d), np.float32),
    }
    seeds = rng.random((b, ns, 3), np.float32).astype(np.float32) - 0.5
    for bi in range(b):
        scene = {"poses": [], "points": [], "labels": [], "widths": [], "tols": []}
        cur = 0
        for o in range(n_obj):
            pose = np.zeros((3, 4), np.float32)
            pose[:, :3] = random_rotation(rng)
            pose[:, 3] = (rng.random(3) - 0.5) * 0.4
            gp = (rng.random((n_pts, 3), np.float32) - 0.5) * 0.08
            lab = (rng.random((n_pts, v, a, d)) * 1.2).astype(np.float32)
            lab[rng.random(lab.shape) < 0.4] = 0
            wid = (rng.random((n_pts, v, a, d)) * 0.12).astype(np.float32)
            tol = (rng.random((n_pts, v, a, d)) * 0.05).astype(np.float32)
            scene["poses"].append(pose)
            scene["points"].append(gp)
            scene["labels"].append(lab)
            scene["widths"].append(wid)
            scene["tols"].append(tol)
            sl = slice(cur, cur + n_pts)
            padded["object_poses"][bi, o] = pose
            padded["obj_mask"][bi, o] = True
            padded["grasp_points"][bi, sl] = gp
            padded["grasp_pt_obj"][bi, sl] = o
            padded["grasp_pt_mask"][bi, sl] = True
            padded["grasp_labels"][bi, sl] = lab
            padded["grasp_widths"][bi, sl] = wid
            padded["grasp_tolerance"][bi, sl] = tol
            cur += n_pts
        scenes.append(scene)
    return seeds, scenes, padded


def test_process_grasp_labels_matches_oracle(rng=np.random.default_rng(7)):
    seeds, scenes, padded = build_inputs(rng)
    got = process_grasp_labels(
        jnp.asarray(seeds), {k: jnp.asarray(x) for k, x in padded.items()}
    )
    want = oracle_process(seeds, scenes)
    np.testing.assert_allclose(
        np.asarray(got["batch_grasp_point"]), want["point"], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got["batch_grasp_view"]), want["view"], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got["batch_grasp_view_rot"]), want["view_rot"], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got["batch_grasp_label"]), want["label"], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got["batch_grasp_width"]), want["width"], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got["batch_grasp_tolerance"]), want["tol"], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got["batch_grasp_view_label"]), want["view_label"],
        rtol=1e-4, atol=1e-5,
    )


def test_match_top_view_gathers(rng=np.random.default_rng(8)):
    seeds, scenes, padded = build_inputs(rng, b=1)
    labels = process_grasp_labels(
        jnp.asarray(seeds), {k: jnp.asarray(x) for k, x in padded.items()}
    )
    v = padded["grasp_labels"].shape[2]
    top = jnp.asarray(rng.integers(0, v, (1, seeds.shape[1])))
    matched = match_grasp_view_and_label(top, labels)
    s = 3
    tv = int(top[0, s])
    np.testing.assert_allclose(
        np.asarray(matched["batch_grasp_view_rot"])[0, s],
        np.asarray(labels["batch_grasp_view_rot"])[0, s, tv],
    )
    np.testing.assert_allclose(
        np.asarray(matched["batch_grasp_width"])[0, s],
        np.asarray(labels["batch_grasp_width"])[0, s, tv],
    )


def test_onehot_view_permutation_bitexact():
    """The one-hot einsum view permutation (HIGHEST precision) must be
    BIT-exact vs take_along_axis on arbitrary f32 values."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    ns, v, a, d = 64, 60, 12, 4
    rows = jnp.asarray(
        (rng.standard_normal((ns, v, a, d)) * np.exp(
            rng.uniform(-20, 20, (ns, v, a, d)))).astype(np.float32)
    )
    vi = jnp.asarray(rng.integers(0, v, (ns, v)).astype(np.int32))
    want = jnp.take_along_axis(rows, vi[..., None, None], axis=1)
    oh = jax.nn.one_hot(vi, v, dtype=jnp.float32)
    got = jnp.einsum(
        "svw,swad->svad", oh, rows, precision=jax.lax.Precision.HIGHEST
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
