"""On-device grasp label generation (padded, vmapped).

Rebuild of label_generation.py:18-157. The reference loops in Python over
batch items and objects, carrying ragged per-object label tensors; here the
data pipeline flattens every scene's sampled grasp points into fixed-shape
padded arrays and the whole pipeline is one vmapped gather program:

  per-sample inputs (see data/dataset.py for the collate contract):
    object_poses    (O, 3, 4) float32   object->camera pose per object slot
    obj_mask        (O,)      bool      valid object slots
    grasp_points    (P, 3)    float32   label points, object frame, flattened
    grasp_pt_obj    (P,)      int32     owning object slot per point
    grasp_pt_mask   (P,)      bool      valid point slots
    grasp_labels    (P, V, A, D) float32  friction scores (raw, lower=better)
    grasp_widths    (P, V, A, D) float32  gripper widths (= offsets[...,2];
                     channels 0/1 of the reference offsets are the static
                     angle/depth grids and are never consumed — loss.py
                     extracts them at :126-127 but only widths are used)
    grasp_tolerance (P, V, A, D) float32

Steps (exactly the reference semantics):
  1. transform label points and template views by each object pose
  2. re-index views: for each canonical template view v, the object's
     transformed view nearest to v (k=1 NN, label_generation.py:58)
  3. per seed: nearest transformed label point (k=1 NN, :84), gather its
     (view-re-indexed) labels
  4. log-rescale scores by the batch-global max: u = log(u_max/u) where
     label>0 and width<=GRASP_MAX_WIDTH, else 0 (:110-115)
  5. per-view score = max over (A, D) (:116)
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from graspbalance_tpu.labels.geometry import (
    GRASP_MAX_WIDTH,
    batch_viewpoint_params_to_matrix,
    generate_grasp_views,
)


def _process_single(seed_xyz, lbl):
    """Per-sample gather program. seed_xyz (Ns,3); lbl = dict of padded
    arrays (see module docstring). Returns dict of per-seed label tensors
    with *raw* (unrescaled) scores."""
    poses = lbl["object_poses"]  # (O,3,4)
    rot_o = poses[:, :, :3]  # (O,3,3)
    trans_o = poses[:, :, 3]  # (O,3)
    obj_mask = lbl["obj_mask"]
    pts = lbl["grasp_points"]  # (P,3)
    pt_obj = lbl["grasp_pt_obj"].astype(jnp.int32)
    pt_mask = lbl["grasp_pt_mask"]

    # 1. transform label points into camera frame
    pt_rot = rot_o[pt_obj]  # (P,3,3)
    pts_cam = jnp.einsum("pij,pj->pi", pt_rot, pts) + trans_o[pt_obj]

    # template views and their transforms per object
    v = lbl["grasp_labels"].shape[1]
    views = generate_grasp_views(v)  # (V,3)
    views_cam = jnp.einsum("oij,vj->ovi", rot_o, views)  # (O,V,3)
    angles0 = jnp.zeros((v,), views.dtype)
    rot_templates = batch_viewpoint_params_to_matrix(-views, angles0)  # (V,3,3)
    views_rot_cam = jnp.einsum("oij,vjk->ovik", rot_o, rot_templates)  # (O,V,3,3)

    # 2. view re-indexing: for template view v, nearest transformed view
    d2_vv = jnp.sum(
        (views[None, :, None, :] - views_cam[:, None, :, :]) ** 2, axis=-1
    )  # (O, V_template, V_transformed)
    view_inds = jnp.argmin(d2_vv, axis=-1).astype(jnp.int32)  # (O,V)

    # 3. nearest label point per seed (masked)
    d2_sp = jnp.sum((seed_xyz[:, None, :] - pts_cam[None, :, :]) ** 2, axis=-1)
    valid_p = jnp.logical_and(pt_mask, obj_mask[pt_obj])
    d2_sp = jnp.where(valid_p[None, :], d2_sp, jnp.inf)
    nn_inds = jnp.argmin(d2_sp, axis=-1).astype(jnp.int32)  # (Ns,)

    seed_obj = pt_obj[nn_inds]  # (Ns,)
    seed_view_inds = view_inds[seed_obj]  # (Ns,V)

    grasp_point = pts_cam[nn_inds]  # (Ns,3)

    # Per-seed view permutation as a one-hot einsum at HIGHEST precision:
    # bit-exact (an f32 value decomposes exactly into 3 bf16 terms, and a
    # one-hot row has a single 1.0, so the 6-pass f32 matmul reconstructs
    # the picked value exactly; verified in tests/test_label_parity.py) and
    # ~60x faster than take_along_axis on v5e (0.8 vs 47 ms per big array —
    # the gather lowers to a slice loop, the einsum rides the MXU with the
    # one-hot fused).
    view_oh = jax.nn.one_hot(seed_view_inds, v, dtype=jnp.float32)  # (Ns,V,V)

    def permute_views(rows):
        """rows (Ns, V, ...) -> rows[s, seed_view_inds[s, v]] via one-hot."""
        extra = rows.shape[2:]
        flat = rows.reshape(rows.shape[0], rows.shape[1], -1)
        out = jnp.einsum(
            "svw,swx->svx", view_oh, flat,
            precision=jax.lax.Precision.HIGHEST,
        )
        return out.reshape(rows.shape[:1] + (v,) + extra)

    grasp_view = permute_views(views_cam[seed_obj])  # (Ns,V,3)
    grasp_view_rot = permute_views(views_rot_cam[seed_obj])  # (Ns,V,3,3)

    def gather_vad(arr):
        return permute_views(arr[nn_inds])  # (Ns,V,A,D)

    return {
        "batch_grasp_point": grasp_point,
        "batch_grasp_view": grasp_view,
        "batch_grasp_view_rot": grasp_view_rot,
        "batch_grasp_label": gather_vad(lbl["grasp_labels"]),
        "batch_grasp_width": gather_vad(lbl["grasp_widths"]),
        "batch_grasp_tolerance": gather_vad(lbl["grasp_tolerance"]),
    }


def process_grasp_labels(seed_xyz: jnp.ndarray, labels: dict) -> dict:
    """Batched label generation. seed_xyz (B,Ns,3); labels: dict of batched
    padded arrays. Returns the batch_grasp_* dict (scores log-rescaled)."""
    out = jax.vmap(_process_single)(seed_xyz, labels)

    raw = out["batch_grasp_label"]
    widths = out["batch_grasp_width"]
    u_max = jnp.max(raw)  # batch-global, matching label_generation.py:113
    mask = jnp.logical_and(raw > 0, widths <= GRASP_MAX_WIDTH)
    rescaled = jnp.where(mask, jnp.log(u_max / jnp.maximum(raw, 1e-12)), 0.0)
    out["batch_grasp_label"] = rescaled
    out["batch_grasp_view_label"] = jnp.max(
        rescaled, axis=(-2, -1)
    )  # (B,Ns,V)
    return out


def match_grasp_view_and_label(top_view_inds: jnp.ndarray, grasp_labels: dict) -> dict:
    """Gather per-seed labels at the predicted top view
    (label_generation.py:129-157).

    top_view_inds (B,Ns); grasp_labels: output of process_grasp_labels.
    Returns dict with top-view slices plus the *_all full-view tensors the
    loss reweighting needs.
    """
    idx = top_view_inds[..., None]

    def at_top(arr, extra_dims):
        ix = idx.reshape(idx.shape + (1,) * extra_dims)
        return jnp.take_along_axis(arr, ix, axis=2).squeeze(2)

    return {
        "batch_grasp_view_rot": at_top(grasp_labels["batch_grasp_view_rot"], 2),
        "batch_grasp_view": at_top(grasp_labels["batch_grasp_view"], 1),
        "batch_grasp_view_all": grasp_labels["batch_grasp_view"],
        "batch_grasp_label": at_top(grasp_labels["batch_grasp_label"], 2),
        "batch_grasp_label_all": grasp_labels["batch_grasp_label"],
        "batch_grasp_width": at_top(grasp_labels["batch_grasp_width"], 2),
        "batch_grasp_width_all": grasp_labels["batch_grasp_width"],
        "batch_grasp_tolerance": at_top(grasp_labels["batch_grasp_tolerance"], 2),
        "batch_grasp_point": grasp_labels["batch_grasp_point"],
        "batch_grasp_view_label": grasp_labels["batch_grasp_view_label"],
    }
