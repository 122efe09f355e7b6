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


def _geometry_single(seed_xyz, lbl):
    """Shared per-sample geometry (steps 1-3 of the module docstring):
    camera-frame label points, per-object transformed views/rotations,
    view re-indexing, and the per-seed nearest label point."""
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
    return {
        "nn_inds": nn_inds,
        "seed_obj": seed_obj,
        "seed_view_inds": seed_view_inds,
        "grasp_point": grasp_point,
        "views_cam": views_cam,
        "views_rot_cam": views_rot_cam,
    }


def _process_single(seed_xyz, lbl):
    """Per-sample gather program. seed_xyz (Ns,3); lbl = dict of padded
    arrays (see module docstring). Returns dict of per-seed label tensors
    with *raw* (unrescaled) scores."""
    geo = _geometry_single(seed_xyz, lbl)
    v = lbl["grasp_labels"].shape[1]
    nn_inds = geo["nn_inds"]
    seed_obj = geo["seed_obj"]
    seed_view_inds = geo["seed_view_inds"]
    views_cam = geo["views_cam"]
    views_rot_cam = geo["views_rot_cam"]
    grasp_point = geo["grasp_point"]

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


def _reduced_single(seed_xyz, lbl):
    """Per-sample stage 1 of the reduced pipeline: geometry + seed-level
    row gather of the raw label/width arrays + per-view raw maxima."""
    geo = _geometry_single(seed_xyz, lbl)
    lab = jnp.take(lbl["grasp_labels"], geo["nn_inds"], axis=0)  # (Ns,V,A,D)
    wid = jnp.take(lbl["grasp_widths"], geo["nn_inds"], axis=0)
    pvm_raw = jnp.max(lab, axis=(-2, -1))  # (Ns,V) ORIGINAL view order
    return geo, lab, wid, pvm_raw


def process_grasp_labels(
    seed_xyz: jnp.ndarray, labels: dict, impl: str = "full"
) -> dict:
    """Batched label generation. seed_xyz (B,Ns,3); labels: dict of batched
    padded arrays. Returns the batch_grasp_* dict (scores log-rescaled).

    impl:
      'full'    — materialize the view-permuted (B,Ns,V,A,D) label tensors
                  (the reference's layout; what the parity tests compare).
      'reduced' — never permute the big tensors. Every loss consumer of the
                  permuted *_all tensors is a reduction that commutes with
                  the per-seed view gather (see labels/losses.py), so this
                  path emits only per-view maxima, the reweight target
                  width, and the indices match_grasp_view_and_label needs
                  to slice the top view straight out of the RAW arrays.
                  Bit-exact with 'full' through get_loss (incl. argmax tie
                  order: first permuted view attaining the global max, then
                  first (a,d) attaining that view's max — exactly flattened
                  argmax order), tested in tests/test_label_reduced.py.
                  Skips the (Ns,V,V) one-hot einsums and the three permuted
                  (B,Ns,V,A,D) materializations of the 'full' path.
    """
    if impl == "reduced":
        return _process_grasp_labels_reduced(seed_xyz, labels)
    if impl != "full":
        raise ValueError(f"unknown label impl: {impl}")
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


def _perm_views_flat_take(vals, svi):
    """vals (B,Ns,V) -> vals[b,s,svi[b,s,v]] via a flat global-row take
    (measured 3.3 vs 6.0 ms for take_along_axis at (2,1024,300) on v5e,
    tools/bench_label_reduced_prims.py)."""
    b, ns, v = vals.shape
    base = jnp.arange(b * ns, dtype=jnp.int32).reshape(b, ns, 1) * v
    return jnp.take(vals.reshape(-1), (base + svi).reshape(-1), axis=0).reshape(
        b, ns, v
    )


def _process_grasp_labels_reduced(seed_xyz: jnp.ndarray, labels: dict) -> dict:
    geo, lab, wid, pvm_raw = jax.vmap(_reduced_single)(seed_xyz, labels)
    svi = geo["seed_view_inds"]  # (B,Ns,V) original-view index per template v

    v, a, d = lab.shape[2], lab.shape[3], lab.shape[4]
    ad = a * d
    # u_max over the PERMUTED gathered labels (label_generation.py:113):
    # the view gather may repeat/omit original views, so reduce the
    # permuted per-view maxima, not the unpermuted tensor.
    u_max = jnp.max(_perm_views_flat_take(pvm_raw, svi))

    mask = jnp.logical_and(lab > 0, wid <= GRASP_MAX_WIDTH)
    resc = jnp.where(mask, jnp.log(u_max / jnp.maximum(lab, 1e-12)), 0.0)
    flat = resc.reshape(resc.shape[:3] + (ad,))  # (B,Ns,V,A*D)
    pvm_resc = jnp.max(flat, axis=-1)  # per-view rescaled max, original order
    parg = jnp.argmax(flat, axis=-1).astype(jnp.int32)  # first-(a,d)-of-max

    # view_label = max over (A,D) of the permuted rescaled tensor
    #            = permute of the per-view max (reduction over one view's
    #              elements commutes with the view gather)
    view_label = _perm_views_flat_take(pvm_resc, svi)  # (B,Ns,V)

    # reweight target width (loss.py:29-41 semantics): the width at the
    # flattened argmax of the permuted label — first permuted view
    # attaining the global max (= argmax over view_label), then the first
    # (a,d) attaining that view's max (= parg at the original view)
    vstar = jnp.argmax(view_label, axis=-1)  # (B,Ns)
    orig_vstar = jnp.take_along_axis(svi, vstar[..., None], axis=-1)[..., 0]
    adstar = jnp.take_along_axis(parg, orig_vstar[..., None], axis=-1)[..., 0]
    wflat = wid.reshape(wid.shape[:2] + (v * ad,))
    target_w = jnp.take_along_axis(
        wflat, (orig_vstar * ad + adstar)[..., None], axis=-1
    )[..., 0]  # (B,Ns)

    return {
        "batch_grasp_point": geo["grasp_point"],
        "batch_grasp_view_label": view_label,
        "batch_grasp_target_width": target_w,
        # private plumbing for match_grasp_view_and_label (top-view slicing
        # from the seed-gathered tensors — NOT the raw (B,P,V,A,D) arrays:
        # 192-byte random rows from those measured ~17 ms per array on v5e,
        # tools/bench_label_reduced_prims.py); stripped from its output dict
        "_reduced": {
            "u_max": u_max,
            "nn_inds": geo["nn_inds"],
            "seed_obj": geo["seed_obj"],
            "seed_view_inds": svi,
            "views_cam": geo["views_cam"],
            "views_rot_cam": geo["views_rot_cam"],
            "lab_gathered": lab,
            "wid_gathered": wid,
            "grasp_tolerance": labels["grasp_tolerance"],
        },
    }


def _vmapped_row_take(arr, rows):
    """arr (B, R, ...), rows (B, Ns) int -> (B, Ns, ...); in-bounds rows."""
    return jax.vmap(lambda a, r: jnp.take(a, r, axis=0))(arr, rows)


def match_grasp_view_and_label(top_view_inds: jnp.ndarray, grasp_labels: dict) -> dict:
    """Gather per-seed labels at the predicted top view
    (label_generation.py:129-157).

    top_view_inds (B,Ns); grasp_labels: output of process_grasp_labels.
    Returns dict with top-view slices plus (full impl) the *_all full-view
    tensors the loss reweighting needs; the reduced impl slices the top view
    straight out of the raw label arrays and emits the precomputed reweight
    target width instead (see process_grasp_labels impl='reduced').
    """
    if "_reduced" in grasp_labels:
        r = grasp_labels["_reduced"]
        svi = r["seed_view_inds"]  # (B,Ns,V)
        v = svi.shape[-1]
        top = top_view_inds.astype(jnp.int32)
        # original-view index of the predicted top template view
        orig_top = jnp.take_along_axis(svi, top[..., None], axis=-1)[..., 0]

        # top-view (A,D) slab out of the seed-gathered (B,Ns,V,A,D) tensors
        def top_slab(arr):
            ix = orig_top[..., None, None, None]
            return jnp.take_along_axis(arr, ix, axis=2)[:, :, 0]

        lab_top = top_slab(r["lab_gathered"])  # (B,Ns,A,D) raw
        wid_top = top_slab(r["wid_gathered"])
        # tolerance has no full-view consumer: seed-gather it here only
        tol_g = jax.vmap(lambda a, rr: jnp.take(a, rr, axis=0))(
            r["grasp_tolerance"], r["nn_inds"]
        )
        tol_top = top_slab(tol_g)
        mask = jnp.logical_and(lab_top > 0, wid_top <= GRASP_MAX_WIDTH)
        lab_top = jnp.where(
            mask, jnp.log(r["u_max"] / jnp.maximum(lab_top, 1e-12)), 0.0
        )

        rows_ov = r["seed_obj"] * v + orig_top  # (B,Ns) into (O*V)

        def obj_view_take(arr):  # (B, O, V, ...) -> (B, Ns, ...)
            b, o = arr.shape[:2]
            flat = arr.reshape((b, o * v) + arr.shape[3:])
            return _vmapped_row_take(flat, rows_ov)

        return {
            "batch_grasp_view_rot": obj_view_take(r["views_rot_cam"]),
            "batch_grasp_view": obj_view_take(r["views_cam"]),
            "batch_grasp_label": lab_top,
            "batch_grasp_width": wid_top,
            "batch_grasp_tolerance": tol_top,
            "batch_grasp_point": grasp_labels["batch_grasp_point"],
            "batch_grasp_view_label": grasp_labels["batch_grasp_view_label"],
            "batch_grasp_target_width": grasp_labels["batch_grasp_target_width"],
        }

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
