"""Bit-exactness of the reduced label pipeline (impl='reduced') vs the
full view-permuted pipeline, through match_grasp_view_and_label and
get_loss. The reduced path replaces the (B,Ns,V,A,D) permuted
materializations with per-view reductions + top-view row gathers; every
loss consumer must see identical values, including argmax tie-break order
in the scale-reweight target (first permuted view attaining the global
max, then first (a,d) within it)."""

import numpy as np
import jax
import jax.numpy as jnp

from graspbalance_tpu.labels.label_gen import (
    match_grasp_view_and_label,
    process_grasp_labels,
)
from graspbalance_tpu.labels.losses import (
    generate_reweight_mask,
    get_loss,
    reweight_from_target_width,
)

from test_label_parity import build_inputs


def _quantize_labels(padded, rng):
    """Overwrite labels with a small discrete value set so exact ties across
    views/angles/depths (the argmax tie-break cases) are common, and push
    some widths above GRASP_MAX_WIDTH so the rescale mask is exercised."""
    shape = padded["grasp_labels"].shape
    vals = np.asarray([0.0, 0.0, 0.2, 0.4, 0.8, 1.2], np.float32)
    padded["grasp_labels"] = vals[rng.integers(0, len(vals), size=shape)]
    wide = rng.random(shape) < 0.15
    padded["grasp_widths"] = np.where(
        wide, 0.5, padded["grasp_widths"]
    ).astype(np.float32)
    return padded


def _run_both(padded, seeds, top):
    full = process_grasp_labels(jnp.asarray(seeds), padded, impl="full")
    red = process_grasp_labels(jnp.asarray(seeds), padded, impl="reduced")
    m_full = match_grasp_view_and_label(top, full)
    m_red = match_grasp_view_and_label(top, red)
    return full, red, m_full, m_red


def _assert_matched_equal(m_full, m_red):
    for key in (
        "batch_grasp_point",
        "batch_grasp_view",
        "batch_grasp_view_rot",
        "batch_grasp_label",
        "batch_grasp_width",
        "batch_grasp_tolerance",
        "batch_grasp_view_label",
    ):
        np.testing.assert_array_equal(
            np.asarray(m_full[key]), np.asarray(m_red[key]), err_msg=key
        )


def test_reduced_matches_full_bitwise():
    rng = np.random.default_rng(11)
    seeds, _, padded = build_inputs(rng, b=2, n_obj=3, n_pts=40, v=20, a=4, d=2)
    padded = _quantize_labels(padded, rng)
    padded = {k: jnp.asarray(v) for k, v in padded.items()}
    top = jnp.asarray(rng.integers(0, 20, size=(2, 16)), jnp.int32)

    full, red, m_full, m_red = _run_both(padded, seeds, top)
    _assert_matched_equal(m_full, m_red)

    w_full = generate_reweight_mask(
        m_full["batch_grasp_label_all"], m_full["batch_grasp_width_all"]
    )
    w_red = reweight_from_target_width(m_red["batch_grasp_target_width"])
    np.testing.assert_array_equal(np.asarray(w_full), np.asarray(w_red))


def test_reduced_matches_full_degenerate_scene():
    """All-zero labels in one scene (u_max edge) + a scene whose every
    width exceeds GRASP_MAX_WIDTH (empty rescale mask)."""
    rng = np.random.default_rng(5)
    seeds, _, padded = build_inputs(rng, b=2, n_obj=2, n_pts=20, v=12, a=3, d=2)
    padded["grasp_labels"][0] = 0.0
    padded["grasp_widths"][1] = 0.9
    padded = {k: jnp.asarray(v) for k, v in padded.items()}
    top = jnp.asarray(rng.integers(0, 12, size=(2, 16)), jnp.int32)

    full, red, m_full, m_red = _run_both(padded, seeds, top)
    _assert_matched_equal(m_full, m_red)
    w_full = generate_reweight_mask(
        m_full["batch_grasp_label_all"], m_full["batch_grasp_width_all"]
    )
    w_red = reweight_from_target_width(m_red["batch_grasp_target_width"])
    np.testing.assert_array_equal(np.asarray(w_full), np.asarray(w_red))


def test_get_loss_bitwise_equal():
    rng = np.random.default_rng(23)
    b, ns, v, a, d, n = 2, 16, 20, 4, 2, 64
    seeds, _, padded = build_inputs(rng, b=b, n_obj=3, n_pts=40, v=v, a=a, d=d)
    padded = _quantize_labels(padded, rng)
    padded = {k: jnp.asarray(v_) for k, v_ in padded.items()}
    top = jnp.asarray(rng.integers(0, v, size=(b, ns)), jnp.int32)

    _, _, m_full, m_red = _run_both(padded, seeds, top)

    preds = {
        "objectness_score": jnp.asarray(
            rng.standard_normal((b, ns, 2)), jnp.float32
        ),
        "view_score": jnp.asarray(rng.random((b, ns, v)), jnp.float32),
        "grasp_score_pred": jnp.asarray(
            rng.standard_normal((b, ns, a, d)), jnp.float32
        ),
        "grasp_angle_cls_pred": jnp.asarray(
            rng.standard_normal((b, ns, a, d)), jnp.float32
        ),
        "grasp_width_pred": jnp.asarray(rng.random((b, ns, a, d)), jnp.float32),
        "grasp_tolerance_pred": jnp.asarray(
            rng.random((b, ns, a, d)), jnp.float32
        ),
        "objectness_label": jnp.asarray(
            rng.integers(0, 2, size=(b, n)), jnp.int32
        ),
        "fp2_inds": jnp.asarray(rng.integers(0, n, size=(b, ns)), jnp.int32),
    }

    loss_full, metrics_full = jax.jit(get_loss)({**preds, **m_full})
    loss_red, metrics_red = jax.jit(get_loss)({**preds, **m_red})

    assert set(metrics_full) == set(metrics_red)
    np.testing.assert_array_equal(np.asarray(loss_full), np.asarray(loss_red))
    for k in metrics_full:
        np.testing.assert_array_equal(
            np.asarray(metrics_full[k]), np.asarray(metrics_red[k]), err_msg=k
        )
