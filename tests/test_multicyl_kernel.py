"""Parity tests for the fused Pallas multi-cylinder group kernel
(interpret mode on CPU) against the XLA multi_cylinder_query path and the
heads' gather+rotate contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graspbalance_tpu import ops
from graspbalance_tpu.ops.pallas.multicyl_kernel import multi_cylinder_group

RADII = (0.02, 0.04, 0.06, 0.08)
HMIN = -0.02
HMAXS = (0.01, 0.02, 0.03, 0.04)


def _random_rotations(rng, shape):
    """Random proper rotations via QR."""
    a = rng.normal(size=shape + (3, 3)).astype(np.float32)
    q, r = np.linalg.qr(a)
    det = np.linalg.det(q)
    q[..., :, 0] *= np.sign(det)[..., None]
    return q.astype(np.float32)


def _case(rng, b=2, n=700, m=40):
    cloud = (rng.random((b, n, 3)) - 0.5).astype(np.float32) * 0.4
    ctr_idx = rng.integers(0, n, size=(b, m))
    centers = np.take_along_axis(cloud, ctr_idx[..., None], axis=1)
    rot = _random_rotations(rng, (b, m))
    return jnp.asarray(cloud), jnp.asarray(centers), jnp.asarray(rot)


@pytest.mark.parametrize("nsample", [16, 64])
def test_idx_matches_xla_query(rng, nsample):
    cloud, centers, rot = _case(rng)
    ref = ops.multi_cylinder_query(
        cloud, centers, rot, RADII, HMIN, HMAXS, nsample, order="index"
    )
    _, idx = multi_cylinder_group(
        cloud, centers, rot, RADII, HMIN, HMAXS, nsample, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref))


@pytest.mark.parametrize("nsample", [16, 64])
def test_select_kernel_matches_xla_query(rng, nsample):
    """Selection-only Pallas kernel (ops/pallas/select_kernel.py): the TPU
    default impl must be bit-exact vs the XLA index path."""
    cloud, centers, rot = _case(rng)
    ref = ops.multi_cylinder_query(
        cloud, centers, rot, RADII, HMIN, HMAXS, nsample,
        order="index", impl="xla",
    )
    got = ops.multi_cylinder_query(
        cloud, centers, rot, RADII, HMIN, HMAXS, nsample,
        order="index", impl="pallas_select", interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_select_kernel_empty_and_padding(rng):
    """Reference padding rule through the kernel: zero-hit centers stay 0;
    partially-filled neighborhoods repeat the first hit."""
    cloud = jnp.asarray((rng.random((1, 300, 3)) - 0.5).astype(np.float32))
    centers = jnp.concatenate(
        [jnp.full((1, 4, 3), 50.0, jnp.float32), cloud[:, :4]], axis=1
    )
    rot = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (1, 8, 3, 3))
    ref = ops.multi_cylinder_query(
        cloud, centers, rot, RADII, HMIN, HMAXS, 16,
        order="index", impl="xla",
    )
    got = ops.multi_cylinder_query(
        cloud, centers, rot, RADII, HMIN, HMAXS, 16,
        order="index", impl="pallas_select", interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    assert np.all(np.asarray(got)[:, :, :, :4] == 0)  # far centers: no hits


def test_select_kernel_row_padding_invariance(rng):
    """Row counts not divisible by rows_per_step (kernel pads internally)."""
    from graspbalance_tpu.ops.pallas.select_kernel import multicyl_select

    cls = rng.integers(0, 64, size=(13, 300)).astype(np.float32)
    cls_j = jnp.asarray(cls, jnp.bfloat16)
    got = multicyl_select(cls_j, 4, 4, 16, interpret=True)
    # reference: XLA selection from the same class plane
    from graspbalance_tpu.ops.query import _first_k_from_class, _round_up

    t = _round_up(300, 128) // 128
    cls_pad = jnp.pad(cls_j, ((0, 0), (0, t * 128 - 300)),
                      constant_values=jnp.bfloat16(63.0)).reshape(13, t, 128)
    for ri in range(4):
        for hi in range(4):
            want = _first_k_from_class(cls_pad, ri, hi, 16)
            np.testing.assert_array_equal(
                np.asarray(got[:, ri * 4 + hi]), np.asarray(want),
                err_msg=f"combo {ri},{hi}",
            )


def test_rel_matches_gather_rotate(rng):
    cloud, centers, rot = _case(rng, b=1, n=600, m=24)
    nsample = 32
    idx_ref = ops.multi_cylinder_query(
        cloud, centers, rot, RADII, HMIN, HMAXS, nsample, order="index"
    )
    b, n_r, n_h, m, k = idx_ref.shape
    grouped = ops.group_points(
        cloud, jnp.reshape(idx_ref, (b, n_r * n_h * m, k))
    ).reshape(b, n_r, n_h, m, k, 3)
    rel_ref = grouped - centers[:, None, None, :, None, :]
    rel_ref = jnp.einsum("brhskj,bsji->brhski", rel_ref, rot)

    rel, idx = multi_cylinder_group(
        cloud, centers, rot, RADII, HMIN, HMAXS, nsample, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))
    np.testing.assert_allclose(
        np.asarray(rel), np.asarray(rel_ref), atol=2e-6, rtol=0
    )


def test_empty_neighborhood_falls_back_to_point0(rng):
    # centers far from every point: reference idx stays 0, grouped = point 0
    cloud = jnp.asarray((rng.random((1, 300, 3)) - 0.5).astype(np.float32))
    centers = jnp.full((1, 8, 3), 50.0, jnp.float32)
    rot = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (1, 8, 3, 3))
    rel, idx = multi_cylinder_group(
        cloud, centers, rot, RADII, HMIN, HMAXS, 16, interpret=True
    )
    assert np.all(np.asarray(idx) == 0)
    want = np.asarray(cloud[0, 0] - centers[0, 0])  # identity rotation
    np.testing.assert_allclose(
        np.asarray(rel)[0, :, :, :, :], np.broadcast_to(want, (4, 4, 8, 16, 3)),
        atol=2e-6,
    )


def test_chunk_invariance(rng):
    cloud, centers, rot = _case(rng, b=1, n=500, m=32)
    rel8, idx8 = multi_cylinder_group(
        cloud, centers, rot, RADII, HMIN, HMAXS, 16, chunk=8, interpret=True
    )
    rel16, idx16 = multi_cylinder_group(
        cloud, centers, rot, RADII, HMIN, HMAXS, 16, chunk=16, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(idx8), np.asarray(idx16))
    np.testing.assert_allclose(np.asarray(rel8), np.asarray(rel16), atol=0)


def test_call_chunk_and_emit_idx(rng):
    # slicing the centers axis across several pallas_calls (the scoped-vmem
    # workaround for production shapes) must be invariant, and the
    # emit_idx=False fast path must return identical rel
    cloud, centers, rot = _case(rng, b=1, n=500, m=48)
    rel_one, idx_one = multi_cylinder_group(
        cloud, centers, rot, RADII, HMIN, HMAXS, 16, chunk=8,
        call_chunk=1024, interpret=True
    )
    rel_sliced, idx_sliced = multi_cylinder_group(
        cloud, centers, rot, RADII, HMIN, HMAXS, 16, chunk=8,
        call_chunk=16, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(idx_one), np.asarray(idx_sliced))
    np.testing.assert_allclose(np.asarray(rel_one), np.asarray(rel_sliced), atol=0)
    rel_noidx, none_idx = multi_cylinder_group(
        cloud, centers, rot, RADII, HMIN, HMAXS, 16, chunk=8,
        call_chunk=16, emit_idx=False, interpret=True
    )
    assert none_idx is None
    np.testing.assert_allclose(np.asarray(rel_noidx), np.asarray(rel_sliced), atol=0)
