"""Interpret-mode parity tests for the Pallas collision-count kernel
(ops/pallas/collision_kernel.py) vs the fused-XLA count path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graspbalance_tpu.eval.collision import (
    FINGER_LENGTH,
    FINGER_WIDTH,
    _collision_counts_xla,
    collision_detect,
)
from graspbalance_tpu.ops.pallas.collision_kernel import (
    collision_counts_pallas,
    pack_grasp_params,
)


def _random_grasps(rng, g):
    """(G, 17) decoded-layout grasps with orthonormal rotations."""
    a = rng.normal(size=(g, 3, 3)).astype(np.float32)
    q, _ = np.linalg.qr(a)
    rows = np.zeros((g, 17), np.float32)
    rows[:, 0] = rng.random(g)  # score
    rows[:, 1] = rng.uniform(0.01, 0.1, g)  # width
    rows[:, 2] = 0.02  # height
    rows[:, 3] = rng.uniform(0.01, 0.04, g)  # depth
    rows[:, 4:13] = q.reshape(g, 9)
    rows[:, 13:16] = rng.uniform(-0.2, 0.2, (g, 3))
    rows[:, 16] = -1
    return rows


def _scene(rng, n):
    # offset from round voxel/box coordinates so float-associativity noise
    # cannot flip a comparison (same de-aligning as the voxel-ds tests)
    return (rng.uniform(-0.3, 0.3, (n, 3)) + 0.0137).astype(np.float32)


@pytest.mark.parametrize("n,g", [(300, 40), (1000, 100)])
def test_counts_match_xla(n, g):
    rng = np.random.default_rng(0)
    scene = jnp.asarray(_scene(rng, n))
    grasps = jnp.asarray(_random_grasps(rng, g))
    valid = jnp.asarray(rng.random(n) > 0.1)

    ref = jnp.stack(
        _collision_counts_xla(scene, grasps, valid, approach_dist=0.03),
        axis=-1,
    )
    params = pack_grasp_params(grasps, 0.03, FINGER_WIDTH, FINGER_LENGTH)
    got = collision_counts_pallas(
        scene, valid, params, tg=32, tn=256, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_counts_no_valid_mask_and_padding():
    rng = np.random.default_rng(1)
    n, g = 257, 33  # deliberately off the tile sizes
    scene = jnp.asarray(_scene(rng, n))
    grasps = jnp.asarray(_random_grasps(rng, g))
    ref = jnp.stack(
        _collision_counts_xla(scene, grasps, None, approach_dist=0.03), axis=-1
    )
    params = pack_grasp_params(grasps, 0.03, FINGER_WIDTH, FINGER_LENGTH)
    got = collision_counts_pallas(
        scene, jnp.ones((n,), bool), params, tg=16, tn=128, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_collision_detect_pallas_impl_matches():
    """collision_detect(impl='pallas') == impl='xla' end to end, incl. the
    empty-grasp and iou variants, under vmap (the pipeline's usage)."""
    rng = np.random.default_rng(2)
    b, n, g = 2, 400, 64
    scenes = jnp.asarray(np.stack([_scene(rng, n) for _ in range(b)]))
    grasps = jnp.asarray(np.stack([_random_grasps(rng, g) for _ in range(b)]))
    valid = jnp.asarray(rng.random((b, n)) > 0.2)

    def run(impl):
        def one(s, gr, v):
            return collision_detect(
                s, gr, scene_valid=v, return_empty_grasp=True,
                return_ious=True, impl=impl,
            )

        return jax.vmap(one)(scenes, grasps, valid)

    cx, ex, ious_x = run("xla")
    # interpret-mode pallas under vmap: exercised via the kernel's jit
    # (pallas interpret works on CPU)
    import graspbalance_tpu.ops.pallas.collision_kernel as ck

    orig = ck.collision_counts_pallas

    def interp(*args, **kw):
        kw["interpret"] = True
        kw.setdefault("tg", 32)
        kw.setdefault("tn", 128)
        return orig(*args, **kw)

    ck.collision_counts_pallas = interp
    try:
        # re-import site binds at call time (function-local import)
        cp, ep, ious_p = run("pallas")
    finally:
        ck.collision_counts_pallas = orig

    np.testing.assert_array_equal(np.asarray(cx), np.asarray(cp))
    np.testing.assert_array_equal(np.asarray(ex), np.asarray(ep))
    for a, c in zip(ious_x, ious_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-6)
