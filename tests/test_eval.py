"""Eval post-processing tests: collision detection, voxel downsample, NMS."""

import numpy as np
import jax.numpy as jnp

from graspbalance_tpu.eval.collision import (
    FINGER_LENGTH,
    FINGER_WIDTH,
    collision_detect,
    voxel_downsample,
)
from graspbalance_tpu.eval.nms import grasp_nms
from graspbalance_tpu.labels.geometry import batch_viewpoint_params_to_matrix


def make_grasp(center, rot, width=0.06, height=0.02, depth=0.02, score=1.0):
    row = np.zeros(17, np.float32)
    row[0] = score
    row[1] = width
    row[2] = height
    row[3] = depth
    row[4:13] = rot.reshape(-1)
    row[13:16] = center
    row[16] = -1
    return row


def collision_oracle(scene, grasps, voxel=0.005, approach=0.03, thresh=0.05):
    """Independent numpy transcription of the reference box math
    (collision_detector.py:16-48)."""
    approach = max(approach, FINGER_WIDTH)
    T = grasps[:, 13:16]
    R = grasps[:, 4:13].reshape(-1, 3, 3)
    h = grasps[:, 2:3]
    d = grasps[:, 3:4]
    w = grasps[:, 1:2]
    t = np.matmul(scene[None] - T[:, None], R)
    m1 = (t[..., 2] > -h / 2) & (t[..., 2] < h / 2)
    m2 = (t[..., 0] > d - FINGER_LENGTH) & (t[..., 0] < d)
    m3 = t[..., 1] > -(w / 2 + FINGER_WIDTH)
    m4 = t[..., 1] < -w / 2
    m5 = t[..., 1] < (w / 2 + FINGER_WIDTH)
    m6 = t[..., 1] > w / 2
    m7 = (t[..., 0] <= d - FINGER_LENGTH) & (
        t[..., 0] > d - FINGER_LENGTH - FINGER_WIDTH
    )
    m8 = (t[..., 0] <= d - FINGER_LENGTH - FINGER_WIDTH) & (
        t[..., 0] > d - FINGER_LENGTH - FINGER_WIDTH - approach
    )
    mask = (m1 & m2 & m3 & m4) | (m1 & m2 & m5 & m6) | (m1 & m3 & m5 & m7) | (
        m1 & m3 & m5 & m8
    )
    v3 = voxel**3
    vol = (
        2 * h * FINGER_LENGTH * FINGER_WIDTH
        + h * (w + 2 * FINGER_WIDTH) * FINGER_WIDTH
        + h * (w + 2 * FINGER_WIDTH) * approach
    )[:, 0] / v3
    return mask.sum(1) / (vol + 1e-6) > thresh


class TestCollision:
    def test_matches_oracle_random(self, rng):
        scene = (rng.random((500, 3), dtype=np.float32) - 0.5) * 0.3
        angles = rng.random(20).astype(np.float32) * np.pi
        towards = rng.standard_normal((20, 3)).astype(np.float32)
        rots = np.asarray(
            batch_viewpoint_params_to_matrix(jnp.asarray(towards), jnp.asarray(angles))
        )
        grasps = np.stack(
            [
                make_grasp(
                    (rng.random(3) - 0.5) * 0.2,
                    rots[i],
                    width=rng.uniform(0.02, 0.1),
                    depth=rng.uniform(0.01, 0.04),
                )
                for i in range(20)
            ]
        ).astype(np.float32)
        got = np.asarray(collision_detect(jnp.asarray(scene), jnp.asarray(grasps)))
        want = collision_oracle(scene, grasps)
        np.testing.assert_array_equal(got, want)

    def test_free_space_grasp_no_collision(self, rng):
        scene = (rng.random((200, 3), dtype=np.float32) - 0.5) * 0.1
        g = make_grasp(np.array([10.0, 10.0, 10.0]), np.eye(3, dtype=np.float32))
        got = np.asarray(collision_detect(jnp.asarray(scene), jnp.asarray(g[None])))
        assert not got[0]

    def test_wall_behind_fingers_collides(self):
        # dense plane inside the left finger box region
        ys = np.linspace(-0.045, -0.041, 5)
        xs = np.linspace(-0.03, 0.01, 30)
        zs = np.linspace(-0.009, 0.009, 8)
        pts = np.stack(np.meshgrid(xs, ys, zs), -1).reshape(-1, 3).astype(np.float32)
        g = make_grasp(np.zeros(3), np.eye(3, dtype=np.float32), width=0.08, depth=0.01)
        got = np.asarray(collision_detect(jnp.asarray(pts), jnp.asarray(g[None])))
        want = collision_oracle(pts, g[None])
        np.testing.assert_array_equal(got, want)
        assert got[0]

    def test_voxel_downsample(self, rng):
        pts = rng.random((1000, 3)).astype(np.float32) * 0.05
        out = voxel_downsample(pts, 0.01)
        # one centroid per occupied voxel
        vox = np.floor(pts / 0.01).astype(int)
        n_occ = len(np.unique(vox, axis=0))
        assert out.shape == (n_occ, 3)

    def test_voxel_downsample_fixed_matches_host(self, rng):
        from graspbalance_tpu.eval.collision import voxel_downsample_fixed

        pts = ((rng.random((800, 3)) - 0.5) * 0.3).astype(np.float32)
        dev_pts, dev_valid = voxel_downsample_fixed(jnp.asarray(pts), voxel_size=0.01)
        dev = np.asarray(dev_pts)[np.asarray(dev_valid)]
        host = voxel_downsample(pts, 0.01)
        assert dev.shape == host.shape
        # same centroid set (order differs: lex voxel order vs host key order)
        np.testing.assert_allclose(
            np.sort(dev, axis=0), np.sort(host, axis=0), atol=1e-6
        )

    def test_voxel_downsample_fixed_respects_valid_mask(self, rng):
        from graspbalance_tpu.eval.collision import voxel_downsample_fixed

        pts = ((rng.random((300, 3)) - 0.5) * 0.3).astype(np.float32)
        valid = rng.random(300) > 0.4
        dev_pts, dev_valid = voxel_downsample_fixed(
            jnp.asarray(pts), jnp.asarray(valid), voxel_size=0.01
        )
        dev = np.asarray(dev_pts)[np.asarray(dev_valid)]
        host = voxel_downsample(pts[valid], 0.01)
        np.testing.assert_allclose(
            np.sort(dev, axis=0), np.sort(host, axis=0), atol=1e-6
        )

    def test_collision_on_downsampled_scene_matches_reference_wiring(self, rng):
        """E2E wiring check: collision on the device-downsampled dense scene
        == the reference semantics (host o3d-style downsample -> IoU count,
        collision_detector.py:11-48), and differs from feeding the raw dense
        cloud (which the reference never does)."""
        from graspbalance_tpu.eval.collision import voxel_downsample_fixed

        # dense wall plane inside the left finger box: ~40x denser than the
        # 5 mm voxel grid, so raw-point IoU is wildly inflated
        ys = np.linspace(-0.045, -0.041, 4)
        xs = np.linspace(-0.03, 0.01, 60)
        zs = np.linspace(-0.009, 0.009, 16)
        wall = np.stack(np.meshgrid(xs, ys, zs), -1).reshape(-1, 3)
        bg = ((rng.random((2000, 3)) - 0.5) * 0.5 + np.array([0.3, 0.3, 0.0]))
        # de-align from exact voxel boundaries: the device downsample bins in
        # f32, the host (o3d-parity) path in f64; points exactly on a 5 mm
        # boundary can land in either voxel (documented deviation, irrelevant
        # for sensor data)
        scene = (np.concatenate([wall, bg]) + 1.37e-4).astype(np.float32)
        g = make_grasp(
            np.zeros(3), np.eye(3, dtype=np.float32), width=0.08, depth=0.01
        )[None]

        s_ds, s_valid = voxel_downsample_fixed(jnp.asarray(scene))
        _, ious = collision_detect(
            s_ds, jnp.asarray(g), scene_valid=s_valid, return_ious=True
        )
        got_iou = float(np.asarray(ious[0])[0])
        want_iou_scene = voxel_downsample(scene, 0.005)
        want = collision_oracle(want_iou_scene, g)
        got = np.asarray(
            collision_detect(s_ds, jnp.asarray(g), scene_valid=s_valid)
        )
        np.testing.assert_array_equal(got, want)
        # raw dense cloud inflates the occupancy count -> different regime
        _, ious_raw = collision_detect(
            jnp.asarray(scene), jnp.asarray(g), return_ious=True
        )
        assert float(np.asarray(ious_raw[0])[0]) > 3 * got_iou


def nms_oracle(grasps, valid, t_thresh=0.03, r_thresh=np.deg2rad(30)):
    order = np.argsort(-np.where(valid, grasps[:, 0], -np.inf))
    keep = np.zeros(len(grasps), bool)
    alive = valid.copy()
    for i in order:
        if not alive[i]:
            continue
        keep[i] = True
        alive[i] = False
        for j in np.flatnonzero(alive):
            dt = np.linalg.norm(grasps[i, 13:16] - grasps[j, 13:16])
            ri = grasps[i, 4:13].reshape(3, 3)
            rj = grasps[j, 4:13].reshape(3, 3)
            cos = np.clip((np.trace(ri.T @ rj) - 1) / 2, -1, 1)
            if dt < t_thresh and np.arccos(cos) < r_thresh:
                alive[j] = False
    return keep


class TestNMS:
    def test_matches_oracle(self, rng):
        angles = rng.random(40).astype(np.float32) * np.pi
        towards = rng.standard_normal((40, 3)).astype(np.float32)
        rots = np.asarray(
            batch_viewpoint_params_to_matrix(jnp.asarray(towards), jnp.asarray(angles))
        )
        grasps = np.stack(
            [
                make_grasp(
                    (rng.random(3) - 0.5) * 0.1, rots[i], score=rng.random()
                )
                for i in range(40)
            ]
        ).astype(np.float32)
        valid = rng.random(40) > 0.2
        got = np.asarray(grasp_nms(jnp.asarray(grasps), jnp.asarray(valid)))
        want = nms_oracle(grasps, valid)
        np.testing.assert_array_equal(got, want)

    def test_identical_grasps_keep_one(self):
        g = make_grasp(np.zeros(3), np.eye(3, dtype=np.float32), score=0.5)
        grasps = np.stack([g, g, g])
        grasps[1, 0] = 0.9  # highest score wins
        keep = np.asarray(grasp_nms(jnp.asarray(grasps)))
        assert keep.tolist() == [False, True, False]
