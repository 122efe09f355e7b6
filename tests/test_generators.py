"""Offline generator tests: tolerance labels vs a literal transcription of
the reference sweep, PLY reader, table grid, CAD projection crop."""

import io
import os

import numpy as np
import pytest

from graspbalance_tpu.data.generators import (
    RADII,
    create_table_points,
    project_models_to_camera,
    read_ply_vertices,
    tolerance_for_object,
)


def tolerance_oracle(points, scores, pos_ratio_thresh=0.8, mu_thresh=0.55):
    """Literal loop transcription of generate_tolerance_label.py:73-87."""
    n = len(points)
    dists = np.linalg.norm(points[:, None] - points[None], axis=-1)
    out = np.zeros((n,) + scores.shape[1:], np.float32)
    for i in range(n):
        tmp = np.zeros(scores.shape[1:], np.float32)
        for r in RADII:
            mask = dists[i] <= r
            sib = scores[mask]
            pos_ratio = ((sib > 0) & (sib <= mu_thresh)).mean(axis=0)
            tmask = pos_ratio >= pos_ratio_thresh
            if tmask.sum() == 0:
                break
            tmp[tmask] = r
        out[i] = tmp
    return out


class TestTolerance:
    def test_matches_oracle(self, rng):
        n, v, a, d = 25, 6, 3, 2
        pts = (rng.random((n, 3), dtype=np.float32) - 0.5) * 0.08
        scores = rng.random((n, v, a, d)).astype(np.float32) * 1.2
        scores[rng.random((n, v, a, d)) < 0.3] = 0
        got = tolerance_for_object(pts, scores)
        want = tolerance_oracle(pts, scores)
        np.testing.assert_allclose(got, want, atol=1e-7)

    def test_all_positive_max_radius(self, rng):
        pts = (rng.random((10, 3), dtype=np.float32) - 0.5) * 0.01
        scores = np.full((10, 2, 2, 2), 0.4, np.float32)
        got = tolerance_for_object(pts, scores)
        np.testing.assert_allclose(got, 0.05, atol=1e-7)


class TestPly:
    def test_ascii_roundtrip(self, tmp_path, rng):
        pts = rng.random((7, 3)).astype(np.float32)
        p = tmp_path / "m.ply"
        with open(p, "w") as f:
            f.write("ply\nformat ascii 1.0\n")
            f.write(f"element vertex {len(pts)}\n")
            f.write("property float x\nproperty float y\nproperty float z\n")
            f.write("end_header\n")
            for row in pts:
                f.write(" ".join(f"{v:.6f}" for v in row) + "\n")
        got = read_ply_vertices(str(p))
        np.testing.assert_allclose(got, pts, atol=1e-5)

    def test_binary_roundtrip(self, tmp_path, rng):
        import struct

        pts = rng.random((5, 3)).astype(np.float32)
        p = tmp_path / "m.ply"
        with open(p, "wb") as f:
            f.write(b"ply\nformat binary_little_endian 1.0\n")
            f.write(f"element vertex {len(pts)}\n".encode())
            f.write(b"property float x\nproperty float y\nproperty float z\n")
            f.write(b"end_header\n")
            for row in pts:
                f.write(struct.pack("<fff", *row))
        got = read_ply_vertices(str(p))
        np.testing.assert_allclose(got, pts, atol=1e-6)


class TestCleanScene:
    def test_table_grid_shape(self):
        t = create_table_points(1.0, 1.0, 0.01, dx=-0.5, dy=-0.5)
        assert t.shape[1] == 3
        assert t[:, 0].min() >= -0.5 and t[:, 0].max() <= 0.5

    def test_projection_crop(self, rng):
        # one fake model near the observed cloud, one far away
        model_near = (rng.random((200, 3), dtype=np.float32) - 0.5) * 0.04
        pose_near = np.eye(4, dtype=np.float32)
        pose_near[2, 3] = 0.5
        model_far = model_near.copy()
        pose_far = np.eye(4, dtype=np.float32)
        pose_far[2, 3] = 5.0
        observed = (rng.random((500, 3), dtype=np.float32) - 0.5) * 0.05
        observed[:, 2] += 0.5
        pts, seg = project_models_to_camera(
            [model_near, model_far],
            [0, 1],
            [pose_near[:3], pose_far[:3]],
            observed,
            np.eye(4),
            np.eye(4),
        )
        assert (seg == 1).sum() > 0  # near model survives the 8mm crop
        assert (seg == 2).sum() == 0  # far model cropped away
