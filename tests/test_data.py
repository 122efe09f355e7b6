"""Data pipeline tests: loader contract on a fabricated mini-dataset,
native library parity, host utilities."""

import os

import numpy as np
import pytest

from graspbalance_tpu.data import native
from graspbalance_tpu.data.dataset import (
    GraspNetDataset,
    collate,
    load_grasp_labels,
)
from graspbalance_tpu.data.utils import (
    CameraInfo,
    augment_flip_rot,
    create_point_cloud_from_depth_image,
    get_workspace_mask,
    remove_invisible_grasp_points,
)
from tests import oracles


def fabricate_dataset(
    root, n_scenes=1, n_frames=2, n_objects=3, rng=None, real_depth=False
):
    """Write a minimal GraspNet-1B-shaped tree: clean_scenes npys, meta
    mats, grasp_label npzs, collision labels, tolerance.

    With real_depth=True the depth/label pngs describe an actual scene
    (constant 800 mm depth, object-id bands) so the raw-depth/NcM loader
    paths produce usable clouds; the 0.8 m z-plane is a recognizable
    signature distinguishing noisy-path points from the ~0.5 m clean scene."""
    import scipy.io as scio

    rng = rng or np.random.default_rng(0)
    v, a, d = 30, 12, 4
    np_obj = 120
    os.makedirs(os.path.join(root, "grasp_label"), exist_ok=True)
    os.makedirs(os.path.join(root, "tolerance"), exist_ok=True)
    for i in range(n_objects):
        pts = (rng.random((np_obj, 3), np.float32) - 0.5) * 0.06
        offsets = rng.random((np_obj, v, a, d, 3)).astype(np.float32) * 0.1
        scores = rng.random((np_obj, v, a, d)).astype(np.float32)
        np.savez(
            os.path.join(root, "grasp_label", f"{i:03d}_labels.npz"),
            points=pts, offsets=offsets, scores=scores,
        )
        np.save(
            os.path.join(root, "tolerance", f"{i:03d}_tolerance.npy"),
            rng.random((np_obj, v, a, d)).astype(np.float32) * 0.05,
        )

    for s in range(n_scenes):
        scene = f"scene_{s:04d}"
        base = os.path.join(root, "scenes", scene, "realsense")
        for sub in ("depth", "label", "meta"):
            os.makedirs(os.path.join(base, sub), exist_ok=True)
        cbase = os.path.join(root, "clean_scenes", scene, "realsense")
        for sub in ("points", "seg"):
            os.makedirs(os.path.join(cbase, sub), exist_ok=True)
        coll_dir = os.path.join(root, "collision_label", scene)
        os.makedirs(coll_dir, exist_ok=True)
        colls = {
            f"arr_{i}": rng.random((np_obj, v, a, d)) < 0.3
            for i in range(n_objects)
        }
        np.savez(os.path.join(coll_dir, "collision_labels.npz"), **colls)

        for f in range(n_frames):
            n_pts = 3000
            centers = (rng.random((n_objects, 3), np.float32) - 0.5) * 0.3
            centers[:, 2] += 0.5
            pts, seg = [], []
            for i in range(n_objects):
                p = (rng.random((600, 3), np.float32) - 0.5) * 0.06 + centers[i]
                pts.append(p)
                seg.append(np.full(600, i + 1, np.int32))
            table = (rng.random((n_pts - 600 * n_objects, 3), np.float32) - 0.5)
            table[:, 2] = 0.55
            pts.append(table)
            seg.append(np.zeros(len(table), np.int32))
            cloud = np.concatenate(pts)
            seg = np.concatenate(seg)
            np.save(os.path.join(cbase, "points", f"{f:04d}.npy"), cloud)
            np.save(os.path.join(cbase, "seg", f"{f:04d}.npy"), seg)
            from PIL import Image

            if real_depth:
                # constant 800 mm plane with object-id bands in the label img
                h = w = 64
                depth_img = np.full((h, w), 800, np.uint16)
                label_img = np.zeros((h, w), np.uint8)
                band = w // (n_objects + 1)
                for i in range(n_objects):
                    label_img[:, i * band : (i + 1) * band] = i + 1
                Image.fromarray(depth_img).save(
                    os.path.join(base, "depth", f"{f:04d}.png")
                )
                os.makedirs(os.path.join(base, "label"), exist_ok=True)
                Image.fromarray(label_img).save(
                    os.path.join(base, "label", f"{f:04d}.png")
                )
            else:
                # depth frame placeholder (unused by the clean path)
                Image.fromarray(np.zeros((8, 8), np.uint16)).save(
                    os.path.join(base, "depth", f"{f:04d}.png")
                )
            poses = np.zeros((3, 4, n_objects), np.float32)
            for i in range(n_objects):
                poses[:, :3, i] = np.eye(3)
                poses[:, 3, i] = centers[i]
            scio.savemat(
                os.path.join(base, "meta", f"{f:04d}.mat"),
                {
                    "cls_indexes": np.arange(1, n_objects + 1).reshape(-1, 1),
                    "poses": poses,
                    "intrinsic_matrix": np.array(
                        [[600.0, 0, 4], [0, 600.0, 4], [0, 0, 1]]
                    ),
                    "factor_depth": np.array([[1000.0]]),
                },
            )
    return root


class TestLoader:
    @pytest.fixture(scope="class")
    def ds(self, tmp_path_factory):
        root = str(tmp_path_factory.mktemp("graspnet"))
        fabricate_dataset(root)
        valid, labels = load_grasp_labels(root)
        return GraspNetDataset(
            root, valid, labels,
            camera="realsense", split="all", num_points=2048,
            max_objects=4, max_grasp_points=256,
            remove_outlier=False, remove_invisible=True,
        )

    def test_contract_shapes(self, ds):
        item = ds[0]
        assert item["point_clouds"].shape == (2048, 3)
        assert item["objectness_label"].shape == (2048,)
        assert item["object_poses"].shape == (4, 3, 4)
        assert item["grasp_points"].shape == (256, 3)
        assert item["grasp_labels"].shape[0] == 256
        assert item["grasp_labels"].shape[1:] == (30, 12, 4)
        assert item["obj_mask"].sum() >= 1
        assert item["grasp_pt_mask"].sum() >= 100

    def test_labels_reference_objects(self, ds):
        item = ds[0]
        used = item["grasp_pt_obj"][item["grasp_pt_mask"]]
        assert used.max() < item["obj_mask"].sum()

    def test_collate(self, ds):
        batch = collate([ds[0], ds[1]])
        assert batch["point_clouds"].shape == (2, 2048, 3)
        assert batch["grasp_labels"].shape == (2, 256, 30, 12, 4)

    def test_dense_scene_proportional_truncation(self, tmp_path_factory):
        """A scene whose per-object reference take counts overflow
        max_grasp_points must shrink every object PROPORTIONALLY (reference
        semantics keep min(max(Np/4,300),Np) per object with no global cap,
        graspnet_dataset.py:208) — never silently drop trailing objects."""
        root = str(tmp_path_factory.mktemp("graspnet_dense"))
        fabricate_dataset(root)
        valid, labels = load_grasp_labels(root)
        # remove_invisible=False makes desired counts exact: each of the 3
        # objects has 120 labeled points < 300, so desired = 120 each
        # (total 360) against a 256-point cap -> largest-remainder takes
        # are floor(120*256/360)=85 each plus one leftover slot = [85,85,86]
        ds = GraspNetDataset(
            root, valid, labels,
            camera="realsense", split="all", num_points=2048,
            max_objects=4, max_grasp_points=256,
            remove_outlier=False, remove_invisible=False,
        )
        assert ds.truncated_items == 0
        item = ds[0]
        assert ds.truncated_items == 1
        assert ds.truncated_points == 360 - 256
        used_obj = item["grasp_pt_obj"][item["grasp_pt_mask"]]
        n_obj = int(item["obj_mask"].sum())
        assert n_obj == 3
        counts = np.bincount(used_obj, minlength=n_obj)
        assert sorted(counts) == [85, 85, 86]  # every object keeps its share
        assert item["grasp_pt_mask"].sum() == 256  # buffer fully used

        # control: a cap that fits takes the full reference counts
        ds_big = GraspNetDataset(
            root, valid, labels,
            camera="realsense", split="all", num_points=2048,
            max_objects=4, max_grasp_points=512,
            remove_outlier=False, remove_invisible=False,
        )
        item = ds_big[0]
        assert ds_big.truncated_items == 0
        counts = np.bincount(
            item["grasp_pt_obj"][item["grasp_pt_mask"]], minlength=3
        )
        assert list(counts) == [120, 120, 120]


class TestHostUtils:
    def test_depth_projection(self, rng):
        depth = (rng.random((16, 16)) * 1000).astype(np.uint16)
        cam = CameraInfo(16, 16, 600.0, 600.0, 8.0, 8.0, 1000.0)
        cloud = create_point_cloud_from_depth_image(depth, cam)
        assert cloud.shape == (16, 16, 3)
        np.testing.assert_allclose(cloud[..., 2], depth / 1000.0)
        # native parity
        if native.available():
            nat = native.depth_to_cloud(depth, 600.0, 600.0, 8.0, 8.0, 1000.0)
            np.testing.assert_allclose(nat, cloud, atol=1e-6)

    def test_workspace_mask(self, rng):
        cloud = rng.random((100, 3), dtype=np.float32)
        seg = np.zeros(100, np.int32)
        seg[40:60] = 1
        # strict-inequality bbox (data_utils.py:66-68): the extreme
        # foreground points need a nonzero outlier margin to be included
        mask = get_workspace_mask(cloud, seg, organized=False, outlier=0.01)
        assert mask[40:60].all()

    def test_augment_consistency(self, rng):
        """Transformed label points must land on transformed cloud points."""
        cloud = rng.random((50, 3), dtype=np.float32)
        pose = np.zeros((1, 3, 4), np.float32)
        pose[0, :, :3] = np.eye(3)
        pose[0, :, 3] = cloud[7]  # object at cloud point 7
        c2, p2, _ = augment_flip_rot(cloud, pose, rng)
        np.testing.assert_allclose(p2[0, :, 3], c2[7], atol=1e-5)


class TestNative:
    @pytest.mark.skipif(not native.available(), reason="native lib not built")
    def test_fps_parity(self, rng):
        pts = (rng.random((500, 3), dtype=np.float32) - 0.5)
        got = native.host_fps(pts, 64)
        want = oracles.fps_oracle(pts, 64)
        np.testing.assert_array_equal(got, want)

    @pytest.mark.skipif(not native.available(), reason="native lib not built")
    def test_visibility_parity(self, rng):
        cloud = rng.random((300, 3), dtype=np.float32)
        gp = rng.random((100, 3), dtype=np.float32)
        pose = np.eye(4, dtype=np.float32)[:3]
        got = native.visibility_mask(cloud, gp, pose, 0.05)
        want = remove_invisible_grasp_points(cloud, gp, pose, 0.05)
        np.testing.assert_array_equal(got, want)

    @pytest.mark.skipif(not native.available(), reason="native lib not built")
    def test_voxel_downsample_counts(self, rng):
        pts = rng.random((1000, 3)).astype(np.float32) * 0.05
        out = native.voxel_downsample(pts, 0.01)
        vox = np.floor(pts / 0.01).astype(int)
        assert len(out) == len(np.unique(vox, axis=0))


class TestDatasetVariants:
    def test_paired_and_offsets(self, tmp_path_factory):
        root = str(tmp_path_factory.mktemp("gn2"))
        fabricate_dataset(root)
        valid, labels = load_grasp_labels(root)
        ds = GraspNetDataset(
            root, valid, labels, camera="realsense", split="all",
            num_points=1024, max_objects=4, max_grasp_points=256,
            remove_outlier=False, remove_invisible=False,
            paired=True, return_center_offsets=True,
        )
        item = ds[0]
        assert item["clean_point_clouds"].shape == (1024, 3)
        assert item["center_offset_label"].shape == (1024, 3)
        seg = item["instance_label"]
        pc = item["point_clouds"]
        off = item["center_offset_label"]
        obj = seg[seg > 0][0]
        m = seg == obj
        np.testing.assert_allclose(
            pc[m] + off[m], np.tile(pc[m].mean(0), (m.sum(), 1)), atol=1e-5
        )
        np.testing.assert_allclose(off[seg == 0], 0.0)


class TestNcM:
    """NcM noisy-clean mix semantics, pinned to the reference composition
    (graspnet_wonoise_dataset.py): __getitem__ mode='mix' draws a 50/50
    branch (:151-157); the noisy branch runs mix() = per-object 75% noisy
    camera points / 25% clean CAD points (:924-937)."""

    def test_mix_per_object_75_25_selection(self):
        ds = GraspNetDataset.__new__(GraspNetDataset)  # _mix is self-free

        class FakeRng:
            def __init__(self, vals):
                self.vals = list(vals)

            def random(self):
                return self.vals.pop(0)

        pcd = np.array([[1.0, 0, 0], [2.0, 0, 0], [3.0, 0, 0]], np.float32)
        pcd_seg = np.array([0, 1, 2], np.int32)
        cpcd = -pcd
        cpcd_seg = pcd_seg.copy()
        # draws per object id in sorted-unique order: >0.25 keeps noisy
        mixed, seg = ds._mix(pcd, pcd_seg, cpcd, cpcd_seg,
                             FakeRng([0.5, 0.1, 0.9]))
        np.testing.assert_allclose(mixed[:, 0], [1.0, -2.0, 3.0])
        np.testing.assert_array_equal(seg, [0, 1, 2])

    def test_ncm_branch_composition(self, tmp_path_factory):
        root = str(tmp_path_factory.mktemp("gn_ncm"))
        fabricate_dataset(root, real_depth=True)
        ds = GraspNetDataset(
            root, [], {}, camera="realsense", split="all", num_points=256,
            load_label=False, remove_outlier=False, ncm=True,
        )
        # the raw-depth scene is a z=0.8 plane; the clean scene sits ~0.5 m.
        n_noisy_items = 0
        n_items = 0
        for epoch in range(20):
            ds.set_epoch(epoch) if hasattr(ds, "set_epoch") else setattr(
                ds, "epoch", epoch
            )
            for idx in range(len(ds)):
                pc = ds[idx]["point_clouds"]
                n_items += 1
                has_noisy = np.any(np.isclose(pc[:, 2], 0.8, atol=1e-3))
                has_clean = np.any(pc[:, 2] < 0.7)
                if has_noisy:
                    n_noisy_items += 1
                    # noisy branch mixes per object: clean points may or may
                    # not appear, but pure-clean items must have NO 0.8 plane
                else:
                    assert has_clean
        # 50/50 branch: expect roughly half the items to carry noisy points
        # ((1-0.25^4)~0.996 of noisy-branch items keep some noisy object)
        frac = n_noisy_items / n_items
        assert 0.25 < frac < 0.75, frac
