"""End-to-end inference pipeline.

The reference ships no eval/demo driver (SURVEY.md §0: decode, NMS and
collision filtering exist but nothing strings them together); this module
supplies it, with everything up to the final host copy running on device:

  cloud -> [DSN -> mean-shift clustering] -> GraspBalance forward with
  object-balanced re-seeding -> pred_decode -> grasp NMS -> collision
  filter -> (G, 17) grasp arrays + keep masks.

`to_grasp_group_array` emits the 17-column layout graspnetAPI's GraspGroup
reads directly (GraspGroup(np_array) / .save_npy), so AP evaluation runs
with the stock `graspnetAPI.GraspNetEval` once that package and the dataset
are present.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from graspbalance_tpu.eval.collision import (
    collision_detect,
    voxel_downsample_fixed,
)
from graspbalance_tpu.eval.nms import grasp_nms
from graspbalance_tpu.models.decode import pred_decode
from graspbalance_tpu.models.dsn import DSN, cluster
from graspbalance_tpu.utils.compile_opts import tpu_compiler_options


def make_postprocess(collision_thresh: float = 0.05):
    """The shared post-decode stack: grasp NMS + voxel-downsampled
    collision filter, jitted and batched. Used by GraspInference and by
    the oracle-ceiling evaluator (eval/quality.evaluate_oracle_quality),
    so the ceiling runs through EXACTLY the pipeline the model's grasps
    run through."""

    @functools.partial(
        jax.jit, compiler_options=tpu_compiler_options("eval")
    )
    def _postprocess(grasps, valid, scene):
        def one(g, v, s):
            keep = grasp_nms(g, v)
            # the reference counts occupancy on a 5 mm voxel-downsampled
            # scene (collision_detector.py:11-14); the IoU threshold is
            # only meaningful at that density
            s_ds, s_valid = voxel_downsample_fixed(s)
            coll = collision_detect(
                s_ds, g, scene_valid=s_valid,
                collision_thresh=collision_thresh,
            )
            return keep & ~coll

        return jax.vmap(one)(grasps, valid, scene)

    return _postprocess


class GraspInference:
    """Bundles a trained GraspBalance (+ optional DSN) for scene inference."""

    def __init__(self, model, variables, dsn: DSN | None = None, dsn_variables=None,
                 use_obs: bool = False, collision_thresh: float = 0.05):
        self.model = model
        self.variables = variables
        self.dsn = dsn
        self.dsn_variables = dsn_variables
        self.use_obs = use_obs and dsn is not None
        self.collision_thresh = collision_thresh

        @functools.partial(
            jax.jit, compiler_options=tpu_compiler_options("eval")
        )
        def _forward(variables, batch):
            ep = model.apply(variables, batch, train=False)
            grasps, valid = pred_decode(ep)
            return grasps, valid

        self._forward = _forward

        if self.use_obs:
            # one FPS serves both networks: greedy FPS re-traces itself, so
            # the DSN backbone's stage-0 sample and the model backbone's are
            # prefixes of one run over the same cloud (the nested-prefix
            # property tested in test_ops.py::TestFPS::test_prefix_property)
            from graspbalance_tpu import ops
            from graspbalance_tpu.models.drp import DRP_STAGES

            n0_dsn = dsn.pt_stages[0][0]
            n0_model = (getattr(model, "backbone_stages", None) or DRP_STAGES)[0][0]
            n0 = max(n0_dsn, n0_model)

            @functools.partial(
                jax.jit, compiler_options=tpu_compiler_options("eval")
            )
            def _segment(dsn_vars, cloud, rng):
                sa_full = ops.furthest_point_sample(cloud[..., :3], n0)
                ep = dsn.apply(
                    dsn_vars, cloud, sa_inds=sa_full[:, :n0_dsn], train=False
                )
                fg = jnp.argmax(ep["foreground_logits"], axis=-1) == 1
                labels, _, _ = cluster(
                    cloud[..., :3], ep["center_offsets"], fg, rng
                )
                return labels, sa_full[:, :n0_model]

            self._segment = _segment

        self._postprocess = make_postprocess(self.collision_thresh)

    def __call__(self, cloud: jnp.ndarray, rng=None) -> tuple[np.ndarray, np.ndarray]:
        """cloud (B, N, 3) -> (grasps (B, Ns, 17) np, keep (B, Ns) np)."""
        batch = {"point_clouds": cloud}
        if self.use_obs:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            labels, sa_inds = self._segment(self.dsn_variables, cloud, rng)
            batch["seed_cluster"] = labels
            batch["sa_inds"] = sa_inds
        grasps, valid = self._forward(self.variables, batch)
        keep = self._postprocess(grasps, valid, cloud[..., :3])
        return np.asarray(grasps), np.asarray(keep)


def to_grasp_group_array(grasps: np.ndarray, keep: np.ndarray) -> np.ndarray:
    """(Ns, 17), (Ns,) -> (G, 17) float32 rows in graspnetAPI GraspGroup
    column order [score, width, height, depth, rotation(9), translation(3),
    object_id] — feed to GraspGroup(arr) or np.save for eval."""
    return grasps[keep].astype(np.float32)


def dump_dataset(
    infer: GraspInference,
    ds,
    dump_dir: str,
    camera: str,
    batch_size: int = 4,
    max_frames: int = 0,
    log=print,
) -> int:
    """Run inference over a GraspNetDataset (load_label=False) and write the
    per-frame (G, 17) npy files in graspnetAPI's GraspNetEval layout
    (dump_dir/scene_xxxx/<camera>/xxxx.npy). Returns frames written."""
    import os

    from graspbalance_tpu.data.dataset import collate

    os.makedirs(dump_dir, exist_ok=True)
    n = len(ds) if not max_frames else min(len(ds), max_frames)
    for i in range(0, n, batch_size):
        items = [ds[j] for j in range(i, min(i + batch_size, n))]
        batch = collate(items)
        grasps, keep = infer(jnp.asarray(batch["point_clouds"]))
        for j, item_idx in enumerate(range(i, min(i + batch_size, n))):
            scene, frame = ds.samples[item_idx]
            out_dir = os.path.join(dump_dir, scene, camera)
            os.makedirs(out_dir, exist_ok=True)
            np.save(
                os.path.join(out_dir, f"{frame:04d}.npy"),
                to_grasp_group_array(grasps[j], keep[j]),
            )
        if (i // batch_size) % 10 == 0:
            log(f"{i + len(items)}/{n}")
    return n
