"""DSN: instance segmentation head for object-balanced sampling.

Rebuild of TrainModel/dsn.py:19-58: a point-transformer backbone (written
from scratch in point_transformer.py — the reference's pct_zh module is
absent from its repo) -> foreground logits + 3D center offsets at the seed
level -> inverse-distance upsampling to the full cloud. The mean-shift
clustering lives in eval/meanshift.py; the seg losses in labels/seg_losses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from graspbalance_tpu.models.point_transformer import PointTransformerSeg
from graspbalance_tpu.nn.layers import MLPBlock
from graspbalance_tpu.ops.interpolate import interpolate_features
from graspbalance_tpu.eval.meanshift import mean_shift_cluster


class DSN(nn.Module):
    pt_stages: tuple = (
        (2048, 0.05, 32, 64, 1),
        (1024, 0.1, 16, 128, 2),
    )
    dtype: jnp.dtype = jnp.float32
    # attention-neighbor search: 'exact' (default) | 'approx' (TPU
    # approx-top-k speed mode, recall < 1.0 — see VectorAttention)
    knn_method: str = "exact"

    @nn.compact
    def __call__(self, pointcloud, *, sa_inds=None, train: bool = False, bn_momentum=0.1):
        """pointcloud (B, N, 3) -> dict with foreground_logits (B, N, 2)
        and center_offsets (B, N, 3), upsampled to the full cloud."""
        bb = PointTransformerSeg(
            stages=self.pt_stages, dtype=self.dtype,
            knn_method=self.knn_method, name="backbone"
        )(pointcloud, sa_inds=sa_inds, train=train, bn_momentum=bn_momentum)
        seed_xyz = bb["seed_xyz"]
        feats = bb["seed_features"]

        fg = MLPBlock(256, dtype=self.dtype, name="fg1")(
            feats, train=train, bn_momentum=bn_momentum
        )
        fg = nn.Dense(2, dtype=self.dtype, param_dtype=jnp.float32, name="fg2")(fg)
        off = MLPBlock(256, dtype=self.dtype, name="off1")(
            feats, train=train, bn_momentum=bn_momentum
        )
        off = nn.Dense(3, dtype=self.dtype, param_dtype=jnp.float32, name="off2")(off)

        xyz = pointcloud[..., :3]
        # one shared three_nn + gather for both heads (same query/ref pair)
        both = interpolate_features(
            xyz, seed_xyz,
            jnp.concatenate([fg.astype(jnp.float32), off.astype(jnp.float32)], axis=-1),
        )
        fg_full, off_full = both[..., :2], both[..., 2:]
        return {
            "seed_xyz": seed_xyz,
            "foreground_logits": fg_full,
            "center_offsets": off_full,
        }


def cluster(xyz: jnp.ndarray, offsets: jnp.ndarray, fg_mask: jnp.ndarray, rng, **kw):
    """DSN cluster() (dsn.py:68-113): mean shift over predicted centers
    (xyz + offsets) restricted to foreground; returns (labels (B, N) int32
    with 0 background, centers, center_valid). Batched via vmap."""
    centers_pred = xyz + offsets
    b = xyz.shape[0]
    rngs = jax.random.split(rng, b)
    return jax.vmap(
        lambda p, m, r: mean_shift_cluster(p, m, r, **kw)
    )(centers_pred, fg_mask, rngs)


def compute_center_offset_labels(xyz, instance_label, max_objects: int):
    """Ground-truth 3D offsets: vector from each point to its instance's
    centroid (background gets zero). xyz (B,N,3), instance_label (B,N)."""

    def single(p, lab):
        oh = jax.nn.one_hot(lab, max_objects + 1, dtype=p.dtype)  # (N, O+1)
        sums = jnp.einsum("no,nc->oc", oh, p)
        cnts = jnp.maximum(jnp.sum(oh, axis=0), 1.0)[:, None]
        centroids = sums / cnts
        target = centroids[lab]
        return jnp.where((lab > 0)[:, None], target - p, 0.0)

    return jax.vmap(single)(xyz, instance_label.astype(jnp.int32))
