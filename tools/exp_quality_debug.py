"""Per-grasp diagnostics for the quality gate (throwaway calibration aid)."""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax
import jax.numpy as jnp
import numpy as np

from graspbalance_tpu.data.synthetic import make_batch
from graspbalance_tpu.train.config import Config, DataConfig, ModelConfig, TrainConfig
from graspbalance_tpu.train import train_step as ts
from graspbalance_tpu.labels import analytic as an
from tiny import TINY_STAGES, TINY_QUALITY_SCENE, TINY_NUM_SEED, TINY_NUM_VIEW


def main(total_steps=600, bs=2, pool=4):
    scene = TINY_QUALITY_SCENE
    wide = tuple((n, r, k, (32, 32, 64), b, r2, k2)
                 for (n, r, k, _, b, r2, k2) in TINY_STAGES)
    cfg = Config(
        model=ModelConfig(num_view=TINY_NUM_VIEW, num_seed=TINY_NUM_SEED,
                          backbone_stages=wide),
        data=DataConfig(analytic_labels=True),
        train=TrainConfig(max_epoch=1, learning_rate=1e-3),
    )
    batch0 = make_batch(0, bs, scene)
    model, state = ts.create_train_state(cfg, total_steps, batch0)
    step_fn = ts.make_train_step(model, cfg)
    pool_batches = [
        {k: jnp.asarray(v) for k, v in make_batch(1 + i, bs, scene).items()}
        for i in range(pool)
    ]
    for i in range(total_steps):
        jb = pool_batches[i % pool]
        state, metrics = step_fn(state, jb, jnp.int32(0))
        if (i + 1) % 40 == 0:
            print(f"step {i+1}: " + " ".join(
                f"{k.split('/')[-1]}={float(v):.3f}" for k, v in sorted(metrics.items())
                if "stage1" in k or "overall" in k))
    print("final loss", float(metrics["loss/overall_loss"]))

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    from graspbalance_tpu.eval.pipeline import GraspInference
    from graspbalance_tpu.eval.nms import grasp_nms
    from graspbalance_tpu.models.decode import pred_decode

    infer = GraspInference(model, variables)
    b = make_batch(1, 2, scene)  # evaluate on a TRAINING scene (overfit gate)
    cloud = jnp.asarray(b["point_clouds"])
    # BN-mode probe: objectness argmax under batch stats (train-mode BN)
    ep_tr = model.apply(variables, {"point_clouds": cloud}, train=True,
                        match_labels=False, mutable=["batch_stats"])[0]
    print("train-BN valid:", np.asarray(jnp.argmax(ep_tr["objectness_score"], -1) == 1).sum(axis=1))
    ep = infer._forward(variables, {"point_clouds": cloud})
    grasps, valid = np.asarray(ep[0]), np.asarray(ep[1])
    keep_nms = np.asarray(jax.vmap(grasp_nms)(jnp.asarray(grasps), jnp.asarray(valid)))
    _, keep = infer(cloud)
    print("valid (objectness):", valid.sum(axis=1), "after nms:", keep_nms.sum(axis=1),
          "after collision:", keep.sum(axis=1))

    centers = b["object_poses"][:, :, :, 3]
    rot = grasps[..., 4:13].reshape(grasps.shape[:-1] + (3, 3))
    approach = rot[..., :, 0]
    closing = rot[..., :, 1]
    gc = grasps[..., 13:16]
    width = grasps[..., 1]
    disp = np.abs(gc[..., :, None, :] - centers[..., None, :, :])
    excess = np.maximum(disp - b["obj_sizes"][..., None, :, :] / 2.0, 0.0)
    dist = np.sqrt((excess ** 2).sum(-1))
    dist = np.where(b["obj_mask"][..., None, :], dist, 1e9)
    dmin = dist.min(-1)
    iobj = dist.argmin(-1)
    ns = np.take_along_axis(b["obj_sizes"], iobj[..., None], axis=-2)
    req = (np.abs(closing) * ns).sum(-1) + an.WIDTH_MARGIN
    align = np.clip(approach[..., 2], 0, 1)
    for bi in range(2):
        vi = np.where(valid[bi])[0][:12]
        print(f"batch {bi}: obj z-extents:",
              [(round(float(centers[bi, o, 2] - b['obj_sizes'][bi, o, 2]/2), 3),
                round(float(centers[bi, o, 2] + b['obj_sizes'][bi, o, 2]/2), 3))
               for o in range(3)])
        for g in vi:
            print(f"  g{g} keep={bool(keep[bi, g])} nms={bool(keep_nms[bi, g])} "
                  f"dmin={dmin[bi, g]:.4f} align={align[bi, g]:.2f} "
                  f"req={req[bi, g]:.3f} width={width[bi, g]:.3f} "
                  f"score={grasps[bi, g, 0]:.3f} depth={grasps[bi, g, 3]:.3f} "
                  f"z={gc[bi, g, 2]:.3f}")


if __name__ == "__main__":
    main()
