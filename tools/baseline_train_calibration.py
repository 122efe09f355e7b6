"""Measured torch-vs-jax cross-calibration of the TRAIN step (VERDICT r3 #3).

Companion to tools/baseline_calibration.py (which covers the eval forward):
times the reference's FULL training step — forward with is_training=True
(which runs its process_grasp_labels + match_grasp_view_and_label inside,
TrainModel/graspbalance.py:134) + get_loss + backward + Adam
(/root/reference/train.py:133-155) — against our jitted train step
(labels + loss + backward + Adam in one XLA program), same host CPU, same
scene content, same workload shape (bs, N, V=300, A=12, D=4, 8 objects x
300 label points).

The same-silicon ratio bounds the train-side vs_baseline exactly like the
forward table in BASELINE.md "Measured cross-calibration". Usage:

    python tools/baseline_train_calibration.py [--bs 2] [--n 20000]
        [--repeats 2] [--skip-torch|--skip-jax]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

N_OBJ = 8
PTS_PER_OBJ = 300


def scene_batches(bs: int, n: int):
    """Identical scene content for both impls: our synthetic generator with
    host-materialized legacy label tensors (the reference has no concept of
    analytic labels; content only needs to be the same bytes both sides)."""
    from graspbalance_tpu.data.synthetic import SceneConfig, make_batch

    cfg = SceneConfig(
        num_points=n,
        num_objects=N_OBJ,
        grasp_points_per_object=PTS_PER_OBJ,
        max_grasp_points=N_OBJ * PTS_PER_OBJ,
    )
    return make_batch(0, bs, cfg), cfg


def run_torch(bs, n, repeats):
    import numpy as np
    import torch

    import ref_harness
    from tools import ref_torch_shim

    ref_model = ref_harness.load_reference_model()
    ns = ref_harness.load_reference()
    ref_torch_shim.install()
    torch.manual_seed(0)
    net = ref_model.graspbalance.GraspBalance(
        input_feature_dim=0, num_view=300, num_angle=12, num_depth=4,
        cylinder_radius=0.08, hmin=-0.02, hmax_list=[0.01, 0.02, 0.03, 0.04],
        is_training=True,
    )
    net.train()
    opt = torch.optim.Adam(net.parameters(), lr=1e-3)

    batch, _ = scene_batches(bs, n)
    ep = {
        "point_clouds": torch.from_numpy(batch["point_clouds"]).clone(),
        "objectness_label": torch.from_numpy(
            batch["objectness_label"]
        ).long(),
        "object_poses_list": [],
        "grasp_points_list": [],
        "grasp_labels_list": [],
        "grasp_offsets_list": [],
        "grasp_tolerance_list": [],
    }
    for b in range(bs):
        poses, pts_l, lab_l, off_l, tol_l = [], [], [], [], []
        for o in range(N_OBJ):
            sl = slice(o * PTS_PER_OBJ, (o + 1) * PTS_PER_OBJ)
            poses.append(torch.from_numpy(batch["object_poses"][b, o]))
            pts_l.append(torch.from_numpy(batch["grasp_points"][b, sl]))
            lab_l.append(torch.from_numpy(batch["grasp_labels"][b, sl]))
            off = np.zeros(batch["grasp_widths"][b, sl].shape + (3,), np.float32)
            off[..., 2] = batch["grasp_widths"][b, sl]
            off_l.append(torch.from_numpy(off))
            tol_l.append(torch.from_numpy(batch["grasp_tolerance"][b, sl]))
        ep["object_poses_list"].append(poses)
        ep["grasp_points_list"].append(pts_l)
        ep["grasp_labels_list"].append(lab_l)
        ep["grasp_offsets_list"].append(off_l)
        ep["grasp_tolerance_list"].append(tol_l)

    def step():
        out = net(dict(ep))
        loss, _ = ns.loss.get_loss(out)
        loss.backward()
        opt.step()
        opt.zero_grad()
        return float(loss.detach())

    step()  # warmup
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        step()
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(json.dumps({
        "impl": "reference-torch-cpu-train", "n_points": n, "bs": bs,
        "best_s": round(best, 3), "all_s": [round(t, 3) for t in times],
        "clouds_per_s": round(bs / best, 4),
    }), flush=True)
    return best


def run_jax(bs, n, repeats):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from graspbalance_tpu.train.config import Config, DataConfig
    from graspbalance_tpu.train import train_step as ts

    batch, _ = scene_batches(bs, n)
    cfg = Config(data=DataConfig(
        num_points=n, batch_size=bs,
        max_grasp_points=N_OBJ * PTS_PER_OBJ,
    ))
    model, state = ts.create_train_state(cfg, 100, batch)
    step_fn = ts.make_train_step(model, cfg)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}

    def step():
        nonlocal state
        state, metrics = step_fn(state, jb, jnp.int32(0))
        return float(metrics["loss/overall_loss"])

    step()  # compile + warmup
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        step()
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(json.dumps({
        "impl": "graspbalance-tpu-jax-cpu-train", "n_points": n, "bs": bs,
        "best_s": round(best, 3), "all_s": [round(t, 3) for t in times],
        "clouds_per_s": round(bs / best, 4),
    }), flush=True)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=2)
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--skip-torch", action="store_true")
    ap.add_argument("--skip-jax", action="store_true")
    args = ap.parse_args()

    import multiprocessing

    print(json.dumps({"host": {
        "cpus": multiprocessing.cpu_count(),
        "note": "same host, same scene content, full train step "
        "(labels + loss + backward + Adam), torch single-thread default",
    }}), flush=True)

    tj = None if args.skip_jax else run_jax(args.bs, args.n, args.repeats)
    tt = None if args.skip_torch else run_torch(args.bs, args.n, args.repeats)
    if tj and tt:
        print(json.dumps({
            "n_points": args.n, "bs": args.bs,
            "train_ratio_jax_over_torch": round(tt / tj, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
