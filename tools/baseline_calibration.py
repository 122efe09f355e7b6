"""Measured torch-vs-jax cross-calibration of the baseline estimate.

The ≥5x target in BASELINE.json is against the reference's V100 PyTorch
throughput, which cannot be measured here (no CUDA). What CAN be measured on
this host: the reference's OWN torch model (TrainModel/graspbalance.py,
native ops replaced by the pure-torch shim tools/ref_torch_shim.py, its
neighbor-selection trick taken from the reference's own fallback
pointnet2_util.py:49-56) vs OUR jax model — same CPU, same cloud, same
workload shape, eval-mode full forward.

The ratio (jax clouds/s) / (torch clouds/s) on identical silicon is the
framework+algorithm speedup with the hardware factored out. Granting the
reference the SAME accelerator uplift our code measures going CPU->TPU
(generous: V100 fp32 peak is ~1/6 of a v5e's bf16 MXU), the projected
TPU-vs-V100 speedup equals this same-host CPU ratio:

    vs_baseline = T_tpu / (R_cpu * (T_tpu / J_cpu)) = J_cpu / R_cpu

Outputs one JSON line per (impl, N) plus a summary block; paste results into
BASELINE.md. Sizes sweep N (cloud points) at bs=1 with num_seed=1024 fixed
(the reference's stage-2 geometry, TrainModel/drp.py:186). Usage:

    python tools/baseline_calibration.py [--sizes 2000,5000,10000,20000]
                                         [--repeats 3] [--skip-torch|--skip-jax]
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


def _time_calls(fn, repeats):
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), ts


def run_torch(sizes, repeats):
    import torch

    import ref_harness
    from tools import ref_torch_shim

    ref_model = ref_harness.load_reference_model()
    ref_torch_shim.install()
    torch.manual_seed(0)
    net = ref_model.graspbalance.GraspBalance(
        input_feature_dim=0, num_view=300, num_angle=12, num_depth=4,
        cylinder_radius=0.08, hmin=-0.02, hmax_list=[0.01, 0.02, 0.03, 0.04],
        is_training=False,
    )
    net.eval()
    rows = {}
    for n in sizes:
        cloud = torch.rand(1, n, 3) - 0.5
        with torch.no_grad():
            net({"point_clouds": cloud.clone()})  # warmup (BN eval, no state)
            best, ts = _time_calls(
                lambda: net({"point_clouds": cloud.clone()}), repeats
            )
        rows[n] = best
        print(json.dumps({
            "impl": "reference-torch-cpu", "n_points": n, "bs": 1,
            "best_s": round(best, 3), "all_s": [round(t, 3) for t in ts],
            "clouds_per_s": round(1.0 / best, 4),
        }), flush=True)
    return rows


def run_jax(sizes, repeats):
    # this tool measures the CPU side only; force-override the axon TPU pin
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from graspbalance_tpu.train.config import Config, DataConfig, ModelConfig
    from graspbalance_tpu.train.train_step import build_model

    rows = {}
    for n in sizes:
        cfg = Config(model=ModelConfig(), data=DataConfig(num_points=n))
        model = build_model(cfg)
        rng = np.random.default_rng(0)
        cloud = jnp.asarray(rng.random((1, n, 3), dtype=np.float32) - 0.5)
        variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
            jax.random.PRNGKey(0), {"point_clouds": cloud}
        )

        @jax.jit
        def forward(variables, cloud):
            ep = model.apply(variables, {"point_clouds": cloud}, train=False)
            return (
                ep["grasp_score_pred"],
                ep["grasp_top_view_inds"],
                ep["objectness_score"],
            )

        def call():
            out = forward(variables, cloud)
            jax.block_until_ready(out)

        call()  # compile
        best, ts = _time_calls(call, repeats)
        rows[n] = best
        print(json.dumps({
            "impl": "graspbalance-tpu-jax-cpu", "n_points": n, "bs": 1,
            "best_s": round(best, 3), "all_s": [round(t, 3) for t in ts],
            "clouds_per_s": round(1.0 / best, 4),
        }), flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="2000,5000,10000,20000")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--skip-torch", action="store_true")
    ap.add_argument("--skip-jax", action="store_true")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    import multiprocessing

    host = {
        "cpus": multiprocessing.cpu_count(),
        "note": "same host, same cloud shape, eval-mode full forward, bs=1",
    }
    print(json.dumps({"host": host}), flush=True)

    tj = {} if args.skip_jax else run_jax(sizes, args.repeats)
    # torch second: it imports the reference stack and patches torch.cuda
    tt = {} if args.skip_torch else run_torch(sizes, args.repeats)

    for n in sizes:
        if n in tt and n in tj:
            print(json.dumps({
                "n_points": n,
                "ratio_jax_over_torch": round(tt[n] / tj[n], 3),
            }), flush=True)


if __name__ == "__main__":
    main()
