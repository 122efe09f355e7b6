"""Headline benchmark: GraspBalance inference clouds/sec/chip at 20k points.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "p50_ms"}.

Workload: scene-shaped clouds from data/synthetic (tabletop plane + object
blobs in the training distribution) — neighbor-hit density drives every
query kernel, so uniform random cubes would mis-state the real cost.

Baseline: the reference repo publishes no numbers (BASELINE.md). The
north-star target is >=5x a V100 PyTorch reference on the same workload.
BASELINE_CLOUDS_PER_SEC below is our estimate of that V100 reference, now
anchored by measurement (BASELINE.md "Measured cross-calibration"): the
reference's own torch model runs on this host via tools/ref_torch_shim.py
at 0.0328 clouds/s (20k pts); compute-bound scaling to V100 gives ~4, plus
a generous ~3x for its CUDA extensions over the torch fallback -> 12. Every
measured anchor places the reference at or below 12, so vs_baseline
(= measured / 12) is an underestimate of the true speedup; >= 5 meets the
target.
"""

import json
import time

import numpy as np

# estimated V100 torch reference, measurement-bounded (see docstring +
# BASELINE.md); deliberately generous to the reference
BASELINE_CLOUDS_PER_SEC = 12.0


def main():
    import os

    import jax
    import jax.numpy as jnp

    # persistent compile cache: repeated driver runs skip the ~2 min compile
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from graspbalance_tpu.data.synthetic import SceneConfig, make_batch
    from graspbalance_tpu.train.config import Config
    from graspbalance_tpu.train.train_step import build_model
    from graspbalance_tpu.models.decode import pred_decode

    cfg = Config()
    model = build_model(cfg)
    batch_size = 4
    scene_cfg = SceneConfig(num_points=cfg.data.num_points)
    cloud = jnp.asarray(make_batch(0, batch_size, scene_cfg)["point_clouds"])
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), {"point_clouds": cloud[:1]}
    )

    # scoped-VMEM fusion budget: measured +5% on this exact graph
    # (tools/bench_xla_flags.py sweep; utils/compile_opts.py)
    import functools

    from graspbalance_tpu.utils.compile_opts import tpu_compiler_options

    @functools.partial(
        jax.jit, compiler_options=tpu_compiler_options("eval")
    )
    def forward(variables, cloud):
        ep = model.apply(variables, {"point_clouds": cloud}, train=False)
        grasps, valid = pred_decode(ep)
        # scalar checksum: float() on it forces full device execution (plain
        # block_until_ready is unreliable through the remote-TPU tunnel)
        return jnp.sum(grasps) + jnp.sum(valid)

    float(forward(variables, cloud))  # warmup / compile

    # throughput: pipelined dispatch (force once at the end) so the ~27 ms
    # axon-tunnel round trip is amortized as it would be on a local TPU
    # host under steady load; latency (p50) is still measured blocking.
    n_iters = 20
    t0 = time.perf_counter()
    acc = None
    for _ in range(n_iters):
        acc = forward(variables, cloud)
    float(acc)
    total = time.perf_counter() - t0

    times = []
    for _ in range(8):
        t1 = time.perf_counter()
        float(forward(variables, cloud))
        times.append(time.perf_counter() - t1)

    clouds_per_sec = batch_size * n_iters / total
    p50_scene_ms = float(np.median(times)) / batch_size * 1e3

    # MFU/roofline accounting (VERDICT r3 #4): structural FLOP/byte counts
    # from XLA's compiled cost analysis against the pipelined per-iter time
    from benchmarks.roofline import roofline_fields, xla_cost

    row = {
        "metric": "inference_clouds_per_sec_per_chip_20k",
        "value": round(clouds_per_sec, 3),
        "unit": "clouds/s",
        "vs_baseline": round(clouds_per_sec / BASELINE_CLOUDS_PER_SEC, 3),
        "p50_ms": round(p50_scene_ms, 2),
        # throughput methodology: dispatch is pipelined (forced once
        # at the end) since round 2 — round-1 numbers were blocking
        # per-iteration and are not directly comparable
        "method": "pipelined",
    }
    row.update(roofline_fields(xla_cost(forward, variables, cloud), total / n_iters))
    print(json.dumps(row))


if __name__ == "__main__":
    main()
