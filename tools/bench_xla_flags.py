"""XLA compiler-knob sweep over the headline forward (VERDICT r4 #5).

The ~3.5 ms class/hit-plane transpose-copy floor is triple-confirmed
layout-assignment-bound (docs/NOTES.md round-3 count-matvec entry); the
round-4 roadmap said the fix "needs a compiler knob" but no knob was ever
tried. This tool makes that a measured result: it lowers the exact
bench.py headline forward ONCE, then recompiles it under a list of
candidate TPU compiler options (passed per-compile through PJRT
CompileOptions — the one channel guaranteed to reach the remote axon
compiler, unlike client-side XLA_FLAGS env) and times each variant
pipelined.

Unknown/rejected options are recorded as such — the sweep doubles as an
enumeration of which knobs this jax/libtpu version accepts. A deliberate
canary (scoped VMEM dropped to 4 MiB) validates that options take effect
at all: it must change the timing or fail to compile.

Run: python tools/bench_xla_flags.py [--iters 20]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CANDIDATES = [
    ("baseline", {}),
    # canary: absurdly small scoped VMEM must visibly change compilation
    ("canary_scoped_vmem_4m", {"xla_tpu_scoped_vmem_limit_kib": "4096"}),
    # more VMEM headroom for fusions (default ~16 MiB)
    ("scoped_vmem_24m", {"xla_tpu_scoped_vmem_limit_kib": "24576"}),
    ("scoped_vmem_32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("scoped_vmem_40m", {"xla_tpu_scoped_vmem_limit_kib": "40960"}),
    ("scoped_vmem_48m", {"xla_tpu_scoped_vmem_limit_kib": "49152"}),
    ("scoped_vmem_64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    # reduce+writeback fusion: the count-reduce consumers pin the class
    # plane C-minor — disabling rwb fusion may change that grouping
    ("no_rwb_fusion", {"xla_tpu_rwb_fusion": "false"}),
    ("no_multi_level_loop_fusion",
     {"xla_tpu_enable_multi_level_nested_loop_fusion": "false"}),
    ("exhaustive_output_fusion",
     {"xla_tpu_enable_experimental_exhaustive_output_fusion": "true"}),
    ("no_dot_strength_reduction",
     {"xla_tpu_enable_dot_strength_reduction": "false"}),
    ("dot_dot_fusion", {"xla_tpu_dot_dot_fusion": "true"}),
    ("no_dot_dot_fusion", {"xla_tpu_dot_dot_fusion": "false"}),
    ("nested_dot_fusion", {"xla_tpu_nested_dot_fusion": "true"}),
    ("no_async_fusion",
     {"xla_tpu_enable_async_collective_fusion": "false"}),
    ("aggressive_opt_barrier",
     {"xla_tpu_use_bundle_aware_cost_model_for_fusions": "true"}),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--only", default="", help="comma list of names to run")
    p.add_argument("--target", default="forward",
                   choices=["forward", "train"],
                   help="graph to sweep: headline eval forward or the "
                        "bs=2 f32 train step (value_and_grad + Adam)")
    args = p.parse_args()
    sys.stdout.reconfigure(line_buffering=True)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from graspbalance_tpu.data.synthetic import SceneConfig, make_batch
    from graspbalance_tpu.models.decode import pred_decode
    from graspbalance_tpu.train.config import Config, DataConfig
    from graspbalance_tpu.train.train_step import build_model

    if args.target == "train":
        from graspbalance_tpu.train import train_step as ts

        bs = 2
        cfg = Config(data=DataConfig(analytic_labels=True, batch_size=bs))
        scene = SceneConfig(
            num_points=cfg.data.num_points, analytic_labels=True,
            emit_label_tensors=False, table_extent=0.15,
            object_scatter=0.12,
        )
        batch_np = make_batch(0, bs, scene)
        model, state = ts.create_train_state(cfg, 100, batch_np)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

        raw_step = ts.make_train_step(model, cfg)
        lowered = raw_step.lower(state, batch, jnp.int32(0))

        def run_compiled(compiled):
            # the step donates the state: rebind so repeated calls stay valid
            nonlocal state
            state, metrics = compiled(state, batch, jnp.int32(0))
            return metrics["loss/overall_loss"]
    else:
        cfg = Config()
        model = build_model(cfg)
        bs = 4
        cloud = jnp.asarray(
            make_batch(0, bs, SceneConfig(num_points=cfg.data.num_points))[
                "point_clouds"
            ]
        )
        variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
            jax.random.PRNGKey(0), {"point_clouds": cloud[:1]}
        )

        def forward(variables, cloud):
            ep = model.apply(variables, {"point_clouds": cloud}, train=False)
            grasps, valid = pred_decode(ep)
            return jnp.sum(grasps) + jnp.sum(valid)

        lowered = jax.jit(forward).lower(variables, cloud)

        def run_compiled(compiled):
            return compiled(variables, cloud)

    only = {x for x in args.only.split(",") if x}

    results = []
    for name, opts in CANDIDATES:
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            compiled = lowered.compile(compiler_options=opts or None)
        except Exception as e:  # noqa: BLE001 — record and continue
            row = {"name": name, "opts": opts, "status": "compile_error",
                   "error": str(e)[:300]}
            results.append(row)
            print(json.dumps(row))
            continue
        compile_s = time.time() - t0
        try:
            float(jnp.sum(run_compiled(compiled)))  # warmup / execute check
            t0 = time.perf_counter()
            acc = None
            for _ in range(args.iters):
                acc = run_compiled(compiled)
            float(jnp.sum(acc))
            dt = (time.perf_counter() - t0) / args.iters
        except Exception as e:  # noqa: BLE001
            row = {"name": name, "opts": opts, "status": "run_error",
                   "error": str(e)[:300]}
            results.append(row)
            print(json.dumps(row))
            continue
        row = {
            "name": name,
            "opts": opts,
            "status": "ok",
            "ms": round(dt * 1e3, 2),
            "clouds_per_sec": round(bs / dt, 2),
            "compile_s": round(compile_s, 1),
        }
        results.append(row)
        print(json.dumps(row))

    ok = [r for r in results if r["status"] == "ok"]
    if ok:
        base = next((r for r in ok if r["name"] == "baseline"), None)
        best = min(ok, key=lambda r: r["ms"])
        print(json.dumps({
            "summary": "best",
            "name": best["name"],
            "ms": best["ms"],
            "baseline_ms": base["ms"] if base else None,
        }))


if __name__ == "__main__":
    main()
