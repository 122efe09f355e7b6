"""Closed-loop quality gate for the DSN segmentation family.

Trains the DSN (point-transformer backbone + foreground/center-offset
heads) on synthetic scenes, then runs the full inference-side path
(forward -> foreground argmax -> mean-shift clustering, exactly what the
config-2 OBS pipeline consumes) on held-out scenes and scores it against
the generator's true instance labels (eval/seg_quality.py). Trained must
far outscore untrained — the same closed-loop evidence tools/
quality_gate.py provides for the grasp model, for the second model family.

Run on the TPU: python tools/dsn_quality_gate.py --steps 500
"""

import argparse
import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_dsn_gate(steps=500, bs=4, num_points=20000, lr=1e-3,
                 eval_batches=4, max_objects=12, num_objects=8,
                 pt_stages=None, log=print) -> dict:
    """Train a DSN on analytic synthetic scenes, then score the inference
    path (forward -> fg argmax -> mean-shift cluster) on held-out scenes
    vs the generator's true instance labels. Defaults = production scale
    (TPU); tests/test_quality.py TestDSNClosedLoop calls this with tiny
    shapes on CPU. pt_stages=None uses the DSN default (20k-point) stage
    table."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from graspbalance_tpu.data.synthetic import SceneConfig, make_batch
    from graspbalance_tpu.eval.seg_quality import seg_quality
    from graspbalance_tpu.labels.seg_losses import get_seg_loss
    from graspbalance_tpu.models.dsn import (
        DSN, cluster, compute_center_offset_labels,
    )
    from graspbalance_tpu.train.loop import prefetch

    # compact clutter, same rationale as the grasp gate (tools/quality_gate).
    # analytic_labels + emit_label_tensors=False => the host generates ONLY
    # geometry: the legacy scene path materializes 3 x (P,V,A,D) grasp-label
    # tensors (~2.8 GB/batch at bs=4) the DSN never reads and the first run
    # of this gate was datagen-bound at ~30 s/step because of it
    scene = SceneConfig(
        num_points=num_points, table_extent=0.15, object_scatter=0.12,
        num_objects=num_objects, max_objects=max_objects,
        analytic_labels=True, emit_label_tensors=False,
    )
    n_cls = max_objects + 1
    model = DSN() if pt_stages is None else DSN(pt_stages=pt_stages)
    b0 = make_batch(0, bs, scene)
    cloud0 = jnp.asarray(b0["point_clouds"][..., :3])
    variables = jax.jit(lambda r, c: model.init(r, c, train=True))(
        jax.random.PRNGKey(0), cloud0
    )
    tx = optax.adam(
        optax.cosine_onecycle_schedule(steps, lr, pct_start=0.3)
    )
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, cloud, instance):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                cloud, train=True, mutable=["batch_stats"],
            )
            ep = {
                **out,
                "foreground_label": (instance > 0).astype(jnp.int32),
                "instance_label": instance,
                "center_offset_label": compute_center_offset_labels(
                    cloud, instance, max_objects
                ),
            }
            loss, metrics = get_seg_loss(ep, n_cls)
            return loss, (metrics, mut["batch_stats"])

        (loss, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, new_opt, metrics

    @jax.jit
    def infer(params, batch_stats, cloud, key):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, cloud,
            train=False,
        )
        fg = jnp.argmax(out["foreground_logits"], axis=-1) == 1
        labels, _, _ = cluster(cloud, out["center_offsets"], fg, key)
        return out["foreground_logits"], labels

    # oracle ceiling: GROUND-TRUTH foreground + offsets through the SAME
    # mean-shift — what a perfect DSN could score given this clustering
    # stage and these scenes (compact clutter lets boxes interpenetrate,
    # so purity < 1 even for perfect predictions)
    @jax.jit
    def infer_oracle(cloud, inst, key):
        true_off = compute_center_offset_labels(cloud, inst, max_objects)
        labels, _, _ = cluster(cloud, true_off, inst > 0, key)
        return labels

    def evaluate(params, batch_stats, oracle=False, eval_scene=None,
                 seed0=2_000_000):
        eval_scene = eval_scene or scene
        agg = {"fg_iou": 0.0, "purity": 0.0, "cluster_count_err": 0.0}
        for i in range(eval_batches):
            eb = make_batch(seed0 + i, bs, eval_scene)
            cloud = jnp.asarray(eb["point_clouds"][..., :3])
            key = jax.random.PRNGKey(7 + i)
            if oracle:
                inst = jnp.asarray(eb["instance_label"].astype(np.int32))
                labels = infer_oracle(cloud, inst, key)
                fg_true = eb["instance_label"] > 0
                fgl = np.stack(
                    [~fg_true, fg_true], axis=-1
                ).astype(np.float32)
            else:
                fgl, labels = infer(params, batch_stats, cloud, key)
            m = seg_quality(
                np.asarray(fgl), np.asarray(labels), eb["instance_label"]
            )
            for k in agg:
                agg[k] += m[k] / eval_batches
        return {k: round(v, 4) for k, v in agg.items()}

    oracle = evaluate(None, None, oracle=True)
    log(f"oracle: {json.dumps(oracle)}")
    untrained = evaluate(params, batch_stats)
    log(f"untrained: {json.dumps(untrained)}")

    def batches():
        for i in range(steps):
            yield make_batch(1 + i, bs, scene)

    t0 = time.time()
    for i, b in enumerate(prefetch(batches(), depth=3)):
        cloud = jnp.asarray(b["point_clouds"][..., :3])
        inst = jnp.asarray(b["instance_label"].astype(np.int32))
        params, batch_stats, opt_state, metrics = step(
            params, batch_stats, opt_state, cloud, inst
        )
        if (i + 1) % 100 == 0:
            loss_now = float(metrics["loss/seg_loss"])
            log(f"step {i+1} loss {loss_now:.3f} ({time.time()-t0:.0f}s)")
    train_wall = time.time() - t0

    trained = evaluate(params, batch_stats)
    log(f"trained: {json.dumps(trained)}")

    # mild cross-distribution: same extents, different clutter count —
    # did the DSN learn objects, or these scenes? (VERDICT r4 #7 parity
    # with the grasp gate)
    xdist_scene = dataclasses.replace(
        scene, num_objects=max(num_objects - 3, 2)
    )
    trained_xdist = evaluate(
        params, batch_stats, eval_scene=xdist_scene, seed0=3_000_000
    )
    oracle_xdist = evaluate(
        None, None, oracle=True, eval_scene=xdist_scene, seed0=3_000_000
    )
    log(f"trained_xdist: {json.dumps(trained_xdist)}")
    log(f"oracle_xdist: {json.dumps(oracle_xdist)}")
    return {
        "config": "dsn_quality_gate_synthetic",
        "steps": steps,
        "bs": bs,
        "train_wall_s": round(train_wall, 1),
        "untrained": untrained,
        "trained": trained,
        "oracle": oracle,
        "trained_xdist": trained_xdist,
        "oracle_xdist": oracle_xdist,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--bs", type=int, default=4)
    p.add_argument("--num_points", type=int, default=20000)
    p.add_argument("--eval_batches", type=int, default=4)
    args = p.parse_args()
    sys.stdout.reconfigure(line_buffering=True)

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(json.dumps(run_dsn_gate(
        steps=args.steps, bs=args.bs, num_points=args.num_points,
        eval_batches=args.eval_batches,
    )))


if __name__ == "__main__":
    main()
