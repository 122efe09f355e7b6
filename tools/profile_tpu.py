"""Op-level TPU profiling through the axon tunnel.

Usage: python tools/profile_tpu.py <target>
Targets: query | backbone | gather | widthmlp | forward | train

Captures a jax.profiler trace of 3 iterations and prints the per-op-class
time table (ms/iter) from the chrome trace.
"""

import collections
import glob
import gzip
import json
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRACE_DIR = "/tmp/gb_trace"


def summarize(n_iters):
    paths = sorted(glob.glob(TRACE_DIR + "/plugins/profile/*/vm.trace.json.gz"))
    d = json.load(gzip.open(paths[-1]))
    meta = {e["pid"]: e["args"]["name"] for e in d["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev_pids = {p for p, n in meta.items() if "TPU" in n}
    by, cnt = collections.Counter(), collections.Counter()
    for e in d["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        n = e["name"]
        if n.startswith("jit_"):
            continue
        cls = n.split(".")[0]
        by[cls] += e["dur"]
        cnt[cls] += 1
    tot = sum(by.values())
    print(f"device op total: {tot / n_iters / 1e3:.1f} ms/iter")
    for n, us in by.most_common(20):
        if us / n_iters < 20:
            break
        print(f"{us / n_iters / 1e3:8.2f} ms/iter  x{cnt[n] // n_iters:5d}  {n}")
    # top individual ops (full names) for HLO attribution
    byname = collections.Counter()
    for e in d["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        if e["name"].startswith("jit_"):
            continue
        byname[e["name"]] += e["dur"]
    print("-- top individual ops --")
    for n, us in byname.most_common(15):
        print(f"{us / n_iters / 1e3:8.2f} ms/iter  {n}")


def main():
    target = sys.argv[1] if len(sys.argv) > 1 else "query"
    import jax
    import jax.numpy as jnp

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from graspbalance_tpu import ops
    from graspbalance_tpu.data.synthetic import SceneConfig, make_batch
    from graspbalance_tpu.models.drp import DRP
    from graspbalance_tpu.nn.layers import SharedMLP
    from graspbalance_tpu.train.config import Config
    from graspbalance_tpu.train.train_step import build_model

    rng = np.random.default_rng(0)
    bs = int(os.environ.get("GB_BS", "4"))  # batch-scaling diagnosis knob
    cloud = jnp.asarray(
        make_batch(0, bs, SceneConfig(num_points=20000))["point_clouds"]
    )
    seeds = cloud[:, :1024]
    a = rng.normal(size=(bs, 1024, 3, 3)).astype(np.float32)
    q, _ = np.linalg.qr(a)
    rot = jnp.asarray(q.astype(np.float32))
    RADII = tuple(s * 0.08 for s in (0.25, 0.5, 0.75, 1.0))
    HMAXS = (0.01, 0.02, 0.03, 0.04)

    if target == "query":
        f = jax.jit(lambda c, s, r: ops.multi_cylinder_query(
            c, s, r, RADII, -0.02, HMAXS, 64))
        args = (cloud, seeds, rot)
    elif target == "backbone":
        drp = DRP()
        v = jax.jit(lambda r, c: drp.init(r, c, train=False))(
            jax.random.PRNGKey(0), cloud)
        f = jax.jit(lambda v, c: drp.apply(v, c, train=False)["fp2_features"])
        args = (v, cloud)
    elif target == "gather":
        idx = jax.jit(lambda c, s, r: ops.multi_cylinder_query(
            c, s, r, RADII, -0.02, HMAXS, 64))(cloud, seeds, rot)

        @jax.jit
        def f(c, s, r, idx):
            b = c.shape[0]
            grouped = ops.group_points(c, idx.reshape(b, 16 * 1024, 64)).reshape(
                b, 4, 4, 1024, 64, 3)
            rel = grouped - s[:, None, None, :, None, :]
            return jnp.einsum("brhskj,bsji->brhski", rel, r)

        args = (cloud, seeds, rot, idx)
    elif target == "widthmlp":
        rel = jnp.asarray(rng.random((bs, 4, 4, 1024, 64, 3), dtype=np.float32))
        mlp = SharedMLP((64, 128, 256))
        v = jax.jit(lambda k, x: mlp.init(k, x, train=False))(
            jax.random.PRNGKey(0), rel[:, 0])

        @jax.jit
        def f(v, rel):
            outs = []
            for ri in range(4):
                o = mlp.apply(v, rel[:, ri], train=False)
                outs.append(jnp.max(o, axis=3))
            return jnp.concatenate(outs, axis=-1)

        args = (v, rel)
    elif target == "forward":
        cfg = Config()
        model = build_model(cfg)
        v = jax.jit(lambda r, b: model.init(r, b, train=False))(
            jax.random.PRNGKey(0), {"point_clouds": cloud[:1]})
        f = jax.jit(lambda v, c: model.apply(
            v, {"point_clouds": c}, train=False)["grasp_score_pred"])
        args = (v, cloud)
    elif target == "postproc":
        from graspbalance_tpu.eval.collision import (
            collision_detect,
            voxel_downsample_fixed,
        )
        from graspbalance_tpu.eval.nms import grasp_nms
        from graspbalance_tpu.models.decode import pred_decode

        cfg = Config()
        model = build_model(cfg)
        v = jax.jit(lambda r, b: model.init(r, b, train=False))(
            jax.random.PRNGKey(0), {"point_clouds": cloud[:1]})
        ep = jax.jit(lambda v, c: model.apply(v, {"point_clouds": c}, train=False))(
            v, cloud)
        grasps, valid = jax.jit(pred_decode)(ep)

        @jax.jit
        def f(grasps, valid, c):
            def post(g, val, s):
                keep = grasp_nms(g, val)
                s_ds, s_valid = voxel_downsample_fixed(s)
                coll = collision_detect(s_ds, g, scene_valid=s_valid)
                return keep & ~coll

            keep = jax.vmap(post)(grasps, valid, c)
            return jnp.sum(keep)

        args = (grasps, valid, cloud)
    elif target == "dsnpath":
        from graspbalance_tpu.models.dsn import DSN, cluster

        dsn = DSN()  # exact kNN default (argmin impl, as fast as approx)
        dv = jax.jit(lambda r, c: dsn.init(r, c, train=False))(
            jax.random.PRNGKey(1), cloud[:1])

        @jax.jit
        def f(dv, c, key):
            seg = dsn.apply(dv, c, train=False)
            fg = jnp.argmax(seg["foreground_logits"], axis=-1) == 1
            labels, _, _ = cluster(c[..., :3], seg["center_offsets"], fg, key)
            return jnp.sum(labels)

        args = (dv, cloud, jax.random.PRNGKey(2))
    elif target == "obs":
        # BASELINE config 2: DSN seg + cluster + forward with OBS re-seeding
        from graspbalance_tpu.models.dsn import DSN, cluster

        cfg = Config()
        model = build_model(cfg)
        v = jax.jit(lambda r, b: model.init(r, b, train=False))(
            jax.random.PRNGKey(0), {"point_clouds": cloud[:1]})
        dsn = DSN()  # exact kNN default (argmin impl, as fast as approx)
        dv = jax.jit(lambda r, c: dsn.init(r, c, train=False))(
            jax.random.PRNGKey(1), cloud[:1])

        @jax.jit
        def f(v, dv, c, key):
            sa_inds = ops.furthest_point_sample(c[..., :3], 2048)
            seg = dsn.apply(dv, c, sa_inds=sa_inds, train=False)
            fg = jnp.argmax(seg["foreground_logits"], axis=-1) == 1
            labels, _, _ = cluster(c[..., :3], seg["center_offsets"], fg, key)
            ep = model.apply(
                v, {"point_clouds": c, "seed_cluster": labels,
                    "sa_inds": sa_inds}, train=False)
            return jnp.sum(ep["grasp_score_pred"])

        args = (v, dv, cloud, jax.random.PRNGKey(2))
    elif target == "obsonly":
        # isolate the OBS re-seeding ops: full-cloud feature upsample +
        # per-object masked FPS + quota assembly (eval/obs.py)
        from graspbalance_tpu.eval.obs import object_balance_sampling
        from graspbalance_tpu.ops.interpolate import interpolate_features

        feats1024 = jnp.asarray(
            rng.normal(size=(bs, 1024, 256)).astype(np.float32))
        labels = jnp.asarray(
            rng.integers(0, 9, size=(bs, 20000)).astype(np.int32))

        @jax.jit
        def f(c, feats, labels):
            up = interpolate_features(c[..., :3], c[:, :1024, :3], feats)
            ox, of, oi = object_balance_sampling(
                c[..., :3], up, labels, num_seed=1024)
            return jnp.sum(of) + jnp.sum(oi)

        args = (cloud, feats1024, labels)
    elif target == "labels":
        from graspbalance_tpu.labels.label_gen import process_grasp_labels

        batch = {k: jnp.asarray(x) for k, x in
                 make_batch(0, 2, SceneConfig()).items()}
        seed_xyz = batch["point_clouds"][:, :1024, :3]
        f = jax.jit(lambda s, b: process_grasp_labels(s, b)["batch_grasp_label"])
        args = (seed_xyz, batch)
    elif target == "train":
        from graspbalance_tpu.train import train_step as ts

        cfg = Config()
        model = build_model(cfg)
        batch = {k: jnp.asarray(x) for k, x in
                 make_batch(0, 2, SceneConfig()).items()}
        mv = jax.jit(lambda r, b: model.init(r, b, train=True))(
            jax.random.PRNGKey(0), {k: x[:1] for k, x in batch.items()})
        tx = ts.make_optimizer(cfg, steps_per_epoch=100)
        state = ts.TrainState(
            step=jnp.zeros((), jnp.int32), params=mv["params"],
            batch_stats=mv.get("batch_stats", {}),
            opt_state=tx.init(mv["params"]), tx=tx)
        step_fn = ts.make_train_step(model, cfg)

        def f(state, batch):
            s2, metrics = step_fn(state, batch, jnp.int32(0))
            return metrics["loss/overall_loss"]

        args = (state, batch)
    else:
        raise SystemExit(f"unknown target {target}")

    def force(x):
        return float(jnp.sum(jnp.asarray(x, jnp.float32)))

    force(f(*args))  # compile
    if os.environ.get("GB_DUMP_HLO"):
        try:
            lowered = f.lower(*args) if hasattr(f, "lower") else jax.jit(f).lower(*args)
            txt = lowered.compile().as_text()
            out = f"/tmp/gb_hlo_{target}.txt"
            with open(out, "w") as fh:
                fh.write(txt)
            print("HLO dumped:", out, len(txt), "bytes")
        except Exception as e:  # noqa: BLE001
            print("HLO dump failed:", str(e)[:200])
        if os.environ.get("GB_HLO_ONLY"):
            return
    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    n = 3
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(n):
            force(f(*args))
    summarize(n)


if __name__ == "__main__":
    main()
