"""Bracket timing of the training step's pieces on the real TPU (bs=2).

Prints one JSON line per piece (net ms, tunnel RTT subtracted).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from graspbalance_tpu.data.synthetic import SceneConfig, make_batch
    from graspbalance_tpu.labels.label_gen import (
        match_grasp_view_and_label,
        process_grasp_labels,
    )
    from graspbalance_tpu.labels.losses import get_loss
    from graspbalance_tpu.train.config import Config
    from graspbalance_tpu.train import train_step as ts

    bs = 2
    cfg = Config()
    model = ts.build_model(cfg)
    batch = {k: jnp.asarray(x) for k, x in make_batch(0, bs, SceneConfig()).items()}
    mv = jax.jit(lambda r, b: model.init(r, b, train=True))(
        jax.random.PRNGKey(0), {k: x[:1] for k, x in batch.items()})

    def force(x):
        return float(jnp.sum(jnp.asarray(x, jnp.float32)))

    def timed(fn, iters=6):
        fn()
        ts_ = []
        for _ in range(iters):
            t0 = time.perf_counter()
            fn()
            ts_.append(time.perf_counter() - t0)
        return float(np.median(ts_)) * 1e3

    z = jnp.zeros((1,), jnp.float32)
    rt = timed(lambda: force(z), iters=10)
    print(json.dumps({"piece": "roundtrip", "ms": round(rt, 1)}), flush=True)

    def report(name, ms):
        print(json.dumps({"piece": name, "net_ms": round(ms - rt, 1)}), flush=True)

    # seeds from a forward (fixed)
    fwd_eval = jax.jit(lambda v, b: model.apply(v, b, train=False)["fp2_xyz"])
    seed_xyz = fwd_eval(mv, {"point_clouds": batch["point_clouds"]})

    # 1. label pipeline alone
    f_lab = jax.jit(lambda s, b: process_grasp_labels(s, b)["batch_grasp_label"])
    report("process_grasp_labels", timed(lambda: force(f_lab(seed_xyz, batch))))

    # 2. labels + view match
    @jax.jit
    def f_match(s, b):
        gl = process_grasp_labels(s, b)
        tv = jnp.zeros(s.shape[:2], jnp.int32)
        m = match_grasp_view_and_label(tv, gl)
        return m["batch_grasp_label"]

    report("labels_plus_match", timed(lambda: force(f_match(seed_xyz, batch))))

    # 3. train-mode forward + loss (no grad)
    @jax.jit
    def f_fwd(v, b):
        ep, _ = model.apply(v, b, train=True, mutable=["batch_stats"])
        ep["objectness_label"] = b["objectness_label"]
        loss, _ = get_loss(ep)
        return loss

    report("forward_loss_train", timed(lambda: force(f_fwd(mv, batch))))

    # 4. full step (non-donated copy)
    tx = ts.make_optimizer(cfg, steps_per_epoch=100)
    state = ts.TrainState(
        step=jnp.zeros((), jnp.int32), params=mv["params"],
        batch_stats=mv.get("batch_stats", {}),
        opt_state=tx.init(mv["params"]), tx=tx)

    def loss_fn(params, bstats, b):
        ep, mut = model.apply(
            {"params": params, "batch_stats": bstats}, b, train=True,
            mutable=["batch_stats"])
        ep["objectness_label"] = b["objectness_label"]
        loss, _ = get_loss(ep)
        return loss

    f_grad = jax.jit(lambda p, s, b: jax.grad(loss_fn)(p, s, b))
    g = None

    def run_grad():
        nonlocal g
        g = f_grad(mv["params"], mv.get("batch_stats", {}), batch)
        return force(jax.tree_util.tree_leaves(g)[0])

    report("value_and_grad", timed(run_grad))

    f_opt = jax.jit(lambda g, o, p: tx.update(g, o, p))

    def run_opt():
        u, _ = f_opt(g, state.opt_state, state.params)
        return force(jax.tree_util.tree_leaves(u)[0])

    report("optimizer_update", timed(run_opt))


if __name__ == "__main__":
    main()
