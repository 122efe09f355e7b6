"""TPU benchmark: train-step backward with the default XLA scatter-add VJP
vs the sort-based VJP for the feature gathers (ops/gather.set_gather_vjp).

Times value_and_grad of the full train loss at bs=2 (the production train
config) under both modes and checks the grads agree (allclose — duplicate-
index summation order differs between the two deterministic schedules).
"""

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
    from graspbalance_tpu.labels.losses import get_loss
    from graspbalance_tpu.ops import gather as gmod
    from graspbalance_tpu.train.config import Config
    from graspbalance_tpu.train import train_step as ts

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    cfg = Config()
    model = ts.build_model(cfg)
    batch = {
        k: jnp.asarray(x) for k, x in make_batch(0, bs, SceneConfig()).items()
    }
    mv = jax.jit(lambda r, b: model.init(r, b, train=True))(
        jax.random.PRNGKey(0), {k: x[:1] for k, x in batch.items()}
    )

    def loss_fn(params, bstats, b):
        ep, _ = model.apply(
            {"params": params, "batch_stats": bstats},
            b,
            train=True,
            mutable=["batch_stats"],
        )
        ep["objectness_label"] = b["objectness_label"]
        loss, _ = get_loss(ep)
        return loss

    def bench(kind):
        gmod.set_gather_vjp(kind)
        try:
            f = jax.jit(
                lambda p, s, b: jax.value_and_grad(loss_fn)(p, s, b)
            )
            loss, g = f(mv["params"], mv.get("batch_stats", {}), batch)
            float(loss)  # force (compile + run once)
            reps = 6
            t0 = time.perf_counter()
            acc = None
            for _ in range(reps):
                acc, _ = f(mv["params"], mv.get("batch_stats", {}), batch)
            float(acc)
            dt = (time.perf_counter() - t0) / reps * 1e3
            print(f"value_and_grad [{kind:6s}]: {dt:7.1f} ms/iter (bs={bs})")
            return g
        finally:
            gmod.set_gather_vjp("xla")

    g_x = bench("xla")
    g_s = bench("sorted")
    flat_x = jax.tree_util.tree_leaves(g_x)
    flat_s = jax.tree_util.tree_leaves(g_s)
    worst = 0.0
    for a, b in zip(flat_x, flat_s):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        denom = np.maximum(np.abs(a), 1e-6)
        worst = max(worst, float(np.max(np.abs(a - b) / denom)))
    print(f"max relative grad difference: {worst:.3e}")
    assert worst < 1e-3, "grad mismatch beyond reorder tolerance"


if __name__ == "__main__":
    main()
