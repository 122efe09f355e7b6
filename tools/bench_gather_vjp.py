"""TPU benchmark: train-step backward with the default XLA scatter-add VJP
vs the alternative VJPs for the feature gathers (ops/gather.set_gather_vjp:
'sorted' argsort+sorted-scatter, 'onehot' transposed one-hot matmul).

Times value_and_grad of the full train loss at bs=2 (the production train
config) under the modes given on argv (default: xla sorted onehot) and
checks the grads agree (allclose — duplicate-index summation order differs
between the deterministic schedules).

Usage: python tools/bench_gather_vjp.py [bs] [mode ...]
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
    # GB_WIDTH_MLP_DTYPE=bfloat16 measures the documented non-parity train
    # speed knob (cfg.model.width_mlp_dtype) on the same workload
    wd = os.environ.get("GB_WIDTH_MLP_DTYPE")
    if wd:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, width_mlp_dtype=wd)
        )
    # GB_MODEL_DTYPE=bfloat16 measures whole-model bf16 compute in TRAIN
    # (cfg.model.dtype; params/BN stats stay f32). Eval bf16 measured slower
    # on v5e (round-2 NOTES) but the backward doubles the conv work, so the
    # train tradeoff is its own measurement.
    md = os.environ.get("GB_MODEL_DTYPE")
    if md:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, dtype=md)
        )
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

    modes = sys.argv[2:] or ["xla", "sorted", "onehot"]
    grads = {m: bench(m) for m in modes}
    base = grads.get("xla") or grads[modes[0]]
    flat_x = jax.tree_util.tree_leaves(base)
    for m, g in grads.items():
        if g is base:
            continue
        # scaled relative diff: near-zero elements (cancellation residue
        # after full backprop) are judged against the tensor's own scale,
        # not an absolute 1e-6 floor — reorder-only schedules differ there
        # by amounts that are meaningless relative to the weight updates.
        worst_rel, worst_abs = 0.0, 0.0
        for a, b in zip(flat_x, jax.tree_util.tree_leaves(g)):
            a = np.asarray(a, np.float64)
            b = np.asarray(b, np.float64)
            scale = max(float(np.max(np.abs(a))), 1e-6)
            denom = np.abs(a) + 1e-3 * scale
            worst_rel = max(worst_rel, float(np.max(np.abs(a - b) / denom)))
            worst_abs = max(worst_abs, float(np.max(np.abs(a - b)) / scale))
        print(
            f"grad difference [{m}]: max scaled-rel {worst_rel:.3e}, "
            f"max abs/tensor-scale {worst_abs:.3e}"
        )
        # the binding check is abs-diff vs the tensor's own scale: after a
        # full backprop, reorder-only schedules (and einsum-HIGHEST vs
        # scatter accumulation) differ on cancellation-residue elements by
        # amounts that are huge relative to the element but negligible
        # relative to the update (measured 3.5e-2 on v5e, 2026-08-17; exact
        # agreement at the op level is covered by test_ops.py with integer
        # cotangents).
        assert worst_abs < 0.05, f"grad mismatch beyond reorder tolerance ({m})"


if __name__ == "__main__":
    main()
