"""A/B the label-pipeline impl ('full' view-permuted materializations vs
'reduced' per-view reductions + top-view row gathers) on the full jitted
train step, real TPU. GB_BS sets batch size (default 2).

Prints one JSON line per variant (median wall ms per step, each step
forced — train steps are long enough that the tunnel RTT is minor).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from graspbalance_tpu.data.synthetic import SceneConfig, make_batch
    from graspbalance_tpu.train.config import Config
    from graspbalance_tpu.train import train_step as ts

    bs = int(os.environ.get("GB_BS", "2"))
    batch = None

    for impl in ("full", "reduced"):
        cfg = Config()
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, label_impl=impl)
        )
        model = ts.build_model(cfg)
        if batch is None:
            batch = {
                k: jnp.asarray(x) for k, x in make_batch(0, bs, SceneConfig()).items()
            }
        mv = jax.jit(lambda r, b: model.init(r, b, train=True))(
            jax.random.PRNGKey(0), {k: x[:1] for k, x in batch.items()}
        )
        tx = ts.make_optimizer(cfg, steps_per_epoch=100)
        params = jax.tree.map(jnp.copy, mv["params"])
        state = ts.TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=jax.tree.map(jnp.copy, mv.get("batch_stats", {})),
            opt_state=tx.init(params),
            tx=tx,
        )
        step = ts.make_train_step(model, cfg)

        def run():
            nonlocal state
            state, metrics = step(state, batch, jnp.int32(0))
            return float(metrics["loss/overall_loss"])

        loss0 = run()  # warmup/compile
        times = []
        for _ in range(8):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        print(
            json.dumps(
                {
                    "impl": impl,
                    "bs": bs,
                    "step_ms": round(float(np.median(times)) * 1e3, 1),
                    "loss0": round(loss0, 4),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
