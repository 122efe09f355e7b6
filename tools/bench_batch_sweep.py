"""Batch-size sweep of the headline workload (forward + decode, pipelined
dispatch like bench.py). One JSON line per batch size.

Usage: python tools/bench_batch_sweep.py [bs ...]   (default: 4 8 16)
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
    from graspbalance_tpu.models.decode import pred_decode
    from graspbalance_tpu.train.config import Config
    from graspbalance_tpu.train.train_step import build_model

    cfg = Config()
    model = build_model(cfg)
    scene_cfg = SceneConfig(num_points=cfg.data.num_points)
    sizes = [int(a) for a in sys.argv[1:]] or [4, 8, 16]

    variables = None
    for bs in sizes:
        cloud = jnp.asarray(make_batch(0, bs, scene_cfg)["point_clouds"])
        if variables is None:
            variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
                jax.random.PRNGKey(0), {"point_clouds": cloud[:1]}
            )

        @jax.jit
        def forward(variables, cloud):
            ep = model.apply(variables, {"point_clouds": cloud}, train=False)
            grasps, valid = pred_decode(ep)
            return jnp.sum(grasps) + jnp.sum(valid)

        float(forward(variables, cloud))  # compile
        n_iters = max(12, 48 // bs)
        t0 = time.perf_counter()
        acc = None
        for _ in range(n_iters):
            acc = forward(variables, cloud)
        float(acc)
        total = time.perf_counter() - t0
        times = []
        for _ in range(6):
            t1 = time.perf_counter()
            float(forward(variables, cloud))
            times.append(time.perf_counter() - t1)
        print(
            json.dumps(
                {
                    "bs": bs,
                    "clouds_per_sec": round(bs * n_iters / total, 2),
                    "p50_scene_ms": round(
                        float(np.median(times)) / bs * 1e3, 2
                    ),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
