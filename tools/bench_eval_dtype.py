"""TPU A/B: EVAL forward+decode bs=4 with model dtype f32 vs bf16.

Round-2 measured whole-model bf16 SLOWER in eval (conversions + f32 BN
dominated); the round-3 lifted local aggregation removed the relayout
copies that path paid, so re-measure.

Usage: python tools/bench_eval_dtype.py [batch]
"""

import os
import sys
import time

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

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cloud = jnp.asarray(
        make_batch(0, bs, SceneConfig(num_points=20000))["point_clouds"]
    )

    for dtype in ("float32", "bfloat16"):
        cfg = Config()
        cfg.model.dtype = dtype
        model = build_model(cfg)
        v = jax.jit(lambda r, b: model.init(r, b, train=False))(
            jax.random.PRNGKey(0), {"point_clouds": cloud[:1]}
        )

        @jax.jit
        def fwd(v, c):
            ep = model.apply(v, {"point_clouds": c}, train=False)
            grasps, valid = pred_decode(ep)
            return jnp.sum(grasps) + jnp.sum(valid)

        float(fwd(v, cloud))  # compile + force
        reps = 20
        t0 = time.perf_counter()
        acc = None
        for _ in range(reps):
            acc = fwd(v, cloud)
        float(acc)
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(
            f"eval forward+decode bs={bs} dtype={dtype}: {dt:7.2f} ms/iter "
            f"({bs / dt * 1e3:6.2f} clouds/s, pipelined)"
        )


if __name__ == "__main__":
    main()
