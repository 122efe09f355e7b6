"""TPU A/B: config-2 (DSN seg + OBS + forward) with the DSN in f32 vs bf16.

VERDICT r3 #5: the DSN+OBS delta over the plain forward never got the
dtype experiments the grasp path did. The DSN is a point-transformer
(attention matmuls) — different cost structure from the conv backbone
where eval bf16 measured slower (round-2 NOTES), so it gets its own
measurement. Usage: python tools/bench_config2_dtype.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from graspbalance_tpu.data.synthetic import SceneConfig, make_batch
    from graspbalance_tpu.models.dsn import DSN, cluster
    from graspbalance_tpu.train.config import Config
    from graspbalance_tpu.train import train_step as ts

    cfg = Config()
    model = ts.build_model(cfg)
    bs = 4
    cloud = jnp.asarray(
        make_batch(0, bs, SceneConfig(num_points=20000))["point_clouds"]
    )
    v = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), {"point_clouds": cloud[:1]}
    )
    key = jax.random.PRNGKey(2)

    def bench(dsn_dtype):
        dsn = DSN(dtype=dsn_dtype)
        dv = jax.jit(lambda r, c: dsn.init(r, c, train=False))(
            jax.random.PRNGKey(1), cloud[:1]
        )

        @jax.jit
        def f2(v, dv, c, key):
            from graspbalance_tpu import ops

            sa_inds = ops.furthest_point_sample(c[..., :3], 2048)
            seg = dsn.apply(dv, c, sa_inds=sa_inds, train=False)
            fg = jnp.argmax(seg["foreground_logits"], axis=-1) == 1
            labels, _, _ = cluster(c[..., :3], seg["center_offsets"], fg, key)
            ep = model.apply(
                v, {"point_clouds": c, "seed_cluster": labels,
                    "sa_inds": sa_inds}, train=False,
            )
            return jnp.sum(ep["grasp_score_pred"])

        float(f2(v, dv, cloud, key))  # compile
        reps = 8
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f2(v, dv, cloud, key)
        float(out)
        dt_p = (time.perf_counter() - t0) / reps * 1e3
        times = []
        for _ in range(5):
            t1 = time.perf_counter()
            float(f2(v, dv, cloud, key))
            times.append((time.perf_counter() - t1) * 1e3)
        import statistics

        print(f"config2 dsn={dsn_dtype.__name__ if hasattr(dsn_dtype,'__name__') else dsn_dtype}: "
              f"blocking {statistics.median(times):.1f} ms "
              f"({bs/statistics.median(times)*1e3:.1f} clouds/s) "
              f"pipelined {dt_p:.1f} ms ({bs/dt_p*1e3:.1f} clouds/s)",
              flush=True)

    import jax.numpy as jnp2

    bench(jnp2.float32)
    bench(jnp2.bfloat16)
    bench(jnp2.float32)  # session-drift control


if __name__ == "__main__":
    main()
