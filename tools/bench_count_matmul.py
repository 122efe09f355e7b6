"""Same-session A/B: _tile_count as VPU reduce vs MXU matvec (GB_COUNT_MATMUL).

The query hit/class planes' count-reduce consumers pin them C-minor while
the slot-tile extraction dots want TILE-minor — the residual ~3.5 ms of
transpose copies (docs/NOTES.md planes-form entry). The matvec form gives
every consumer the same TILE-minor preference. Full e2e forward+decode,
pipelined dispatch, both variants in one process (session drift is ~5%
between sessions; same-session A/B is the only trustworthy comparison).

Usage: python tools/bench_count_matmul.py
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
    from graspbalance_tpu.ops import query as qmod
    from graspbalance_tpu.train.config import Config
    from graspbalance_tpu.train.train_step import build_model

    cfg = Config()
    model = build_model(cfg)
    bs = 4
    cloud = jnp.asarray(
        make_batch(0, bs, SceneConfig(num_points=cfg.data.num_points))["point_clouds"]
    )
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), {"point_clouds": cloud[:1]}
    )

    def make_forward():
        @jax.jit
        def forward(variables, cloud):
            ep = model.apply(variables, {"point_clouds": cloud}, train=False)
            grasps, valid = pred_decode(ep)
            return jnp.sum(grasps) + jnp.sum(valid)

        return forward

    results = {}
    for mode in ("reduce", "matmul", "reduce2"):
        qmod.set_count_matmul(mode == "matmul")
        fwd = make_forward()
        float(fwd(variables, cloud))  # compile
        n = 20
        t0 = time.perf_counter()
        acc = None
        for _ in range(n):
            acc = fwd(variables, cloud)
        float(acc)
        dt = time.perf_counter() - t0
        results[mode] = bs * n / dt
        print(f"{mode}: {results[mode]:.2f} clouds/s", flush=True)
    print({k: round(v, 2) for k, v in results.items()})


if __name__ == "__main__":
    main()
