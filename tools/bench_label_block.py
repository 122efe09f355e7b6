"""Bracket the label block alone (process_grasp_labels + match) for both
impls on the real TPU, plus the same block under jax.grad-style consumption
(sum of all outputs) to expose scheduling differences. GB_BS (default 2)."""

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
    from graspbalance_tpu.labels.losses import (
        generate_reweight_mask,
        reweight_from_target_width,
    )

    bs = int(os.environ.get("GB_BS", "2"))
    batch = {k: jnp.asarray(x) for k, x in make_batch(0, bs, SceneConfig()).items()}
    ns, v = 1024, 300
    rng = np.random.default_rng(0)
    seeds = jnp.asarray(rng.random((bs, ns, 3), np.float32) - 0.5)
    top = jnp.asarray(rng.integers(0, v, (bs, ns)).astype(np.int32))

    def force(x):
        return float(jnp.sum(jnp.asarray(x, jnp.float32)))

    def timed(fn, iters=6):
        fn()
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) * 1e3

    z = jnp.zeros((1,), jnp.float32)
    rt = timed(lambda: force(z), iters=10)
    print(json.dumps({"piece": "roundtrip", "ms": round(rt, 1)}), flush=True)

    for impl in ("full", "reduced"):

        @jax.jit
        def block(seeds, batch, top):
            gl = process_grasp_labels(seeds, batch, impl=impl)
            m = match_grasp_view_and_label(top, gl)
            if "batch_grasp_target_width" in m:
                w = reweight_from_target_width(m["batch_grasp_target_width"])
            else:
                w = generate_reweight_mask(
                    m["batch_grasp_label_all"], m["batch_grasp_width_all"]
                )
            acc = jnp.sum(w)
            for k in (
                "batch_grasp_view_rot",
                "batch_grasp_view",
                "batch_grasp_label",
                "batch_grasp_width",
                "batch_grasp_tolerance",
                "batch_grasp_point",
                "batch_grasp_view_label",
            ):
                acc = acc + jnp.sum(m[k])
            return acc

        ms = timed(lambda: force(block(seeds, batch, top)))
        print(
            json.dumps({"piece": f"labels_{impl}", "net_ms": round(ms - rt, 1)}),
            flush=True,
        )


if __name__ == "__main__":
    main()
