"""Hardware parity check: collision_detect impl='pallas' vs 'xla' on TPU.

Asserts the (G,) collision masks, empty masks and iou tuples are identical
(counts are integer-valued f32, so equality is exact) at pipeline shapes.
Prints one JSON line {"parity": true, ...}.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from graspbalance_tpu.data.synthetic import SceneConfig, make_batch
    from graspbalance_tpu.eval.collision import (
        collision_detect,
        voxel_downsample_fixed,
    )
    from tools.bench_collision import _random_grasps

    b, g = 4, 1024
    cloud = jnp.asarray(
        make_batch(0, b, SceneConfig(num_points=20000))["point_clouds"][..., :3]
    )
    rng = np.random.default_rng(0)
    # center grasps on scene points so the boxes actually contain geometry
    grasps_np = np.stack([_random_grasps(rng, g) for _ in range(b)])
    pts = np.asarray(cloud)
    for i in range(b):
        sel = rng.integers(0, pts.shape[1], g)
        grasps_np[i, :, 13:16] = pts[i, sel]
    grasps = jnp.asarray(grasps_np)

    s_ds, s_valid = jax.vmap(voxel_downsample_fixed)(cloud)

    def run(impl):
        def one(s, v, gr):
            return collision_detect(
                s, gr, scene_valid=v, return_empty_grasp=True,
                return_ious=True, impl=impl,
            )

        return jax.jit(jax.vmap(one), static_argnames=())(s_ds, s_valid, grasps)

    cx, ex, ious_x = run("xla")
    cp, ep, ious_p = run("pallas")
    coll_eq = bool(jnp.all(cx == cp))
    empty_eq = bool(jnp.all(ex == ep))
    iou_eq = all(
        bool(jnp.all(jnp.abs(a - c) <= 1e-6 * jnp.maximum(jnp.abs(a), 1.0)))
        for a, c in zip(ious_x, ious_p)
    )
    n_coll = int(jnp.sum(cx))
    print(
        json.dumps(
            {
                "parity": coll_eq and empty_eq and iou_eq,
                "collision_mask_equal": coll_eq,
                "empty_mask_equal": empty_eq,
                "ious_equal": iou_eq,
                "collisions_flagged": n_coll,
                "total": int(b * g),
            }
        )
    )
    if not (coll_eq and empty_eq and iou_eq):
        raise SystemExit(1)


if __name__ == "__main__":
    main()
