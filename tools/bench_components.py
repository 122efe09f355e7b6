"""Component-level timing of the inference forward on the real TPU.

Prints one JSON line per component (net ms, tunnel round-trip subtracted).
Scene-shaped clouds; production shapes (bs=4, 20k pts, 1024 seeds).
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

    from graspbalance_tpu import ops
    from graspbalance_tpu.data.synthetic import SceneConfig, make_batch
    from graspbalance_tpu.models.decode import pred_decode
    from graspbalance_tpu.models.drp import DRP
    from graspbalance_tpu.models.heads import MultiScaleWidthGrouping
    from graspbalance_tpu.train.config import Config
    from graspbalance_tpu.train.train_step import build_model

    rng = np.random.default_rng(0)
    bs = 4
    cfg = Config()
    cloud = jnp.asarray(make_batch(0, bs, SceneConfig(num_points=20000))["point_clouds"])

    def force(x):
        return float(jnp.sum(jnp.asarray(x, jnp.float32)))

    def timed(fn, iters=8):
        fn()
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        return float(np.median(times)) * 1e3

    # tunnel round-trip floor
    z = jnp.zeros((1,), jnp.float32)
    rt = timed(lambda: force(z), iters=10)
    out = {"roundtrip_ms": round(rt, 1)}

    # FPS
    f_fps = jax.jit(lambda c: ops.furthest_point_sample(c[..., :3], 2048))
    out["fps_20k_to_2048"] = round(timed(lambda: force(f_fps(cloud))) - rt, 1)

    # DRP backbone
    drp = DRP()
    dv = jax.jit(lambda r, c: drp.init(r, c, train=False))(jax.random.PRNGKey(0), cloud)
    f_bb = jax.jit(lambda v, c: drp.apply(v, c, train=False)["fp2_features"])
    out["backbone_bs4"] = round(timed(lambda: force(f_bb(dv, cloud))) - rt, 1)

    # seeds + rotations for stage-2 pieces
    sa = np.asarray(f_fps(cloud))
    seeds = jnp.take_along_axis(cloud, jnp.asarray(sa[:, :1024])[..., None], axis=1)
    a = rng.normal(size=(bs, 1024, 3, 3)).astype(np.float32)
    q, _ = np.linalg.qr(a)
    rot = jnp.asarray(q.astype(np.float32))

    RADII = tuple(s * 0.08 for s in (0.25, 0.5, 0.75, 1.0))
    HMAXS = (0.01, 0.02, 0.03, 0.04)

    f_q = jax.jit(lambda c, s, r: ops.multi_cylinder_query(
        c, s, r, RADII, -0.02, HMAXS, 64))
    out["multicyl_query"] = round(timed(lambda: force(f_q(cloud, seeds, rot))) - rt, 1)

    idx = f_q(cloud, seeds, rot)

    @jax.jit
    def f_gr(c, s, r, idx):
        b = c.shape[0]
        grouped = ops.group_points(c, idx.reshape(b, 16 * 1024, 64)).reshape(
            b, 4, 4, 1024, 64, 3)
        rel = grouped - s[:, None, None, :, None, :]
        return jnp.einsum("brhskj,bsji->brhski", rel, r)

    out["group_rotate"] = round(timed(lambda: force(f_gr(cloud, seeds, rot, idx))) - rt, 1)

    # width grouping end-to-end (query+group+rotate+4 scale MLPs+pool)
    wg = MultiScaleWidthGrouping()
    wv = jax.jit(lambda k, s, c, r: wg.init(k, s, c, r, train=False))(
        jax.random.PRNGKey(1), seeds, cloud, rot)
    f_wg = jax.jit(lambda v, s, c, r: wg.apply(v, s, c, r, train=False))
    out["width_grouping_total"] = round(
        timed(lambda: force(f_wg(wv, seeds, cloud, rot))) - rt, 1)

    # full model forward + decode (the headline content)
    model = build_model(cfg)
    mv = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), {"point_clouds": cloud[:1]})

    f_fwd = jax.jit(lambda v, c: model.apply(v, {"point_clouds": c}, train=False)[
        "grasp_score_pred"])
    out["full_forward"] = round(timed(lambda: force(f_fwd(mv, cloud))) - rt, 1)

    @jax.jit
    def f_dec(v, c):
        ep = model.apply(v, {"point_clouds": c}, train=False)
        g, val = pred_decode(ep)
        return jnp.sum(g) + jnp.sum(val)

    out["forward_plus_decode"] = round(timed(lambda: force(f_dec(mv, cloud))) - rt, 1)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
