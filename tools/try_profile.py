"""Check whether jax.profiler produces a device trace through the axon
remote-TPU tunnel (writes to /tmp/gb_trace)."""

import glob
import os
import sys

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

    rng = np.random.default_rng(0)
    cloud = jnp.asarray((rng.random((4, 20000, 3)) - 0.5).astype(np.float32))
    seeds = cloud[:, :1024]
    a = rng.normal(size=(4, 1024, 3, 3)).astype(np.float32)
    q, _ = np.linalg.qr(a)
    rot = jnp.asarray(q.astype(np.float32))
    RADII = tuple(s * 0.08 for s in (0.25, 0.5, 0.75, 1.0))

    f = jax.jit(lambda c, s, r: ops.multi_cylinder_query(
        c, s, r, RADII, -0.02, (0.01, 0.02, 0.03, 0.04), 64))
    float(jnp.sum(f(cloud, seeds, rot)))  # warm

    out = "/tmp/gb_trace"
    with jax.profiler.trace(out):
        for _ in range(3):
            float(jnp.sum(f(cloud, seeds, rot)))
    files = glob.glob(out + "/**/*", recursive=True)
    print("trace files:", len(files))
    for p in sorted(files)[:20]:
        print(" ", p.replace(out, ""), os.path.getsize(p) if os.path.isfile(p) else "dir")


if __name__ == "__main__":
    main()
