"""TPU experiment: kill the width-grouping layout copies (heads.py:134-140).

The profiled bs=4 forward spends ~6 ms (bs=8: ~12 ms) in layout copies
feeding the gripper-frame rotation einsum: XLA lowers
einsum("brhskj,bsji->brhski") as a convolution that demands layout
{4,5,2,1,3,0:T(4,128)} on the (B,R,H,S,K,3) grouped tensor, inserting a
strided minor-dim-3 copy (HLO copy.3929/copy.4565, profile 2026-08-17).

Variants measured here (all produce the SharedMLP input (B,R,H,S,K,3)):
  A current: width-3 row gather + subtract + rotation einsum
  B planes:  three scalar-plane gathers (x/y/z separate), per-axis FMA
             rotation (no einsum, no minor-3 intermediate), stack at end
  C planes_nostack: B without the final stack — returns the three rotated
             planes; models feeding the first MLP conv from planes (its
             3->64 weight contraction is also three broadcast FMAs)

Usage: python tools/bench_group_rotate.py [batch]
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

    from graspbalance_tpu import ops
    from graspbalance_tpu.data.synthetic import SceneConfig, make_batch

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n, s, k = 20000, 1024, 64
    rng = np.random.default_rng(0)
    cloud = jnp.asarray(
        make_batch(0, bs, SceneConfig(num_points=n))["point_clouds"]
    )
    seeds = cloud[:, :s]
    q, _ = np.linalg.qr(rng.normal(size=(bs, s, 3, 3)))
    rot = jnp.asarray(q.astype(np.float32))
    RADII = tuple(x * 0.08 for x in (0.25, 0.5, 0.75, 1.0))
    HMAXS = (0.01, 0.02, 0.03, 0.04)
    idx = jax.jit(
        lambda c, ctr, r: ops.multi_cylinder_query(
            c, ctr, r, RADII, -0.02, HMAXS, k
        )
    )(cloud, seeds, rot)
    b, n_r, n_h, ns, kk = idx.shape
    idx_flat = idx.reshape(b, n_r * n_h * ns, kk)

    @jax.jit
    def variant_a(c, ctr, r, ix):
        grouped = ops.group_points(c, ix).reshape(b, n_r, n_h, ns, kk, 3)
        rel = grouped - ctr[:, None, None, :, None, :]
        return jnp.einsum("brhskj,bsji->brhski", rel, r)

    def _planes(c, ctr, r, ix):
        # three scalar-plane gathers: flat (B*N,) views, global row indices
        offs = (jnp.arange(b, dtype=jnp.int32) * c.shape[1]).reshape(b, 1, 1)
        g = (ix.astype(jnp.int32) + offs).reshape(-1)
        planes = []
        for axis in range(3):
            flat = c[:, :, axis].reshape(-1)
            planes.append(
                flat.at[g].get(mode="promise_in_bounds").reshape(
                    b, n_r, n_h, ns, kk
                )
            )
        gx, gy, gz = planes
        dx = gx - ctr[:, None, None, :, None, 0]
        dy = gy - ctr[:, None, None, :, None, 1]
        dz = gz - ctr[:, None, None, :, None, 2]
        rbc = r[:, None, None, :, None]  # (B,1,1,S,1,3,3)
        out = []
        for i in range(3):
            out.append(
                dx * rbc[..., 0, i] + dy * rbc[..., 1, i] + dz * rbc[..., 2, i]
            )
        return out

    @jax.jit
    def variant_b(c, ctr, r, ix):
        return jnp.stack(_planes(c, ctr, r, ix), axis=-1)

    @jax.jit
    def variant_c(c, ctr, r, ix):
        xr, yr, zr = _planes(c, ctr, r, ix)
        # consume planes separately (sum keeps all three live)
        return xr, yr, zr

    @jax.jit
    def variant_d(c, ctr, r, ix):
        """Row gather kept; rotation as elementwise FMA on minor-dim
        slices (no einsum -> no conv emitter -> no layout copy)."""
        grouped = ops.group_points(c, ix).reshape(b, n_r, n_h, ns, kk, 3)
        d = grouped - ctr[:, None, None, :, None, :]
        rb = r[:, None, None, :, None]  # (B,1,1,S,1,3,3)
        dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
        return jnp.stack(
            [
                dx * rb[..., 0, i] + dy * rb[..., 1, i] + dz * rb[..., 2, i]
                for i in range(3)
            ],
            axis=-1,
        )

    @jax.jit
    def variant_e(c, ctr, r, ix):
        """Floor: gather + subtract only (no rotation)."""
        grouped = ops.group_points(c, ix).reshape(b, n_r, n_h, ns, kk, 3)
        return grouped - ctr[:, None, None, :, None, :]

    def run(name, f):
        out = f(cloud, seeds, rot, idx_flat)
        leaves = jax.tree_util.tree_leaves(out)
        float(sum(jnp.sum(x[..., :1]) for x in leaves))
        reps = 10
        t0 = time.perf_counter()
        acc = None
        for _ in range(reps):
            acc = f(cloud, seeds, rot, idx_flat)
        leaves = jax.tree_util.tree_leaves(acc)
        float(sum(jnp.sum(x[..., :1]) for x in leaves))
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name}: {dt:7.2f} ms/iter (pipelined, bs={bs})")
        return out

    ref = run("A current einsum   ", variant_a)
    if os.environ.get("GB_GR_ALL"):
        got = run("B planes+FMA+stack ", variant_b)
        run("C planes (no stack)", variant_c)
        diff = float(jnp.max(jnp.abs(ref - got)))
        print(f"max |A-B| (B einsum-precision): {diff:.3e}")
    got_d = run("D gather+slice FMA ", variant_d)
    run("E gather+sub only  ", variant_e)
    diff_d = float(jnp.max(jnp.abs(ref - got_d)))
    print(f"max |A-D| (einsum precision differs): {diff_d:.3e}")


if __name__ == "__main__":
    main()
