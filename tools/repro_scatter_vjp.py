"""Minimal reproduction harness for the round-4 pallas scatter-VJP
composition mismatch (VERDICT r4 #4).

Round-4 record (docs/NOTES.md "per-shape pallas_auto gather VJP"): with
set_gather_vjp('pallas') the f32 FULL-model grads deterministically
differed from the 'xla' backward by ~1.31x of tensor scale, even though
op-level parity (scatter_add_matmul vs .at[].add) is exact at every model
(dest, rows, C) shape, on hardware and in interpret mode, with integer
cotangents. This tool shrinks the composing graph until the mismatch
appears, then prints per-tensor diff attribution.

Stages (each a superset of the last):
  op        the raw VJP of group_points at one model shape
  chain     two chained SA-like stages (group -> matmul -> max-pool) + loss
  block     one real InvResMLP block from models/drp.py
  model     the full GraspBalance train-mode value_and_grad (bs configurable)

Run: python tools/repro_scatter_vjp.py --stage model --bs 2
CPU: JAX_PLATFORMS=cpu python tools/repro_scatter_vjp.py --stage chain

ROOT CAUSE (found with this tool, v5e 2026-08-20): the scatter kernel's
"f32" MXU dot ran at DEFAULT precision — a single bf16 pass — so float
cotangents lost mantissa at ~2^-9 relative (stage op: 1.9e-3 of scale on
hardware vs 5.7e-6 on true-CPU interpret). The round-4 integer-cotangent
parity tests were blind to it: small integers are exact in bf16. Fixed by
forcing Precision.HIGHEST for compute_dtype=f32
(ops/pallas/scatter_kernel.py). Beware: JAX_PLATFORMS=cpu env alone is
IGNORED under the axon sitecustomize — this tool now applies it to
jax.config explicitly; earlier "CPU" runs of it actually hit the TPU.
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def tree_diff_report(ga, gb, top=10):
    import jax
    import numpy as np

    rows = []
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(ga)[0],
        jax.tree_util.tree_flatten_with_path(gb)[0],
    ):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        scale = max(float(np.abs(a).max()), 1e-30)
        diff = float(np.abs(a - b).max())
        rows.append((diff / scale, diff, scale, jax.tree_util.keystr(path)))
    rows.sort(reverse=True)
    print(f"worst rel-of-scale diffs ({len(rows)} tensors):")
    for rel, diff, scale, name in rows[:top]:
        print(f"  {rel:10.3e}  absmax {diff:9.3e}  scale {scale:9.3e}  {name}")
    return rows[0][0]


def grads_with(kind, fn, *args):
    from graspbalance_tpu.ops import gather

    gather.set_gather_vjp(kind)
    try:
        import jax

        loss, grads = jax.jit(jax.value_and_grad(fn))(*args)
        # primal comparison matters: the train graph gathers labels at the
        # ARGMAX predicted view, so forward-fusion perturbations (any graph
        # change at TPU default matmul precision) can flip near-tie winners
        # and legitimately change gradients — print the loss to see whether
        # the two paths even share a primal
        print(f"  [{kind}] loss = {float(loss):.9g}")
        return grads
    finally:
        gather.set_gather_vjp("xla")


def stage_op(shape=(2, 2048, 256), rows=16384):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from graspbalance_tpu import ops

    b, n, c = shape
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.standard_normal((b, n, c), dtype=np.float32))
    idx = jnp.asarray(rng.integers(0, n, (b, rows // 64, 64)).astype(np.int32))

    def loss(p):
        g = ops.group_points(p, idx)
        return jnp.sum(jnp.sin(g) * jnp.cos(g * 0.5))

    return loss, (pts,)


def stage_chain(shape=(2, 2048, 256)):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from graspbalance_tpu import ops

    b, n, c = shape
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.standard_normal((b, n, c), dtype=np.float32))
    w1 = jnp.asarray(rng.standard_normal((c + 3, c), dtype=np.float32) * 0.05)
    w2 = jnp.asarray(rng.standard_normal((c, c), dtype=np.float32) * 0.05)
    xyz = jnp.asarray(rng.standard_normal((b, n, 3), dtype=np.float32))
    idx1 = jnp.asarray(rng.integers(0, n, (b, n // 2, 16)).astype(np.int32))
    idx2 = jnp.asarray(
        rng.integers(0, n // 2, (b, n // 4, 16)).astype(np.int32)
    )

    def loss(params):
        w1_, w2_ = params
        f = pts
        g = jnp.concatenate(
            [ops.group_points(xyz, idx1), ops.group_points(f, idx1)], -1
        )
        h = jnp.max(jax.nn.relu(g @ w1_), axis=2)  # (B, n/2, C)
        g2 = ops.group_points(h, idx2)
        h2 = jnp.max(jax.nn.relu(g2 @ w2_), axis=2)
        return jnp.sum(h2 * h2)

    return loss, ((w1, w2),)


def stage_block():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from graspbalance_tpu.models.drp import InvResMLP

    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.standard_normal((2, 1024, 3), dtype=np.float32))
    feats = jnp.asarray(rng.standard_normal((2, 1024, 256), dtype=np.float32))
    blk = InvResMLP(channels=256, radius=0.4, nsample=16)
    variables = blk.init(jax.random.PRNGKey(0), xyz, feats, train=True)

    def loss(params):
        out, _ = blk.apply(
            {"params": params,
             "batch_stats": variables.get("batch_stats", {})},
            xyz, feats, train=True, mutable=["batch_stats"],
        )
        return jnp.sum(out * out)

    return loss, (variables["params"],)


def stage_model(bs=2, num_points=20000):
    import jax
    import jax.numpy as jnp

    from graspbalance_tpu.data.synthetic import SceneConfig, make_batch
    from graspbalance_tpu.train.config import Config, DataConfig
    from graspbalance_tpu.train import train_step as ts
    from graspbalance_tpu.labels.losses import get_loss

    cfg = Config(data=DataConfig(analytic_labels=True))
    scene = SceneConfig(
        num_points=num_points, analytic_labels=True,
        emit_label_tensors=False, table_extent=0.15, object_scatter=0.12,
    )
    batch_np = make_batch(0, bs, scene)
    model, state = ts.create_train_state(cfg, 10, batch_np)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    # exactly make_train_step's loss_fn (train/train_step.py:193-202): the
    # model matches labels internally in train mode. batch is an ARGUMENT
    # and the analytic label expansion happens in-graph — expanding it
    # outside would bake ~1.4 GB of label constants into the HLO and the
    # remote compile endpoint rejects the upload (HTTP 413, learned here).
    def loss(params, b):
        b = ts._maybe_expand_analytic(b, cfg)
        ep, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            b, train=True, mutable=["batch_stats"],
        )
        ep["objectness_label"] = b["objectness_label"]
        total, _ = get_loss(ep)
        return total

    return loss, (state.params, batch)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", default="chain",
                   choices=["op", "chain", "block", "model"])
    p.add_argument("--bs", type=int, default=2)
    p.add_argument("--num_points", type=int, default=20000)
    p.add_argument("--kinds", default="xla,pallas")
    args = p.parse_args()

    import jax

    # the axon sitecustomize pins the TPU regardless of JAX_PLATFORMS env;
    # honor the env explicitly so CPU runs are actually CPU
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.stage == "op":
        loss, xs = stage_op()
    elif args.stage == "chain":
        loss, xs = stage_chain()
    elif args.stage == "block":
        loss, xs = stage_block()
    else:
        loss, xs = stage_model(args.bs, args.num_points)

    ka, kb = args.kinds.split(",")
    ga = grads_with(ka, loss, *xs)
    gb = grads_with(kb, loss, *xs)
    worst = tree_diff_report(ga, gb)
    print(f"stage={args.stage} kinds={args.kinds} worst_rel={worst:.3e}")


if __name__ == "__main__":
    main()
