"""Generic fused per-neighborhood MLP + reduce-over-K Pallas kernel.

Every grouping module in the backbone ends the same way: a channels-last
dense chain (1x1 convs + BN + ReLU) applied over (B, N, K, C_in) grouped
neighbors, then a max/mean/sum over K. In XLA each layer's (B, N, K, C)
intermediate round-trips HBM and the reduction immediately collapses the
last one K:1 — for the DRP stage table that is ~2.5 GB of traffic per
forward across 4 SetAbstraction stages and 15 InvResMLP local
aggregations. Same disease, same cure as the width-grouping head
(ops/pallas/widthmlp_kernel.py): run the whole chain VMEM-resident per
(batch, point-tile) grid step and write only the reduced (nt, C_out)
result.

Extras over the width kernel:
* multi-part input: the concatenated channel blocks (dp | fj | ...) are
  never materialized — layer 0 is computed as sum_p part_p @ W0_p with W0
  split row-wise per part (exact same algebra as concat-then-matmul);
* per-part input scaling (SetAbstraction's normalize_xyz) folds into W0_p;
* reduction 'max' | 'mean' | 'sum' (LocalAggregation reduction arg).

BN is eval-mode only, pre-folded by the caller (fold_bn_layers). Training
keeps the XLA path. References being fused: pointnet2_utils
SharedMLP+max_pool2d (PointnetSAModuleVotes) and TrainModel/drp.py:32-67
LocalAggregation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_bn_layers(params, stats, n_layers, eps: float = 1e-5):
    """MLPBlock/SharedMLP eval-mode BN fold.

    params/stats: the module's param / batch_stats subtrees with children
    layer{i}/{dense,bn} (SharedMLP) or {dense,bn} directly (single
    MLPBlock, n_layers=1 and no 'layer0' key). Returns a tuple of
    (W_eff, b_eff) pairs: y = relu(x @ W_eff + b_eff) == relu(BN(x @ W)).
    """
    out = []
    for li in range(n_layers):
        p = params[f"layer{li}"] if f"layer{li}" in params else params
        s = stats[f"layer{li}"] if f"layer{li}" in stats else stats
        kern = p["dense"]["kernel"]
        bn, bs = p["bn"], s["bn"]
        a = bn["scale"] * jax.lax.rsqrt(bs["var"] + eps)
        out.append((kern * a[None, :], bn["bias"] - bs["mean"] * a))
    return tuple(out)


def fused_eval_ok(module, train: bool, nsample: int = 64) -> bool:
    """Gate for the fused eval path in flax grouping modules: TPU backend,
    eval mode, params already created, f32 (parity dtype). Tests set
    GB_FORCE_FUSED_EVAL=1 to exercise the path off-TPU (the kernel then
    runs in interpret mode automatically).

    MEASURED NEGATIVE in the DRP backbone (v5e, 2026-08-17): fusing every
    stage ran the headline at 59.4 clouds/s and stage-1 only (K>=64) at
    59.6, vs 60.65 for the XLA path — unlike the width-grouping head
    (where the same pattern won 2.7 clouds/s), the backbone's convs
    overlap with its serialized gathers under XLA's scheduler, and the
    pallas grid forfeits that overlap. Backbone fusion is therefore OFF
    unless GB_FUSED_BACKBONE=1 opts in (kept because other configs — DSN,
    MSG variants, future multi-core — may land differently).
    """
    import os

    force = bool(os.environ.get("GB_FORCE_FUSED_EVAL"))
    opt_in = bool(os.environ.get("GB_FUSED_BACKBONE"))
    return (
        not train
        and not module.is_initializing()
        and module.dtype == jnp.float32
        and (
            force
            or (
                opt_in
                and jax.default_backend() == "tpu"
                and nsample >= 64
            )
        )
    )


def _kernel(*refs, n_parts: int, n_layers: int, reduction: str, k: int,
            compute_dtype):
    part_refs = refs[:n_parts]
    wrefs = refs[n_parts:-1]
    out_ref = refs[-1]
    _, nt, _, _ = part_refs[0].shape

    x = None
    b0 = wrefs[n_parts][:]
    for pi in range(n_parts):
        _, _, _, ci = part_refs[pi].shape
        xp = part_refs[pi][0].reshape(nt * k, ci)
        term = jax.lax.dot(
            xp.astype(compute_dtype),
            wrefs[pi][:].astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        x = term if x is None else x + term
    x = jnp.maximum(x + b0, 0.0)
    for li in range(1, n_layers):
        w = wrefs[n_parts + li * 2 - 1][:]
        b = wrefs[n_parts + li * 2][:]
        x = jax.lax.dot(
            x.astype(compute_dtype),
            w.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        x = jnp.maximum(x + b, 0.0)
    c = x.shape[-1]
    g = x.reshape(nt, k, c)  # linearization-preserving leading-dim split
    if reduction == "max":
        r = jnp.max(g, axis=1)
    elif reduction == "sum":
        r = jnp.sum(g, axis=1)
    else:  # mean
        r = jnp.sum(g, axis=1) * (1.0 / k)
    out_ref[0] = r


@functools.partial(
    jax.jit,
    static_argnames=("reduction", "n_tile", "compute_dtype", "interpret"),
)
def mlp_max_fused(
    parts: tuple,
    weights: tuple,
    *,
    reduction: str = "max",
    n_tile: int = 128,
    compute_dtype=jnp.float32,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """parts: tuple of (B, N, K, C_i) channel blocks (concat semantics);
    weights: ((W0_parts, b0), (W1, b1), ...) where W0_parts is a tuple of
    per-part (C_i, C0) slices of the layer-0 weight (any per-part input
    scale pre-folded). Returns (B, N, C_last) reduced over K.
    """
    if interpret is None:  # off-TPU callers run interpreted
        interpret = jax.default_backend() != "tpu"
    b, n, k, _ = parts[0].shape
    n_layers = len(weights)
    nt = min(n_tile, n)
    while n % nt:
        nt -= 1

    w0_parts, b0 = weights[0]
    flat = [jnp.asarray(w, jnp.float32) for w in w0_parts]
    flat.append(jnp.asarray(b0, jnp.float32).reshape(1, -1))
    for w, bias in weights[1:]:
        flat.append(jnp.asarray(w, jnp.float32))
        flat.append(jnp.asarray(bias, jnp.float32).reshape(1, -1))

    kernel = functools.partial(
        _kernel,
        n_parts=len(parts),
        n_layers=n_layers,
        reduction=reduction,
        k=k,
        compute_dtype=compute_dtype,
    )
    out_c = flat[-2].shape[1] if n_layers > 1 else flat[0].shape[1]
    part_specs = [
        pl.BlockSpec(
            (1, nt, k, int(p.shape[-1])),
            lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        )
        for p in parts
    ]
    wspecs = [
        pl.BlockSpec(w.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM)
        for w in flat
    ]
    out = pl.pallas_call(
        kernel,
        grid=(b, n // nt),
        in_specs=part_specs + wspecs,
        out_specs=pl.BlockSpec(
            (1, nt, out_c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, out_c), jnp.float32),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(*[jnp.asarray(p, jnp.float32) for p in parts], *flat)
    return out


def _compiler_params():
    cp = getattr(pltpu, "CompilerParams", None) or getattr(
        pltpu, "TPUCompilerParams"
    )
    try:
        return cp(vmem_limit_bytes=100 * 1024 * 1024)
    except (TypeError, AttributeError):  # older signature
        return cp()
