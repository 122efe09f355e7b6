"""Fused width-grouping scale MLPs + max-over-K, VMEM-resident.

The XLA eval path runs each scale's SharedMLP as separate 1x1-conv matmuls
whose intermediates round-trip HBM: at bench shapes (B=4, R=H=4, S=1024,
K=64, widths 64-128-256) that is ~1 GB out of conv1, ~2 GB in/out of
conv2, ~4 GB out of conv3 — and the following max over K immediately
discards 63/64 of the last write. ~13 ms of the 64 ms bs=4 forward is this
traffic (profile 2026-08-17).

This kernel runs the WHOLE chain per (batch, seed-tile) grid step: one
(1, R, H, st, K, 3) block of the rotated relative coordinates in, all
BN-folded dense+ReLU layers as MXU matmuls (rows = H*st*K), max over K in
VMEM, and only the (H, st, R*C3) result out — HBM traffic drops from
~8.6 GB to a 50 MB read + 67 MB write.

The minor dim 3 pads to 128 lanes in VMEM (block 786 KB compact ->
~16 MB resident at st=32) — affordable under a 100 MB vmem limit, and the
HBM side stays compact. A first attempt that kept layer 0 in XLA and fed
the kernel (B, R, H, S, K, C1) activations measured SLOWER than the XLA
path (48.6 vs 58.0 clouds/s headline): the per-scale h1 stack added a
1 GB concat and the extra HBM round-trip ate the win — hence full fusion.

BN is eval-mode only, pre-folded by the caller into effective weights:
W_eff = W * (gamma / sqrt(var + eps)), b_eff = beta - mean * (gamma /
sqrt(var + eps)) — see models/heads.py _fused_mlp_tail. Training keeps the
XLA path (batch statistics).

Reference being fused: the per-scale SharedMLP + F.max_pool2d of
GraspBalance's width grouping (TrainModel/modules.py:89-124).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mlp_kernel(rel_ref, *refs, n_r: int, n_layers: int, compute_dtype,
                out_c: int):
    """rel_ref (1, R, H, st, K, 3); refs = R*n_layers*2 weight/bias refs
    (W (Cin, Cout), b (1, Cout), scale-major) + out_ref
    (1, H, st, R*out_c)."""
    out_ref = refs[-1]
    wrefs = refs[:-1]
    _, r, h, st, k, c0 = rel_ref.shape

    for ri in range(n_r):
        x = rel_ref[0, ri].reshape(h * st * k, c0)
        for li in range(n_layers):
            w = wrefs[(ri * n_layers + li) * 2][:]
            b = wrefs[(ri * n_layers + li) * 2 + 1][:]
            x = jax.lax.dot(
                x.astype(compute_dtype),
                w.astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )
            x = jnp.maximum(x + b, 0.0)
        # (H*st*K, C) -> (H*st, K, C): linearization-preserving split of
        # the leading dim; max over K reduces the sublane-grouped rows
        g = jnp.max(x.reshape(h * st, k, out_c), axis=1)
        out_ref[0, :, :, ri * out_c : (ri + 1) * out_c] = g.reshape(
            h, st, out_c
        )


@functools.partial(
    jax.jit,
    static_argnames=("s_tile", "compute_dtype", "interpret"),
)
def width_mlp_fused(
    rel: jnp.ndarray,
    weights: tuple,
    *,
    s_tile: int = 16,  # sweep 2026-08-17: 10.04/10.14/10.60 ms st=16/32/64
    compute_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, R, H, S, K, 3) rotated rel coords + per-scale folded (W, b)
    layer lists -> (B, H, S, R*C_last) maxpooled features.

    weights: tuple of R tuples, each ((W0,b0), (W1,b1), ...) covering ALL
    SharedMLP layers, BN pre-folded, biases shape (C,).
    """
    b, r, h, s, k, _ = rel.shape
    n_layers = len(weights[0])
    out_c = weights[0][-1][0].shape[1]
    st = min(s_tile, s)
    while s % st:  # largest divisor of S <= s_tile (S=1024 -> s_tile)
        st -= 1

    flat = []
    for ri in range(r):
        for (w, bias) in weights[ri]:
            flat.append(jnp.asarray(w, jnp.float32))
            flat.append(jnp.asarray(bias, jnp.float32).reshape(1, -1))

    kernel = functools.partial(
        _mlp_kernel,
        n_r=r,
        n_layers=n_layers,
        compute_dtype=compute_dtype,
        out_c=out_c,
    )
    wspecs = [
        pl.BlockSpec(w.shape, lambda i, j: (0, 0),  # all weights are 2D
                     memory_space=pltpu.VMEM)
        for w in flat
    ]
    out = pl.pallas_call(
        kernel,
        grid=(b, s // st),
        in_specs=[
            pl.BlockSpec(
                (1, r, h, st, k, 3),
                lambda i, j: (i, 0, 0, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            *wspecs,
        ],
        out_specs=pl.BlockSpec(
            (1, h, st, r * out_c),
            lambda i, j: (i, 0, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, s, r * out_c), jnp.float32),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(rel, *flat)
    return out


def _compiler_params():
    cp = getattr(pltpu, "CompilerParams", None) or getattr(
        pltpu, "TPUCompilerParams"
    )
    try:
        return cp(vmem_limit_bytes=100 * 1024 * 1024)
    except (TypeError, AttributeError):  # older signature
        return cp()
