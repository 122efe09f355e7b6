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


def _mlp_rot_kernel(p_ref, w0_ref, b0_ref, *refs, n_r: int, n_tail: int,
                    compute_dtype, c1: int, out_c: int):
    """Rotation-folded variant: p_ref (1, st, R, H, K, 3) RAW grouped
    coords (seed-major; the center subtraction is folded into the per-seed
    bias); w0_ref (1, st, 3, R*C1) per-seed folded layer-0 weights
    (rot @ W0_cat); b0_ref (1, st, R*C1) per-seed biases
    (b0 - center @ W0_eff); refs = R*n_tail*2 tail weight/bias refs +
    scratch (R, st*H*K, C1) + out_ref (1, st, H, R*out_c). Pallas passes
    scratch refs AFTER outputs: refs = [*tail_weights, out_ref, scratch]."""
    out_ref = refs[-2]
    scr = refs[-1]
    wrefs = refs[:-2]
    _, st, r, h, k, _ = p_ref.shape
    hk = h * k

    for si in range(st):
        x = p_ref[0, si].reshape(r * hk, 3)
        w = w0_ref[0, si]  # (3, R*C1)
        xa = jax.lax.dot(
            x.astype(compute_dtype),
            w.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )  # (R*H*K, R*C1): row block ri only needs channel block ri
        for ri in range(n_r):
            piece = xa[ri * hk : (ri + 1) * hk, ri * c1 : (ri + 1) * c1]
            piece = jnp.maximum(
                piece + b0_ref[:, si, ri * c1 : (ri + 1) * c1], 0.0
            )
            scr[ri, si * hk : (si + 1) * hk, :] = piece

    for ri in range(n_r):
        x = scr[ri]
        for li in range(n_tail):
            w = wrefs[(ri * n_tail + li) * 2][:]
            b = wrefs[(ri * n_tail + li) * 2 + 1][:]
            x = jax.lax.dot(
                x.astype(compute_dtype),
                w.astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )
            x = jnp.maximum(x + b, 0.0)
        g = jnp.max(x.reshape(st * h, k, out_c), axis=1)
        out_ref[0, :, :, ri * out_c : (ri + 1) * out_c] = g.reshape(
            st, h, out_c
        )


@functools.partial(
    jax.jit,
    static_argnames=("s_tile", "compute_dtype", "interpret"),
)
def width_mlp_fused_rot(
    grouped: jnp.ndarray,
    centers: jnp.ndarray,
    rot: jnp.ndarray,
    weights: tuple,
    *,
    s_tile: int = 16,
    compute_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Rotation- and center-folded fused width MLPs.

    grouped: (B, S, R, H, K, 3) RAW gathered neighbor coords (seed-major);
    centers: (B, S, 3) seed positions; rot: (B, S, 3, 3) per-seed gripper
    rotations (rel = (p - c) @ rot); weights: R tuples of ALL SharedMLP
    layers ((W0,b0), (W1,b1), ...) with BN pre-folded. Layer 0 absorbs
    both the rotation and the center subtraction per seed:
    ((p - c) @ rot) @ W0 == p @ (rot @ W0) + (b0 - c @ (rot @ W0)) — the
    (B,S,3,R*C1) effective weights and (B,S,R*C1) effective biases are
    built here with two tiny einsums, so neither the rotated-rel tensor
    (conv emitter's ~3 ms layout copy) nor the standalone 6.2 ms
    broadcast-subtract pass (profile 2026-08-17) ever exists.

    Returns (B, S, H, R*C_last) — the head's final (B, Ns, D, 4C) layout
    directly, no trailing transpose.
    """
    b, s, r, h, k, _ = grouped.shape
    n_tail = len(weights[0]) - 1
    c1 = weights[0][0][0].shape[1]
    out_c = weights[0][-1][0].shape[1]
    st = min(s_tile, s)
    while s % st:
        st -= 1

    w0_cat = jnp.concatenate(
        [jnp.asarray(weights[ri][0][0], jnp.float32) for ri in range(r)],
        axis=1,
    )  # (3, R*C1)
    b0_cat = jnp.concatenate(
        [jnp.asarray(weights[ri][0][1], jnp.float32) for ri in range(r)]
    )  # (R*C1,)
    # per-seed effective layer-0 weights: rel@W0 == (p - c) @ (rot @ W0)
    w0_eff = jnp.einsum(
        "bsji,ic->bsjc", jnp.asarray(rot, jnp.float32), w0_cat
    )  # (B, S, 3, R*C1)
    b0_eff = b0_cat[None, None] - jnp.einsum(
        "bsj,bsjc->bsc", jnp.asarray(centers, jnp.float32), w0_eff
    )  # (B, S, R*C1)

    flat = []
    for ri in range(r):
        for (w, bias) in weights[ri][1:]:
            flat.append(jnp.asarray(w, jnp.float32))
            flat.append(jnp.asarray(bias, jnp.float32).reshape(1, -1))

    kernel = functools.partial(
        _mlp_rot_kernel,
        n_r=r,
        n_tail=n_tail,
        compute_dtype=compute_dtype,
        c1=c1,
        out_c=out_c,
    )
    wspecs = [
        pl.BlockSpec(w.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM)
        for w in flat
    ]
    out = pl.pallas_call(
        kernel,
        grid=(b, s // st),
        in_specs=[
            pl.BlockSpec(
                (1, st, r, h, k, 3),
                lambda i, j: (i, j, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, st, 3, r * c1),
                lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, st, r * c1),
                lambda i, j: (i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            *wspecs,
        ],
        out_specs=pl.BlockSpec(
            (1, st, h, r * out_c),
            lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, s, h, r * out_c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((r, st * h * k, c1), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(grouped, w0_eff, b0_eff, *flat)
    return out
