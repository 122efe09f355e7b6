"""Fused width-MLP tail (ops/pallas/widthmlp_kernel.py) vs the XLA path.

The fused path must reproduce the standard SharedMLP+maxpool eval
computation (BN folded into effective weights) through the full
MultiScaleWidthGrouping head — same param tree, same outputs up to fp
reassociation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from graspbalance_tpu.models.heads import MultiScaleWidthGrouping
from graspbalance_tpu.ops.pallas.widthmlp_kernel import (
    width_mlp_fused,
    width_mlp_fused_rot,
)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_width_mlp_fused_matches_reference(rng):
    """Kernel vs plain jnp: dense+bias+relu chain then max over K."""
    b, r, h, s, k = 2, 3, 2, 8, 16
    widths = (8, 12, 24)
    rel = jnp.asarray(rng.standard_normal((b, r, h, s, k, 3)), jnp.float32)
    weights = []
    for _ in range(r):
        ws, cin = [], 3
        for c in widths:
            ws.append(
                (
                    jnp.asarray(rng.standard_normal((cin, c)) * 0.3, jnp.float32),
                    jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32),
                )
            )
            cin = c
        weights.append(tuple(ws))
    got = width_mlp_fused(rel, tuple(weights), interpret=True)

    want = np.zeros((b, h, s, r * widths[-1]), np.float32)
    for ri in range(r):
        x = np.asarray(rel[:, ri], np.float64)
        for w, bias in weights[ri]:
            x = np.maximum(x @ np.asarray(w, np.float64) + np.asarray(bias, np.float64), 0.0)
        want[..., ri * widths[-1] : (ri + 1) * widths[-1]] = x.max(axis=3)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_width_mlp_fused_rot_matches_reference(rng):
    """Rotation+center-folded kernel vs plain jnp:
    ((p - c) @ rot) @ W chain + max."""
    b, s, r, h, k = 2, 8, 3, 2, 16
    widths = (8, 12, 24)
    centers = jnp.asarray(
        (rng.random((b, s, 3)) - 0.5).astype(np.float32)
    )
    grouped = centers[:, :, None, None, None, :] + jnp.asarray(
        rng.standard_normal((b, s, r, h, k, 3)) * 0.1, jnp.float32
    )
    q, _ = np.linalg.qr(rng.standard_normal((b, s, 3, 3)))
    rot = jnp.asarray(q.astype(np.float32))
    weights = []
    for _ in range(r):
        ws, cin = [], 3
        for c in widths:
            ws.append(
                (
                    jnp.asarray(rng.standard_normal((cin, c)) * 0.3, jnp.float32),
                    jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32),
                )
            )
            cin = c
        weights.append(tuple(ws))
    got = width_mlp_fused_rot(
        grouped, centers, rot, tuple(weights), interpret=True
    )

    dd = np.asarray(grouped, np.float64) - np.asarray(centers, np.float64)[
        :, :, None, None, None, :
    ]
    rr = np.asarray(rot, np.float64)
    rel = np.einsum("bsrhkj,bsji->bsrhki", dd, rr)
    want = np.zeros((b, s, h, r * widths[-1]), np.float32)
    for ri in range(r):
        x = rel[:, :, ri]
        for w, bias in weights[ri]:
            x = np.maximum(
                x @ np.asarray(w, np.float64) + np.asarray(bias, np.float64),
                0.0,
            )
        want[..., ri * widths[-1] : (ri + 1) * widths[-1]] = x.max(axis=3)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def _random_stats(variables, rng):
    """Perturb params + batch stats so the BN fold is non-trivial."""

    def perturb(path, x):
        name = "/".join(str(p) for p in path)
        if name.endswith("var"):
            return jnp.asarray(rng.random(x.shape) + 0.5, jnp.float32)
        return jnp.asarray(rng.standard_normal(x.shape) * 0.5, jnp.float32)

    return jax.tree_util.tree_map_with_path(
        lambda p, x: perturb(tuple(getattr(q, "key", q) for q in p), x),
        variables,
    )


def test_fused_grouping_matches_xla(rng):
    """Full MultiScaleWidthGrouping: mlp_impl='fused' == 'xla' in eval."""
    b, n, s = 2, 200, 8
    cloud = jnp.asarray((rng.random((b, n, 3)) - 0.5).astype(np.float32))
    seeds = cloud[:, :s]
    q, _ = np.linalg.qr(rng.standard_normal((b, s, 3, 3)))
    rot = jnp.asarray(q.astype(np.float32))

    kwargs = dict(nsample=16, mlp=(8, 12, 16))
    mod_x = MultiScaleWidthGrouping(mlp_impl="xla", **kwargs)
    variables = mod_x.init(
        jax.random.PRNGKey(0), seeds, cloud, rot, train=True
    )
    variables = _random_stats(variables, rng)

    want = mod_x.apply(variables, seeds, cloud, rot, train=False)
    mod_f = MultiScaleWidthGrouping(mlp_impl="fused", **kwargs)
    got = mod_f.apply(variables, seeds, cloud, rot, train=False)
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
    )


def test_fused_auto_stays_xla_on_cpu(rng):
    """'auto' must not pick the Pallas path off-TPU (and must train XLA)."""
    b, n, s = 1, 100, 4
    cloud = jnp.asarray((rng.random((b, n, 3)) - 0.5).astype(np.float32))
    seeds = cloud[:, :s]
    rot = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (b, s, 3, 3))
    mod = MultiScaleWidthGrouping(nsample=8, mlp=(4, 6))
    variables = mod.init(jax.random.PRNGKey(0), seeds, cloud, rot, train=True)
    out, updates = mod.apply(
        variables, seeds, cloud, rot, train=True, mutable=["batch_stats"]
    )
    assert np.all(np.isfinite(np.asarray(out)))
    assert "batch_stats" in updates
