"""Generic fused MLP+reduce kernel (ops/pallas/mlpmax_kernel.py) parity.

Covers the kernel against a plain jnp reference (multi-part layer-0 split,
all reductions) and the fused eval paths inside SetAbstraction and
LocalAggregation against their XLA module paths (GB_FORCE_FUSED_EVAL
exercises the gate off-TPU; the kernel runs interpreted)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from graspbalance_tpu.models.drp import LocalAggregation
from graspbalance_tpu.nn.sa_fp import SetAbstraction
from graspbalance_tpu.ops.pallas.mlpmax_kernel import mlp_max_fused


@pytest.fixture
def rng():
    return np.random.default_rng(11)


@pytest.mark.parametrize("reduction", ["max", "mean", "sum"])
def test_kernel_matches_reference(rng, reduction):
    b, n, k = 2, 24, 8
    c_parts = (3, 5)
    widths = (12, 16)
    parts = tuple(
        jnp.asarray(rng.standard_normal((b, n, k, c)), jnp.float32)
        for c in c_parts
    )
    w0_parts = tuple(
        jnp.asarray(rng.standard_normal((c, widths[0])) * 0.4, jnp.float32)
        for c in c_parts
    )
    b0 = jnp.asarray(rng.standard_normal(widths[0]) * 0.1, jnp.float32)
    w1 = jnp.asarray(
        rng.standard_normal((widths[0], widths[1])) * 0.3, jnp.float32
    )
    b1 = jnp.asarray(rng.standard_normal(widths[1]) * 0.1, jnp.float32)
    got = mlp_max_fused(
        parts, ((w0_parts, b0), (w1, b1)), reduction=reduction, interpret=True
    )

    x = np.concatenate([np.asarray(p, np.float64) for p in parts], axis=-1)
    w0 = np.concatenate([np.asarray(w, np.float64) for w in w0_parts], axis=0)
    x = np.maximum(x @ w0 + np.asarray(b0, np.float64), 0.0)
    x = np.maximum(x @ np.asarray(w1, np.float64) + np.asarray(b1, np.float64), 0.0)
    want = {
        "max": x.max(axis=2),
        "mean": x.mean(axis=2),
        "sum": x.sum(axis=2),
    }[reduction]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def _random_stats(variables, rng):
    def perturb(path, x):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if name.endswith("var"):
            return jnp.asarray(rng.random(x.shape) + 0.5, jnp.float32)
        return jnp.asarray(rng.standard_normal(x.shape) * 0.5, jnp.float32)

    return jax.tree_util.tree_map_with_path(perturb, variables)


def test_set_abstraction_fused_matches_xla(rng, monkeypatch):
    b, n = 2, 64
    xyz = jnp.asarray((rng.random((b, n, 3)) - 0.5).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((b, n, 6)).astype(np.float32))
    mod = SetAbstraction(npoint=16, radius=0.4, nsample=8, mlp=(8, 12, 16))
    variables = mod.init(jax.random.PRNGKey(0), xyz, feats, train=True)
    variables = _random_stats(variables, rng)

    monkeypatch.delenv("GB_FORCE_FUSED_EVAL", raising=False)
    want_xyz, want_f, _ = mod.apply(variables, xyz, feats, train=False)
    monkeypatch.setenv("GB_FORCE_FUSED_EVAL", "1")
    got_xyz, got_f, _ = mod.apply(variables, xyz, feats, train=False)
    np.testing.assert_array_equal(np.asarray(got_xyz), np.asarray(want_xyz))
    np.testing.assert_allclose(
        np.asarray(got_f), np.asarray(want_f), rtol=2e-4, atol=2e-5
    )


def test_set_abstraction_fused_no_features(rng, monkeypatch):
    b, n = 1, 48
    xyz = jnp.asarray((rng.random((b, n, 3)) - 0.5).astype(np.float32))
    mod = SetAbstraction(npoint=8, radius=0.5, nsample=8, mlp=(6, 10))
    variables = mod.init(jax.random.PRNGKey(1), xyz, train=True)
    variables = _random_stats(variables, rng)
    monkeypatch.delenv("GB_FORCE_FUSED_EVAL", raising=False)
    _, want_f, _ = mod.apply(variables, xyz, train=False)
    monkeypatch.setenv("GB_FORCE_FUSED_EVAL", "1")
    _, got_f, _ = mod.apply(variables, xyz, train=False)
    np.testing.assert_allclose(
        np.asarray(got_f), np.asarray(want_f), rtol=2e-4, atol=2e-5
    )


@pytest.mark.parametrize("reduction", ["max", "mean"])
def test_local_agg_fused_matches_xla(rng, monkeypatch, reduction):
    b, n, c = 2, 32, 8
    xyz = jnp.asarray((rng.random((b, n, 3)) - 0.5).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((b, n, c)).astype(np.float32))
    mod = LocalAggregation(
        channels=12, radius=0.5, nsample=8, reduction=reduction
    )
    variables = mod.init(jax.random.PRNGKey(2), xyz, feats, train=True)
    variables = _random_stats(variables, rng)
    monkeypatch.delenv("GB_FORCE_FUSED_EVAL", raising=False)
    want = mod.apply(variables, xyz, feats, train=False)
    monkeypatch.setenv("GB_FORCE_FUSED_EVAL", "1")
    got = mod.apply(variables, xyz, feats, train=False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
    )
