"""Norm/act registry parity (nn/registry.py vs the reference's
ModifiedNetTools/{norm,activation}.py) and MLPBlock wiring."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from graspbalance_tpu.nn.layers import MLPBlock
from graspbalance_tpu.nn.registry import CHANNEL_MAP, create_act, create_norm

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


class TestActs:
    @pytest.mark.parametrize(
        "name,ref",
        [
            ("relu", F.relu),
            ("silu", F.silu),
            ("swish", F.silu),
            ("gelu", lambda x: F.gelu(x)),
            ("mish", F.mish),
            ("relu6", F.relu6),
            ("leaky_relu", F.leaky_relu),
            ("elu", F.elu),
            ("celu", F.celu),
            ("selu", F.selu),
            ("sigmoid", torch.sigmoid),
            ("tanh", torch.tanh),
            ("hard_sigmoid", F.hardsigmoid),
            ("hard_swish", F.hardswish),
        ],
    )
    def test_matches_torch(self, name, ref, rng):
        x = rng.normal(size=(64,)).astype(np.float32) * 3
        got = np.asarray(create_act(name)(jnp.asarray(x)))
        want = ref(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)

    def test_dict_args_and_none(self):
        assert create_act(None) is None
        assert create_act({"act": None}) is None
        f = create_act({"act": "leaky_relu", "negative_slope": 0.2})
        assert float(f(jnp.float32(-1.0))) == pytest.approx(-0.2)

    def test_prelu_is_parameterized(self, rng):
        mod = create_act("prelu")
        x = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
        v = mod.init(jax.random.PRNGKey(0), x)
        y = mod.apply(v, x)
        want = F.prelu(
            torch.from_numpy(np.asarray(x)), torch.tensor([0.25])
        ).numpy()
        np.testing.assert_allclose(np.asarray(y), want, atol=1e-6)

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            create_act("nope")


class TestNorms:
    def _run(self, mod, x, train=False):
        v = mod.init(jax.random.PRNGKey(0), x, train=False)
        return mod.apply(v, x, train=train, mutable=["batch_stats"])[0]

    @pytest.mark.parametrize("alias", ["ln", "ln1d", "ln2d"])
    def test_layernorm_aliases_match_torch(self, alias, rng):
        # reference LayerNorm1d/2d permute to channels-last and back
        # (norm.py:10-25); we're channels-last natively
        x = rng.normal(size=(2, 5, 16)).astype(np.float32)
        mod = create_norm(alias, 16)
        got = np.asarray(self._run(mod, jnp.asarray(x)))
        want = F.layer_norm(torch.from_numpy(x), (16,)).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_groupnorm_matches_torch(self, rng):
        x = rng.normal(size=(2, 7, 32)).astype(np.float32)
        mod = create_norm({"norm": "gn", "num_groups": 4}, 32)
        got = np.asarray(self._run(mod, jnp.asarray(x)))
        # torch GroupNorm is channels-second: (B, C, *)
        xt = torch.from_numpy(np.moveaxis(x, 2, 1).copy())
        want = np.moveaxis(F.group_norm(xt, 4).numpy(), 1, 2)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_dimension_suffix_completion(self):
        # 'bn' + dimension -> 'bn2d' (norm.py:78-81); all map to BatchNorm
        from graspbalance_tpu.nn.layers import BatchNorm

        assert isinstance(create_norm("bn", 8, dimension="2d"), BatchNorm)
        assert isinstance(create_norm("syncbn", 8), BatchNorm)
        assert create_norm(None, 8) is None

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            create_norm("rmsnorm", 8)


def test_channel_map_matches_reference():
    ref = {
        "fj": lambda x: x,
        "df": lambda x: x,
        "assa": lambda x: x * 3,
        "assa_dp": lambda x: x * 3 + 3,
        "dp_fj": lambda x: 3 + x,
        "pj": lambda x: x,
        "dp": lambda x: 3,
        "pi_dp": lambda x: x + 3,
        "pj_dp": lambda x: x + 3,
        "dp_fj_df": lambda x: x * 2 + 3,
        "dp_fi_df": lambda x: x * 2 + 3,
        "pi_dp_fj_df": lambda x: x * 2 + 6,
        "pj_dp_fj_df": lambda x: x * 2 + 6,
        "pj_dp_df": lambda x: x + 6,
        "dp_df": lambda x: x + 3,
    }  # activation.py:26-42
    assert set(CHANNEL_MAP) == set(ref)
    for k in ref:
        for x in (3, 64, 256):
            assert CHANNEL_MAP[k](x) == ref[k](x), k


@pytest.mark.parametrize("order", ["conv-norm-act", "norm-act-conv", "conv-act-norm"])
def test_mlpblock_order_variants_match_torch(order, rng):
    """create_convblock1d order semantics (ModifiedNetTools/conv.py:66-103):
    norm-act-conv normalizes IN channels then convs (bias still dropped);
    conv-act-norm swaps act before norm. LayerNorm keeps it stateless so the
    comparison is pure order semantics."""
    cin, cout = 8, 16
    x = rng.normal(size=(2, 10, cin)).astype(np.float32)
    blk = MLPBlock(cout, norm_type="ln1d", act_type="relu", order=order)
    v = blk.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    got = np.asarray(blk.apply(v, jnp.asarray(x), train=False))

    lin = torch.nn.Linear(cin, cout, bias=False)  # bias=False-with-norm rule
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(np.asarray(v["params"]["dense"]["kernel"]).T))
    norm_c = cin if order == "norm-act-conv" else cout
    seq = {
        "conv-norm-act": [lin, torch.nn.LayerNorm(norm_c), torch.nn.ReLU()],
        "norm-act-conv": [torch.nn.LayerNorm(norm_c), torch.nn.ReLU(), lin],
        "conv-act-norm": [lin, torch.nn.ReLU(), torch.nn.LayerNorm(norm_c)],
    }[order]
    want = torch.nn.Sequential(*seq)(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)
    # the norm's learned scale sits on the order-appropriate channel count
    assert v["params"]["bn"]["ln"]["scale"].shape == (norm_c,)


def test_mlpblock_unknown_order_raises(rng):
    x = jnp.asarray(rng.normal(size=(1, 4, 8)).astype(np.float32))
    with pytest.raises(NotImplementedError):
        MLPBlock(16, order="act-conv-norm").init(
            jax.random.PRNGKey(0), x, train=False
        )


def test_mlpblock_with_registry_norm_and_act(rng):
    x = jnp.asarray(rng.normal(size=(2, 10, 8)).astype(np.float32))
    blk = MLPBlock(16, norm_type="gn", act_type="gelu")
    v = blk.init(jax.random.PRNGKey(0), x, train=False)
    y = blk.apply(v, x, train=False)
    assert y.shape == (2, 10, 16)
    assert "batch_stats" not in v  # gn is stateless
