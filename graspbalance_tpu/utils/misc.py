"""Parameter/tree introspection helpers."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def count_params(tree) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


def param_bytes(tree) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(tree))


def tree_norm(tree) -> jnp.ndarray:
    """Global L2 norm of a pytree (grad-norm logging)."""
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))
