"""Mesh and sharding utilities.

The reference's entire distribution story is an (unused) DataParallel shim
whose only job is scattering ragged per-object label lists across GPUs
(data_parallel.py:11-58, SURVEY.md §2.3). With fixed-shape padded labels
that problem evaporates: training is SPMD data parallelism over a
`Mesh(('data',))` — batch arrays sharded on axis 0, parameters replicated,
gradient all-reduce inserted by XLA over ICI.

A second, optional 'point' axis supports sharding the point dimension
(context-parallel analog for very large clouds, SURVEY.md §5); the default
benchmark workloads (20k points) fit one chip so the axis size is 1.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_point: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_point
    devs = np.asarray(devices[: n_data * n_point]).reshape(n_data, n_point)
    return Mesh(devs, axis_names=("data", "point"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-put every batch array with its leading axis over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), batch)
