"""Test configuration: force CPU JAX with a virtual 8-device mesh.

CI/tests never need a TPU: XLA:CPU plays the fake backend, and the
host-platform device count gives us a real 8-way mesh for sharding tests.
Must run before jax is imported anywhere.
"""

import os

# Force-override: the environment pins jax to the axon remote-TPU plugin
# (registered from sitecustomize before this file runs); tests must run on
# local XLA:CPU with a virtual 8-device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: repeat test runs skip XLA:CPU recompiles
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
