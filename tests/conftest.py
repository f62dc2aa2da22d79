"""Test config: force an 8-device virtual CPU platform *before* jax imports.

This is the TPU-world answer to "test multi-chip without a cluster"
(SURVEY.md §4): shardings/collectives compile and run on 8 virtual CPU
devices; the driver separately dry-runs the multi-chip path.
"""
import os

# Force CPU even when the environment pins JAX_PLATFORMS=axon (the TPU
# tunnel): unit tests must not round-trip tiny ops over the network. The
# axon plugin registers itself in sitecustomize before this file runs, so
# the env var alone is not enough — override via jax.config too.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
