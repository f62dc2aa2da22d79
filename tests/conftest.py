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
# Cache EVERY test compile (the repo default only caches ≥2 s compiles):
# this 2-core host spends most suite wall-time in hundreds of sub-2 s XLA
# CPU compiles that recur on every run; persisting them cuts warm suite
# time severalfold.
try:
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# --------------------------------------------------------------------------
# Session-scoped tiny guidance stacks (one flax trace + init per xdist
# worker instead of one per test file): tests that need different flags
# (latent_mode, min/max step) use dataclasses.replace — params are shared.
# --------------------------------------------------------------------------

@pytest.fixture(scope="session")
def tiny_sd_guidance():
    from tpunerf.guidance.stable_diffusion import StableDiffusionGuidance
    return StableDiffusionGuidance.create(jax.random.key(0), tiny=True)


@pytest.fixture(scope="session")
def tiny_pbe_guidance():
    from tpunerf.guidance.paint_by_example import PaintByExampleGuidance
    return PaintByExampleGuidance.create(jax.random.key(0), tiny=True)


@pytest.fixture(scope="session")
def tiny_depth_guidance():
    from tpunerf.guidance.depth import StableDiffusionDepthGuidance
    return StableDiffusionDepthGuidance.create(jax.random.key(0), tiny=True,
                                               use_inpaint=True)
