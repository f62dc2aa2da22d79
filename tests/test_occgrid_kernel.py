"""Bit-packed occupancy lookup kernel (kernels/occgrid.py): packing
round-trip and interpret-mode parity with the XLA gather reference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from tpunerf.fields import occupancy as occ_lib
from tpunerf.kernels import occgrid as ok


def test_pack_bits_roundtrip():
    key = jax.random.key(0)
    occ = jax.random.uniform(key, (64 ** 3,)) > 0.5
    packed = ok.pack_bits(occ)
    assert packed.dtype == jnp.uint32
    words = np.asarray(packed)
    unpacked = (words[:, None] >> np.arange(32, dtype=np.uint32)) & 1
    np.testing.assert_array_equal(unpacked.reshape(-1).astype(bool),
                                  np.asarray(occ))


def test_lookup_packed_matches_gather_interpret():
    cfg = occ_lib.OccupancyGridConfig(resolution=64, bound=1.0)
    key = jax.random.key(1)
    grid = jax.random.uniform(key, (cfg.resolution ** 3,)) * 0.02
    x = jax.random.uniform(jax.random.key(2), (500, 3),
                           minval=-1.0, maxval=1.0)
    ref = occ_lib.lookup(grid, x, cfg) > cfg.density_threshold
    packed = ok.pack_bits(grid > cfg.density_threshold)
    with pltpu.force_tpu_interpret_mode():
        fast = ok.occupancy_lookup_packed(x, packed, cfg.resolution,
                                          cfg.bound)
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(ref))


def test_supports_pallas_gating():
    on_tpu = jax.default_backend() == "tpu"
    assert ok.supports_pallas(128) == on_tpu
    assert ok.supports_pallas(64) == on_tpu
    assert not ok.supports_pallas(48)    # 48³ not divisible by 32·128
    assert not ok.supports_pallas(256)   # word table exceeds VMEM budget
