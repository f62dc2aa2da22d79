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
    packed = ok.pack_bits_blocked(grid > cfg.density_threshold,
                                  cfg.resolution)
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


def test_lookup_packed_sparse_and_empty_grids_interpret():
    """The r4 sparse-window sweep: correctness when most windows are
    all-zero (loop bound < full sweep) and when the grid is entirely empty
    (zero loop trips)."""
    cfg = occ_lib.OccupancyGridConfig(resolution=64, bound=1.0)
    G = cfg.resolution
    # one small occupied blob — the vast majority of windows are zero
    centers = occ_lib.cell_centers(cfg)
    blob = (jnp.linalg.norm(centers - jnp.array([0.3, 0.1, -0.2]), axis=-1)
            < 0.15)
    x = jax.random.uniform(jax.random.key(3), (1000, 3),
                           minval=-1.0, maxval=1.0)
    ref = occ_lib.lookup(blob.astype(jnp.float32), x, cfg) > 0.5
    packed = ok.pack_bits_blocked(blob, G)
    with pltpu.force_tpu_interpret_mode():
        fast = ok.occupancy_lookup_packed(x, packed, G, cfg.bound)
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(ref))
    assert np.asarray(ref).any()         # the blob is actually hit

    empty = ok.pack_bits_blocked(jnp.zeros((G ** 3,), bool), G)
    with pltpu.force_tpu_interpret_mode():
        none = ok.occupancy_lookup_packed(x, empty, G, cfg.bound)
    assert not np.asarray(none).any()


def test_pack_bits_blocked_layout():
    """Block order: bit j of the packed stream = cell (bx·16+lx, by·16+ly,
    bz·16+lz) where j = ((bx·nb+by)·nb+bz)·4096 + (lx·16+ly)·16+lz."""
    G = 32
    nb = G // 16
    rng = np.random.default_rng(0)
    occ = rng.uniform(size=(G ** 3,)) < 0.3
    packed = np.asarray(ok.pack_bits_blocked(jnp.asarray(occ), G))
    bits = ((packed[:, None] >> np.arange(32, dtype=np.uint32)) & 1
            ).reshape(-1).astype(bool)
    occ3 = occ.reshape(G, G, G)
    for j in [0, 1, 4096, 5000, 17777, G ** 3 - 1]:
        blk, loc = divmod(j, 16 ** 3)
        bx, r = divmod(blk, nb * nb)
        by, bz = divmod(r, nb)
        lx, r = divmod(loc, 16 * 16)
        ly, lz = divmod(r, 16)
        assert bits[j] == occ3[bx * 16 + lx, by * 16 + ly, bz * 16 + lz]


def test_packed_bitfield_f32_bitcast_roundtrip():
    """The cached bitfield rides the params pytree bitcast to f32 (frozen
    float leaves keep grads/global_norm trivial) — the bitcast must be
    lossless for arbitrary word patterns incl. NaN payloads."""
    import jax.numpy as jnp
    G = 32
    rng = np.random.default_rng(1)
    occ = jnp.asarray(rng.uniform(size=(G ** 3,)) < 0.5)
    packed = ok.pack_bits_blocked(occ, G)
    f = jax.lax.bitcast_convert_type(packed, jnp.float32)
    back = jax.lax.bitcast_convert_type(f, jnp.uint32)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(packed))
