"""Pallas hash-grid kernel: backward-path parity on CPU; the TPU forward
parity is exercised on-device (see kernels/hashgrid.py header for measured
numbers — the forward kernel itself requires a TPU backend)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpunerf.fields.encoding import (HashGridConfig, corner_indices_and_weights,
                                     hash_encode, init_hash_table)
from tpunerf.kernels import hashgrid as hg


@pytest.fixture(scope="module")
def cfg():
    return HashGridConfig(n_levels=4, log2_hashmap_size=9,
                          base_resolution=4, desired_resolution=32)


def test_onehot_matmul_backward_matches_autodiff(cfg):
    table = init_hash_table(jax.random.key(0), cfg) * 100
    x = jax.random.uniform(jax.random.key(1), (777, 3))
    g = jax.random.normal(jax.random.key(2), (777, cfg.out_dim))
    _, vjp = jax.vjp(lambda t: hash_encode(x, t, cfg), table)
    (dt_ref,) = vjp(g)
    dx, dt_fast = hg._bwd(cfg, (x, table), g)
    # bf16 matmul operands → ~2e-3 relative tolerance
    np.testing.assert_allclose(np.asarray(dt_fast), np.asarray(dt_ref),
                               atol=2e-2 * float(jnp.abs(dt_ref).max()))
    assert float(jnp.abs(dx).max()) == 0.0


def test_corner_indices_weights_partition_of_unity(cfg):
    x = jax.random.uniform(jax.random.key(3), (100, 3))
    idx8, w8 = corner_indices_and_weights(x, cfg)
    assert idx8.shape == (cfg.n_levels, 100, 8)
    assert int(idx8.min()) >= 0 and int(idx8.max()) < cfg.table_size
    np.testing.assert_allclose(np.asarray(jnp.sum(w8, axis=-1)), 1.0,
                               atol=1e-5)


def test_supports_pallas_gating(cfg):
    # CPU backend → jnp path regardless of table size
    assert not hg.supports_pallas(cfg) or jax.default_backend() == "tpu"
    big = HashGridConfig(log2_hashmap_size=19)
    assert not hg.supports_pallas(big) or big.table_size <= 8192


def test_hash_encode_auto_dispatch(cfg):
    table = init_hash_table(jax.random.key(0), cfg)
    x = jax.random.uniform(jax.random.key(1), (64, 3))
    out = hg.hash_encode_auto(x, table, cfg)
    ref = hash_encode(x, table, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_pallas_bwd_kernel_matches_autodiff_interpret(cfg):
    from jax.experimental.pallas import tpu as pltpu
    table = init_hash_table(jax.random.key(0), cfg) * 100
    x = jax.random.uniform(jax.random.key(1), (777, 3))
    g = jax.random.normal(jax.random.key(2), (777, cfg.out_dim))
    _, vjp = jax.vjp(lambda t: hash_encode(x, t, cfg), table)
    (dt_ref,) = vjp(g)
    with pltpu.force_tpu_interpret_mode():
        dt_fast = hg._hash_bwd_pallas(x, g, cfg)
    np.testing.assert_allclose(np.asarray(dt_fast), np.asarray(dt_ref),
                               atol=2e-2 * float(jnp.abs(dt_ref).max()))


def test_pallas_packed_fwd_matches_ref_interpret(cfg):
    """The F=2 packed-pair forward kernel (interpret mode on CPU) vs the jnp
    reference evaluated on the bf16-rounded table — the kernel's declared
    feature precision (Instant-NGP trains fp16 tables; see
    kernels/hashgrid.py:_pack_table_pairs)."""
    from jax.experimental.pallas import tpu as pltpu
    table = init_hash_table(jax.random.key(0), cfg) * 100
    x = jax.random.uniform(jax.random.key(1), (777, 3))
    with pltpu.force_tpu_interpret_mode():
        out = hg._hash_encode_pallas(x, table, cfg)
    tround = table.astype(jnp.bfloat16).astype(jnp.float32)
    ref = hash_encode(x, tround, cfg)
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6 * scale)


def test_pack_table_pairs_roundtrip(cfg):
    """Packing two bf16 features into one f32 container must be exactly
    invertible (high 16 bits = f0, low<<16 = f1)."""
    table = init_hash_table(jax.random.key(0), cfg) * 100
    packed = hg._pack_table_pairs(table)
    u = jax.lax.bitcast_convert_type(packed, jnp.uint32)
    f0 = jax.lax.bitcast_convert_type(
        jnp.bitwise_and(u, jnp.uint32(0xFFFF0000)), jnp.float32)
    f1 = jax.lax.bitcast_convert_type(jnp.left_shift(u, 16), jnp.float32)
    tb = table.astype(jnp.bfloat16).astype(jnp.float32)
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(tb[..., 0]))
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(tb[..., 1]))
