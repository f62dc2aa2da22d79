"""Pallas TPU kernel: bit-packed occupancy-grid lookup.

The occupancy test of the ray marcher (fields/occupancy.py — torch-ngp's
density-bitfield lookup, reference README.md:155 lineage) gathers one value
per stratified sample: B·P·S ≈ 0.5M random lookups per 64×64 frame. XLA's
TPU gather costs ~9 ns/lookup (≈5 ms/frame — a quarter of the whole
fwd+bwd). Packing the G³ boolean field into uint32 words (z-minor) shrinks
the table to G³/32 words ≤ 256 KB — VMEM-resident — and the lookup becomes
the same windowed `dynamic_gather` scan as kernels/hashgrid.py: per 128-lane
window, broadcast the word row, lane-gather, select where the word id falls
in the window, then extract the bit. ~4 VPU ops per window per point-vreg
→ ~1.3 ms at G=128 (3.7× the XLA gather) and ~0.2 ms at G=64.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 16384         # points per grid step
_SUB = _TILE // 128
_WINDOW = 128


def pack_bits(occ: jnp.ndarray) -> jnp.ndarray:
    """(G³,) bool, z-minor row-major → (G³/32,) uint32, bit i of word w =
    cell w·32+i. Sum of distinct powers of two ≡ bitwise OR."""
    n = occ.shape[0]
    assert n % 32 == 0
    bits = occ.reshape(n // 32, 32).astype(jnp.uint32)
    return jnp.sum(bits << jnp.arange(32, dtype=jnp.uint32)[None, :],
                   axis=-1, dtype=jnp.uint32)


def _kernel(xp_ref, yp_ref, zp_ref, words_ref, out_ref, *, grid_res: int,
            bound: float, n_windows: int):
    """Blocks: coords (SUB, 128) world positions; words (W, 128) int32
    (bitcast uint32) full table; out (SUB, 128) int32 ∈ {0, 1}."""
    G = grid_res
    scale = G / (2.0 * bound)
    ix = jnp.clip(((xp_ref[:] + bound) * scale).astype(jnp.int32), 0, G - 1)
    iy = jnp.clip(((yp_ref[:] + bound) * scale).astype(jnp.int32), 0, G - 1)
    iz = jnp.clip(((zp_ref[:] + bound) * scale).astype(jnp.int32), 0, G - 1)
    cell = (ix * G + iy) * G + iz                     # (SUB, 128)
    word = jnp.right_shift(cell, 5)
    bit = jnp.bitwise_and(cell, 31)
    wid = jnp.right_shift(word, 7)
    local = jnp.bitwise_and(word, _WINDOW - 1)

    unroll = next(u for u in (16, 8, 4, 2, 1) if n_windows % u == 0)

    def body(i, acc):
        # partially unrolled window scan: a full unroll (512 windows at
        # G=128) would blow the VMEM stack, but 4 vector ops per fori trip
        # leaves the loop dominated by trip overhead — unroll×16 measured
        # 3.16 → 2.05 ms on 0.5M lookups (v5e)
        for u in range(unroll):
            w = i * unroll + u
            row = jnp.broadcast_to(
                words_ref[pl.ds(w, 1), :], (_SUB, _WINDOW))
            g = jnp.take_along_axis(row, local, axis=1)
            acc = acc | jnp.where(wid == w, g, 0)
        return acc

    acc = jax.lax.fori_loop(0, n_windows // unroll,
                            body, jnp.zeros((_SUB, _WINDOW), jnp.int32))
    out_ref[:] = jnp.bitwise_and(jnp.right_shift(acc, bit), 1)


@functools.partial(jax.jit, static_argnames=("grid_res", "bound"))
def occupancy_lookup_packed(x: jnp.ndarray, packed: jnp.ndarray,
                            grid_res: int, bound: float) -> jnp.ndarray:
    """x (..., 3) world coords, packed (G³/32,) uint32 → bool (...,)."""
    shape = x.shape[:-1]
    xf = x.reshape(-1, 3)
    N = xf.shape[0]
    pad = (-N) % _TILE
    xp = jnp.pad(xf, ((0, pad), (0, 0)))
    n_tiles = (N + pad) // _TILE
    planes = xp.reshape(n_tiles * _SUB, _WINDOW, 3)
    xs, ys, zs = planes[..., 0], planes[..., 1], planes[..., 2]

    n_words = packed.shape[0]
    assert n_words % _WINDOW == 0
    n_windows = n_words // _WINDOW
    words = jax.lax.bitcast_convert_type(
        packed, jnp.int32).reshape(n_windows, _WINDOW)

    kern = functools.partial(_kernel, grid_res=grid_res, bound=bound,
                             n_windows=n_windows)
    out = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((_SUB, _WINDOW), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SUB, _WINDOW), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SUB, _WINDOW), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),    # full word table
        ],
        out_specs=pl.BlockSpec((_SUB, _WINDOW), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * _SUB, _WINDOW), jnp.int32),
    )(xs, ys, zs, words)
    return out.reshape(-1)[:N].reshape(shape) > 0


def supports_pallas(grid_res: int) -> bool:
    return (jax.default_backend() == "tpu"
            and (grid_res ** 3) % (32 * _WINDOW) == 0
            and grid_res ** 3 // 32 <= 1 << 16)   # ≤ 256 KB of words in VMEM
