"""Pallas TPU kernel: bit-packed occupancy-grid lookup.

The occupancy test of the ray marcher (fields/occupancy.py — torch-ngp's
density-bitfield lookup, reference README.md:155 lineage) gathers one value
per stratified sample: B·P·S ≈ 0.5M random lookups per 64×64 frame. XLA's
TPU gather costs ~9 ns/lookup (≈5 ms/frame — a quarter of the whole
fwd+bwd). Packing the G³ boolean field into uint32 words (z-minor) shrinks
the table to G³/32 words ≤ 256 KB — VMEM-resident — and the lookup becomes
the same windowed `dynamic_gather` scan as kernels/hashgrid.py: per 128-lane
window, broadcast the word row, lane-gather, select where the word id falls
in the window, then extract the bit. ~4 VPU ops per window per point-vreg.

r4: the sweep is SPARSE — all-zero windows (empty space, the common case in
steady-state training) are skipped entirely via a nonzero-first window
permutation + dynamic loop bound, so cost scales with the occupied-window
count: the dense sweep measured ~1.5 ms at G=128 on 0.5M lookups; with a
blob-shaped grid (~40% windows nonzero) ~0.7 ms, → ~0 as space empties.
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


_BLK = 16     # cells per block edge: one 16³ block = 4096 bits = 1 window


def pack_bits_blocked(occ: jnp.ndarray, grid_res: int) -> jnp.ndarray:
    """(G³,) bool, z-minor → (G³/32,) uint32 in BLOCK order: the grid is
    tiled into 16³-cell cubes, one cube per 128-word window. With the flat
    z-minor order a window spans 32 full-z (ix,iy) columns, so almost every
    window intersects an occupied blob and the sparse sweep saves little;
    cube windows make nonzero-window count track VOLUME sparsity (the
    point of the r4 sparse sweep). Word/bit math mirrored in `_kernel`."""
    G = grid_res
    nb = G // _BLK
    blocked = occ.reshape(nb, _BLK, nb, _BLK, nb, _BLK) \
        .transpose(0, 2, 4, 1, 3, 5).reshape(-1)
    return pack_bits(blocked)


_UNROLL = 16


def _kernel(ngrp_ref, wlist_ref, xp_ref, yp_ref, zp_ref, words_ref, out_ref,
            *, grid_res: int, bound: float, n_windows: int):
    """Blocks: coords (SUB, 128) world positions; words (W, 128) int32
    (bitcast uint32) full table; out (SUB, 128) int32 ∈ {0, 1}.

    Sparse sweep (r4): `wlist` (SMEM) permutes window ids so the NONZERO
    windows come first and `ngrp` bounds the loop at ⌈nnz/16⌉ groups — a
    point whose word lies in an all-zero window correctly reads 0 from the
    zero-initialized accumulator, so empty windows never need visiting. In
    steady-state training most of the grid is empty space; the sweep cost
    becomes ∝ occupied-window count instead of G³/(32·128). Trailing list
    entries inside a partial group are zero windows — OR-ing them is a
    no-op, so no sentinel handling is needed."""
    G = grid_res
    nb = G // _BLK
    scale = G / (2.0 * bound)
    ix = jnp.clip(((xp_ref[:] + bound) * scale).astype(jnp.int32), 0, G - 1)
    iy = jnp.clip(((yp_ref[:] + bound) * scale).astype(jnp.int32), 0, G - 1)
    iz = jnp.clip(((zp_ref[:] + bound) * scale).astype(jnp.int32), 0, G - 1)
    # block-ordered bit layout (see pack_bits_blocked): 16³-cube windows
    block = ((ix >> 4) * nb + (iy >> 4)) * nb + (iz >> 4)
    in_block = (jnp.bitwise_and(ix, _BLK - 1) * _BLK
                + jnp.bitwise_and(iy, _BLK - 1)) * _BLK \
        + jnp.bitwise_and(iz, _BLK - 1)               # (SUB, 128) ∈ [0,4096)
    bit = jnp.bitwise_and(in_block, 31)
    wid = block                                       # window == block
    local = jnp.right_shift(in_block, 5)              # word within window

    def body(i, acc):
        # 16-way unrolled groups: 4 vector ops per trip alone leaves the
        # loop dominated by trip overhead — unroll×16 measured 3.16 →
        # 2.05 ms on 0.5M lookups (v5e, dense sweep)
        for u in range(_UNROLL):
            w = wlist_ref[i * _UNROLL + u]
            row = jnp.broadcast_to(
                words_ref[pl.ds(w, 1), :], (_SUB, _WINDOW))
            g = jnp.take_along_axis(row, local, axis=1)
            acc = acc | jnp.where(wid == w, g, 0)
        return acc

    acc = jax.lax.fori_loop(0, ngrp_ref[0], body,
                            jnp.zeros((_SUB, _WINDOW), jnp.int32))
    out_ref[:] = jnp.bitwise_and(jnp.right_shift(acc, bit), 1)


@functools.partial(jax.jit, static_argnames=("grid_res", "bound"))
def occupancy_lookup_packed(x: jnp.ndarray, packed: jnp.ndarray,
                            grid_res: int, bound: float) -> jnp.ndarray:
    """x (..., 3) world coords, packed (G³/32,) uint32 in the
    `pack_bits_blocked` 16³-cube order → bool (...,)."""
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

    # sparse-sweep prep: nonzero windows first, loop bounded by their count
    nonzero = jnp.any(words != 0, axis=1)
    wlist = jnp.argsort(~nonzero).astype(jnp.int32)          # (n_windows,)
    pad_w = (-n_windows) % _UNROLL
    if pad_w:      # partial last group reads duplicate window-0 entries —
        wlist = jnp.concatenate(   # harmless (wid==w matches are idempotent)
            [wlist, jnp.broadcast_to(wlist[:1], (pad_w,))])
    ngrp = jnp.ceil(jnp.sum(nonzero) / _UNROLL).astype(jnp.int32)[None]

    kern = functools.partial(_kernel, grid_res=grid_res, bound=bound,
                             n_windows=n_windows)
    out = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),    # ngrp (1,)
            pl.BlockSpec(memory_space=pltpu.SMEM),    # wlist (n_windows,)
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
    )(ngrp, wlist, xs, ys, zs, words)
    return out.reshape(-1)[:N].reshape(shape) > 0


def supports_pallas(grid_res: int) -> bool:
    return (jax.default_backend() == "tpu"
            and grid_res % _BLK == 0              # 16³-cube window layout
            and (grid_res ** 3) % (32 * _WINDOW) == 0
            and grid_res ** 3 // 32 <= 1 << 16)   # ≤ 256 KB of words in VMEM
