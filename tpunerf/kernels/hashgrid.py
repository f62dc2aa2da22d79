"""Pallas TPU kernel: multiresolution hash-grid encoding.

The torch-ngp `gridencoder` CUDA extension equivalent (SURVEY.md §2.5/§2.6;
the BASELINE.json north-star kernel). XLA's TPU gather costs ~6 cycles *per
element* (measured v5e: 33.5M lookups ≈ 280 ms — the entire frame budget),
so the forward is a hand-written Mosaic kernel built on the one fast dynamic
indexing primitive the hardware exposes: `tpu.dynamic_gather`, a within-vreg
lane shuffle (`take_along_axis(src (A,128), idx (A,128), axis=1)`).

Strategy:
* the WHOLE table lives in VMEM — (L, T, F) with T ≤ 8192 is ≤ 1 MB;
* each level's table is viewed as T/128 windows of 128 lanes;
* per point-tile (128×128 points — large tiles amortize the per-grid-step
  dispatch cost, measured 3× over 8×128) and level, loop windows: broadcast
  the window row, lane-gather every corner's local index, select-accumulate
  where the index falls in the window.

Measured (v5e, L=12 T=2048 F=2, 262k points): fwd ≈ 2.1 ms with the F=2
packed-pair kernel (r3; 5.1 ms unpacked, kept for F≠2), bwd ≈ 2.9 ms
(r4; 4.9 ms with the r3 dot order) — vs 14.6 ms/54 ms for the
XLA-gather/scatter formulations they replace. The
packed forward stores each slot's two features as a bf16 pair in one f32
lane (`_pack_table_pairs`): the window sweep then needs one gather + one
bitwise select per corner-window instead of two gathers + weighted
accumulate, and the trilinear weighting happens once per corner after a
2-bit-op unpack. Feature precision becomes bf16 (Instant-NGP trains fp16
tables); the backward is exact f32 w.r.t. the unrounded table
(straight-through the rounding, like fp16-table torch-ngp).

Backward cost split (measured r4, scripts/exp_hash_bwd.py): the one-hot
construction is ~2.7 ms of VPU work that OVERLAPS the MXU contractions;
dot operand order decides the MXU side — payload-first (F·LO × CH)·ohᵀ
puts the full 128 lanes on the output and runs the whole backward at
2.9 ms (VPU-bound), where the r3 (oh, payload) order measured 4.9 ms
(~10% MXU utilization). The structural floor for this decomposition is
the one-hot build itself (≈(128+3·LO)·CH VPU elements per corner-level).

Backward (table gradient) is a second Pallas kernel: per level, the
scatter-add dL/dtable[idx] += w·g is expressed as a one-hot matmul on the
MXU with the one-hot built **in VMEM** (never touching HBM), accumulating a
(128, LO·F) block in scratch across point chunks. Position gradients are not
needed on this path (ray positions are not trained), so the custom VJP
returns zero dx.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpunerf.fields.encoding import (HashGridConfig, _PRIMES, hash_encode as
                                     hash_encode_ref)

_WINDOW = 128         # lanes per dynamic_gather window


def _fwd_sub(cfg: HashGridConfig) -> int:
    """Coordinate sublanes per forward tile. The unrolled window scan keeps
    ~SUB·n_windows vregs of straight-line temporaries live on the Mosaic
    stack, so scale the tile down as the table (window count) grows to stay
    inside the 16 MB scoped-VMEM limit: T=2048 → 128 sublanes (the measured
    optimum), T=4096 → 64, T=8192 → 32."""
    n_windows = cfg.table_size // _WINDOW
    return max(8, min(128, 2048 // n_windows))


def _pack_table_pairs(table: jnp.ndarray) -> jnp.ndarray:
    """(L, T, 2) f32 → (L, T) f32 whose bits hold the two features as a
    bf16 pair (f0 in the high 16 bits, f1 low). One f32 lane per slot
    halves the gather/select count of the window sweep; bf16 feature
    precision matches Instant-NGP's fp16-table training regime."""
    tb = table.astype(jnp.bfloat16)
    u0 = jax.lax.bitcast_convert_type(tb[..., 0], jnp.uint16).astype(
        jnp.uint32)
    u1 = jax.lax.bitcast_convert_type(tb[..., 1], jnp.uint16).astype(
        jnp.uint32)
    return jax.lax.bitcast_convert_type((u0 << 16) | u1, jnp.float32)


def _kernel_packed(res_ref, dense_ref, xp_ref, yp_ref, zp_ref, ptab_ref,
                   out_ref, *, cfg: HashGridConfig, sub: int):
    """F=2 fast path. Grid: (point_tiles, L). Blocks: coords (SUB, 128);
    packed table (L, T/128, 128) f32-container windows (3-D so the traced
    `level` indexes a leading non-tiled dim — Mosaic cannot dynamically
    load at an unaligned sublane offset); out (2, SUB, 128).

    Each corner's table value is selected (bitwise — valid on the packed
    container) from the one window its index falls in: per window the sweep
    is ONE broadcast + 8·(gather + compare-select) instead of the unpacked
    kernel's two broadcasts + 8·(compare-select + 2 gathers + 2 FMAs); the
    trilinear weighting happens once per corner in the epilogue after
    unpacking the bf16 pair with two bit-ops (measured v5e, 262k pts:
    5.1 → 3.2 ms)."""
    level = pl.program_id(1)
    xs, ys, zs = xp_ref[:], yp_ref[:], zp_ref[:]
    res_arr = res_ref[level]
    resf = res_arr.astype(jnp.float32)
    is_dense = dense_ref[level] > 0

    xl, yl, zl = xs * resf, ys * resf, zs * resf
    x0 = jnp.clip(jnp.floor(xl), 0, resf)
    y0 = jnp.clip(jnp.floor(yl), 0, resf)
    z0 = jnp.clip(jnp.floor(zl), 0, resf)
    wx, wy, wz = xl - x0, yl - y0, zl - z0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    z0i = z0.astype(jnp.int32)

    T = cfg.table_size
    n_windows = T // _WINDOW

    idxs, wgts = [], []
    for corner in range(8):
        dx, dy, dz = (corner >> 2) & 1, (corner >> 1) & 1, corner & 1
        ix = jnp.minimum(x0i + dx, res_arr)
        iy = jnp.minimum(y0i + dy, res_arr)
        iz = jnp.minimum(z0i + dz, res_arr)
        dense_idx = (ix * (res_arr + 1) + iy) * (res_arr + 1) + iz
        h = (ix.astype(jnp.uint32)
             ^ (iy.astype(jnp.uint32) * jnp.uint32(_PRIMES[1]))
             ^ (iz.astype(jnp.uint32) * jnp.uint32(_PRIMES[2])))
        h = jnp.bitwise_and(h, jnp.uint32(T - 1)).astype(jnp.int32)
        idxs.append(jnp.where(is_dense, dense_idx, h))
        cwx = wx if dx else 1.0 - wx
        cwy = wy if dy else 1.0 - wy
        cwz = wz if dz else 1.0 - wz
        wgts.append(cwx * cwy * cwz)

    wids = [jnp.right_shift(i, 7) for i in idxs]
    locals_ = [jnp.bitwise_and(i, _WINDOW - 1) for i in idxs]

    # bit pattern 0.0 == packed (0, 0) — a safe initial container
    collected = [jnp.zeros((sub, _WINDOW), jnp.float32) for _ in range(8)]
    for w in range(n_windows):
        row = jnp.broadcast_to(ptab_ref[level, pl.ds(w, 1), :],
                               (sub, _WINDOW))
        for c in range(8):
            g = jnp.take_along_axis(row, locals_[c], axis=1)
            collected[c] = jnp.where(wids[c] == w, g, collected[c])

    acc0 = jnp.zeros((sub, _WINDOW), jnp.float32)
    acc1 = jnp.zeros((sub, _WINDOW), jnp.float32)
    hi_mask = jnp.uint32(0xFFFF0000)
    for c in range(8):
        u = pltpu.bitcast(collected[c], jnp.uint32)
        f0 = pltpu.bitcast(jnp.bitwise_and(u, hi_mask), jnp.float32)
        f1 = pltpu.bitcast(jnp.left_shift(u, 16), jnp.float32)
        acc0 = acc0 + wgts[c] * f0
        acc1 = acc1 + wgts[c] * f1
    out_ref[0] = acc0
    out_ref[1] = acc1


def _kernel(res_ref, dense_ref, xp_ref, yp_ref, zp_ref, table_ref, out_ref, *,
            cfg: HashGridConfig, sub: int):
    """Grid: (point_tiles, L). Blocks: coords (SUB, 128); out (F, SUB, 128).
    res/dense are (L,) scalar-prefetch arrays in SMEM."""
    level = pl.program_id(1)
    xs = xp_ref[:]                       # (SUB, 128) in [0, 1]
    ys = yp_ref[:]
    zs = zp_ref[:]

    res_arr = res_ref[level]
    resf = res_arr.astype(jnp.float32)
    is_dense = dense_ref[level] > 0

    xl, yl, zl = xs * resf, ys * resf, zs * resf
    x0 = jnp.clip(jnp.floor(xl), 0, resf)
    y0 = jnp.clip(jnp.floor(yl), 0, resf)
    z0 = jnp.clip(jnp.floor(zl), 0, resf)
    wx, wy, wz = xl - x0, yl - y0, zl - z0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    z0i = z0.astype(jnp.int32)

    T = cfg.table_size
    n_windows = T // _WINDOW

    idxs = []
    wgts = []
    for corner in range(8):
        dx, dy, dz = (corner >> 2) & 1, (corner >> 1) & 1, corner & 1
        ix = jnp.minimum(x0i + dx, res_arr)
        iy = jnp.minimum(y0i + dy, res_arr)
        iz = jnp.minimum(z0i + dz, res_arr)
        dense_idx = (ix * (res_arr + 1) + iy) * (res_arr + 1) + iz
        h = (ix.astype(jnp.uint32)
             ^ (iy.astype(jnp.uint32) * jnp.uint32(_PRIMES[1]))
             ^ (iz.astype(jnp.uint32) * jnp.uint32(_PRIMES[2])))
        h = jnp.bitwise_and(h, jnp.uint32(T - 1)).astype(jnp.int32)
        idxs.append(jnp.where(is_dense, dense_idx, h))
        cwx = wx if dx else 1.0 - wx
        cwy = wy if dy else 1.0 - wy
        cwz = wz if dz else 1.0 - wz
        wgts.append(cwx * cwy * cwz)

    # split idx = wid·128 + local once per corner: the per-window test
    # collapses to one equality compare and the lane index needs no clip
    wids = [jnp.right_shift(i, 7) for i in idxs]
    locals_ = [jnp.bitwise_and(i, _WINDOW - 1) for i in idxs]

    F = cfg.n_features_per_level
    accs = [jnp.zeros((sub, _WINDOW), jnp.float32) for _ in range(F)]
    # static unroll over windows — T is small (≤ 8192 → ≤ 64 windows) so the
    # unrolled straight-line code pipelines on the VPU without fori_loop trip
    # overhead; window mask + weight select hoisted out of the feature loop
    for w in range(n_windows):
        rows = [jnp.broadcast_to(
            table_ref[level, pl.ds(w * _WINDOW, _WINDOW), f
                      ].reshape(1, _WINDOW), (sub, _WINDOW))
            for f in range(F)]
        for c in range(8):
            wsel = jnp.where(wids[c] == w, wgts[c], 0.0)
            for f in range(F):
                g = jnp.take_along_axis(rows[f], locals_[c], axis=1)
                accs[f] = accs[f] + wsel * g
    for f in range(F):
        out_ref[f] = accs[f]


@functools.partial(jax.jit, static_argnames=("cfg",))
def _hash_encode_pallas(x: jnp.ndarray, table: jnp.ndarray,
                        cfg: HashGridConfig) -> jnp.ndarray:
    sub = _fwd_sub(cfg)
    tile = sub * _WINDOW
    N = x.shape[0]
    pad = (-N) % tile
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    n_tiles = (N + pad) // tile
    # coordinate planes (tiles·SUB, 128)
    planes = xp.reshape(n_tiles * sub, _WINDOW, 3)
    xs, ys, zs = planes[..., 0], planes[..., 1], planes[..., 2]

    res_np = cfg.level_resolutions()
    res_arr = jnp.asarray(res_np, jnp.int32)
    dense_arr = jnp.asarray(
        [(int(r) + 1) ** 3 <= cfg.table_size for r in res_np], jnp.int32)

    packed = cfg.n_features_per_level == 2
    if packed:
        kern = functools.partial(_kernel_packed, cfg=cfg, sub=sub)
        tab_in = _pack_table_pairs(table).reshape(
            cfg.n_levels, cfg.table_size // _WINDOW, _WINDOW)
    else:
        kern = functools.partial(_kernel, cfg=cfg, sub=sub)
        tab_in = table
    out = pl.pallas_call(
        kern,
        grid=(n_tiles, cfg.n_levels),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # res (L,)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # dense (L,)
            pl.BlockSpec((sub, _WINDOW), lambda i, l: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub, _WINDOW), lambda i, l: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub, _WINDOW), lambda i, l: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # full table
        ],
        out_specs=pl.BlockSpec(
            (None, cfg.n_features_per_level, sub, _WINDOW),
            lambda i, l: (l, 0, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (cfg.n_levels, cfg.n_features_per_level, n_tiles * sub, _WINDOW),
            jnp.float32),
        # the unrolled window scan keeps ~sub·n_windows vregs of straight-line
        # temporaries on the Mosaic stack; the 16 MB default scoped limit is
        # too tight for T ≥ 4096 even at reduced tile sizes
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(res_arr, dense_arr, xs, ys, zs, tab_in)
    # (L, F, rows, 128) → (N, L·F); keeping the 128-lane dim minor avoids
    # tile-padding blowup (F=2 minor would pad 64×)
    out = out.reshape(cfg.n_levels, cfg.n_features_per_level,
                      n_tiles * tile)
    out = out.transpose(2, 0, 1).reshape(n_tiles * tile, cfg.out_dim)
    return out[:N]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def hash_encode_fast(x: jnp.ndarray, table: jnp.ndarray,
                     cfg: HashGridConfig) -> jnp.ndarray:
    """Pallas forward; XLA scatter backward (table grad only — positions are
    not trained on the ray-march path, dx ≡ 0)."""
    return _hash_encode_pallas(x, table, cfg)


def _fwd(x, table, cfg):
    return _hash_encode_pallas(x, table, cfg), (x, table)


# --------------------------------------------------------------------------
# Backward: fused Pallas one-hot-matmul scatter-add.
# --------------------------------------------------------------------------

_BWD_TILE = 8192     # points per grid step (16 sublanes × 128 lanes)


def _bwd_kernel(res_ref, dense_ref, xp_ref, yp_ref, zp_ref, g_ref, out_ref, *,
                cfg: HashGridConfig):
    """Grid: (L, point_chunks). Blocks: coords (1, CH) rows; g (F, 1, CH);
    out (128, F·LO) accumulated in-place across the chunks of one level.

    The scatter dL/dtable[idx] += w·g is a one-hot matmul: split each slot
    idx = lo·128 + hi; then out[hi, f·LO+lo] = Σ_p onehot_hi[p]·onehot_lo[p]
    ·w_p·g_pf — one (128 × CH)·(F·LO × CH)ᵀ MXU contraction per corner. All
    data rides in row layout (1, CH) so the one-hots are pure broadcast
    compares against a sublane iota — no vector reshapes (Mosaic cannot
    shape-cast (S, 128) → (CH, 1)), and nothing intermediate touches HBM
    (the XLA fallback materializes the one-hots, ~7× slower end-to-end)."""
    level = pl.program_id(0)
    chunk = pl.program_id(1)
    T = cfg.table_size
    LO = T // _WINDOW
    F = cfg.n_features_per_level
    CH = _BWD_TILE

    xs, ys, zs = xp_ref[:], yp_ref[:], zp_ref[:]          # (1, CH)
    res_arr = res_ref[level]
    resf = res_arr.astype(jnp.float32)
    is_dense = dense_ref[level] > 0

    xl, yl, zl = xs * resf, ys * resf, zs * resf
    x0 = jnp.clip(jnp.floor(xl), 0, resf)
    y0 = jnp.clip(jnp.floor(yl), 0, resf)
    z0 = jnp.clip(jnp.floor(zl), 0, resf)
    wx, wy, wz = xl - x0, yl - y0, zl - z0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    z0i = z0.astype(jnp.int32)

    sub_hi = jax.lax.broadcasted_iota(jnp.int32, (_WINDOW, 1), 0)
    sub_lo = jax.lax.broadcasted_iota(jnp.int32, (LO, 1), 0)
    gf = [g_ref[f] for f in range(F)]                     # (1, CH) each

    acc = jnp.zeros((_WINDOW, F * LO), jnp.float32)
    for corner in range(8):
        dx, dy, dz = (corner >> 2) & 1, (corner >> 1) & 1, corner & 1
        ix = jnp.minimum(x0i + dx, res_arr)
        iy = jnp.minimum(y0i + dy, res_arr)
        iz = jnp.minimum(z0i + dz, res_arr)
        dense_idx = (ix * (res_arr + 1) + iy) * (res_arr + 1) + iz
        h = (ix.astype(jnp.uint32)
             ^ (iy.astype(jnp.uint32) * jnp.uint32(_PRIMES[1]))
             ^ (iz.astype(jnp.uint32) * jnp.uint32(_PRIMES[2])))
        h = jnp.bitwise_and(h, jnp.uint32(T - 1)).astype(jnp.int32)
        idx = jnp.where(is_dense, dense_idx, h)           # (1, CH)
        cwx = wx if dx else 1.0 - wx
        cwy = wy if dy else 1.0 - wy
        cwz = wz if dz else 1.0 - wz
        w = cwx * cwy * cwz                                # (1, CH)

        hi_row = jnp.bitwise_and(idx, _WINDOW - 1)         # (1, CH)
        lo_row = jnp.right_shift(idx, 7)
        oh_hi = (sub_hi == hi_row).astype(jnp.bfloat16)    # (128, CH)
        oh_lo = (sub_lo == lo_row).astype(jnp.float32)     # (LO, CH)
        payload = jnp.concatenate(
            [(oh_lo * (w * g)).astype(jnp.bfloat16) for g in gf],
            axis=0)                                        # (F·LO, CH)
        # payload-first A·Bᵀ with the 128-wide one-hot as RHS puts the full
        # 128 lanes on the output N dim — measured 4.9 → 2.9 ms for the
        # whole backward vs the (oh_hi, payload) order (the r3 form left
        # the MXU at ~10% utilization; scripts/exp_hash_bwd.py). The tiny
        # (32, 128) result transposes on accumulate.
        d = jax.lax.dot_general(
            payload, oh_hi, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # (F·LO, 128)
        acc = acc + d.T

    @pl.when(chunk == 0)
    def _():
        out_ref[:] = acc

    @pl.when(chunk > 0)
    def _():
        out_ref[:] = out_ref[:] + acc


@functools.partial(jax.jit, static_argnames=("cfg",))
def _hash_bwd_pallas(x: jnp.ndarray, g: jnp.ndarray,
                     cfg: HashGridConfig) -> jnp.ndarray:
    L, T, F = cfg.n_levels, cfg.table_size, cfg.n_features_per_level
    LO = T // _WINDOW
    N = x.shape[0]
    pad = (-N) % _BWD_TILE
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    # zero-padded grads: padded points contribute nothing to the scatter
    gp = jnp.pad(g, ((0, pad), (0, 0)))
    n_chunks = (N + pad) // _BWD_TILE

    rows = xp.reshape(n_chunks, 1, _BWD_TILE, 3)
    xs, ys, zs = rows[..., 0], rows[..., 1], rows[..., 2]   # (chunks, 1, CH)
    g4 = gp.reshape(n_chunks, _BWD_TILE, L, F).transpose(2, 3, 0, 1)
    g4 = g4.reshape(L, F, n_chunks, 1, _BWD_TILE)

    res_np = cfg.level_resolutions()
    res_arr = jnp.asarray(res_np, jnp.int32)
    dense_arr = jnp.asarray(
        [(int(r) + 1) ** 3 <= cfg.table_size for r in res_np], jnp.int32)

    kern = functools.partial(_bwd_kernel, cfg=cfg)
    out = pl.pallas_call(
        kern,
        grid=(L, n_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((None, 1, _BWD_TILE), lambda l, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, _BWD_TILE), lambda l, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, _BWD_TILE), lambda l, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, F, None, 1, _BWD_TILE),
                         lambda l, c: (l, 0, c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, _WINDOW, F * LO), lambda l, c: (l, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, _WINDOW, F * LO), jnp.float32),
    )(res_arr, dense_arr, xs, ys, zs, g4)
    # out[l, hi, f·LO+lo] → dtable[l, lo·128+hi, f]
    return out.reshape(L, _WINDOW, F, LO).transpose(0, 3, 1, 2).reshape(L, T, F)


_BWD_CHUNK = 1 << 17


def _bwd_xla(cfg, res, g):
    """dL/dtable via one-hot matmuls on the MXU (XLA fallback path).

    XLA's scatter-add costs ~15 ns/update (≈0.5 s per frame here); instead
    split each table slot j = lo·128 + hi and compute, per level,

        dtable[lo·128+hi, f] = Σ_n  wg[n,f] · [hi_n = hi] · [lo_n = lo]
                             = (onehot_hi)ᵀ @ (onehot_lo ⊗ wg)

    — two cheap VPU compares and one (128 × n)·(n × lo·F) matmul per chunk,
    bf16 operands with f32 accumulation. ~20× faster than scatter.
    Position gradients are not needed on this path (ray positions are not
    trained): dx ≡ 0.
    """
    from tpunerf.fields.encoding import corner_indices_and_weights

    x, table = res
    L, T, F = table.shape
    N = x.shape[0]
    LO = T // _WINDOW

    idx8, w8 = corner_indices_and_weights(jax.lax.stop_gradient(x), cfg)
    # upstream grad per (level, point, feature)
    g_lnf = g.reshape(N, L, F).transpose(1, 0, 2)             # (L, N, F)
    # per-corner weighted grads, flattened corners into the point axis
    wg = (w8[..., None] * g_lnf[:, :, None, :]).reshape(L, N * 8, F)
    idx = idx8.reshape(L, N * 8)

    hi = (idx % _WINDOW).astype(jnp.int32)
    lo = (idx // _WINDOW).astype(jnp.int32)
    lane_hi = jnp.arange(_WINDOW, dtype=jnp.int32)
    lane_lo = jnp.arange(LO, dtype=jnp.int32)

    M = idx.shape[1]
    pad = (-M) % _BWD_CHUNK
    hi_p = jnp.pad(hi, ((0, 0), (0, pad)))
    lo_p = jnp.pad(lo, ((0, 0), (0, pad)))
    wg_p = jnp.pad(wg, ((0, 0), (0, pad), (0, 0)))  # zero grads on padding
    n_chunks = (M + pad) // _BWD_CHUNK

    def level_grad(args):
        hi_l, lo_l, wg_l = args

        def chunk_body(carry, chunk):
            h, l, w = chunk
            oh_hi = (h[:, None] == lane_hi[None, :]).astype(jnp.bfloat16)
            oh_lo = (l[:, None] == lane_lo[None, :]).astype(jnp.bfloat16)
            c = (oh_lo[:, :, None] * w[:, None, :].astype(jnp.bfloat16)
                 ).reshape(_BWD_CHUNK, LO * F)
            d = jax.lax.dot_general(
                oh_hi, c, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)            # (128, LO·F)
            return carry + d, None

        init = jnp.zeros((_WINDOW, LO * F), jnp.float32)
        d, _ = jax.lax.scan(
            chunk_body, init,
            (hi_l.reshape(n_chunks, _BWD_CHUNK),
             lo_l.reshape(n_chunks, _BWD_CHUNK),
             wg_l.reshape(n_chunks, _BWD_CHUNK, F)))
        # (hi, LO, F) → (LO·128+hi) = table slot
        return d.reshape(_WINDOW, LO, F).transpose(1, 0, 2).reshape(T, F)

    dtable = jax.lax.map(level_grad, (hi_p, lo_p, wg_p))
    return jnp.zeros_like(x), dtable


def _bwd(cfg, res, g):
    x, table = res
    if supports_pallas(cfg):
        dtable = _hash_bwd_pallas(jax.lax.stop_gradient(x),
                                  g.astype(jnp.float32), cfg)
        return jnp.zeros_like(x), dtable.astype(table.dtype)
    return _bwd_xla(cfg, res, g)


hash_encode_fast.defvjp(_fwd, _bwd)


def supports_pallas(cfg: HashGridConfig) -> bool:
    on_tpu = jax.default_backend() == "tpu"
    return (on_tpu and cfg.table_size <= 8192
            and cfg.table_size % _WINDOW == 0)


def hash_encode_auto(x: jnp.ndarray, table: jnp.ndarray,
                     cfg: HashGridConfig) -> jnp.ndarray:
    """TPU → Pallas kernel; other backends → jnp reference."""
    if supports_pallas(cfg):
        return hash_encode_fast(x, table, cfg)
    return hash_encode_ref(x, table, cfg)
