"""Experiment: hash-grid backward scatter — where do the 4.4 ms go?

Baseline `kernels/hashgrid.py::_hash_bwd_pallas` ≈ 4.4 ms for 262k points
(L=12, T=2048, F=2). Cost model: per (corner, level, chunk) the kernel
builds one-hots on the VPU (~2.3 ms est. total) and contracts on the MXU
(~2.1 ms est. at the structural 25% N-utilization — output tile T·F=4096
vs the MXU's 16384). VPU and MXU are independent units: if the measured
time ≈ their SUM, the kernel is serializing them and software-pipelining
the corner loop is worth ~2 ms; if ≈ max, the floor is real.

Variants measured:
  vpu-only — dots replaced by a cheap reduction of the one-hots
  mxu-only — one-hots replaced by cheap constant ramps (same dot shapes)
  tile=N   — baseline at different chunk sizes

Run on TPU:  python -m scripts.exp_hash_bwd
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpunerf.fields.encoding import HashGridConfig, _PRIMES
from tpunerf.kernels.hashgrid import _WINDOW, _hash_bwd_pallas


def _corner_data(res_arr, is_dense, xs, ys, zs, corner, T):
    resf = res_arr.astype(jnp.float32)
    xl, yl, zl = xs * resf, ys * resf, zs * resf
    x0 = jnp.clip(jnp.floor(xl), 0, resf)
    y0 = jnp.clip(jnp.floor(yl), 0, resf)
    z0 = jnp.clip(jnp.floor(zl), 0, resf)
    wx, wy, wz = xl - x0, yl - y0, zl - z0
    dx, dy, dz = (corner >> 2) & 1, (corner >> 1) & 1, corner & 1
    ix = jnp.minimum(x0.astype(jnp.int32) + dx, res_arr)
    iy = jnp.minimum(y0.astype(jnp.int32) + dy, res_arr)
    iz = jnp.minimum(z0.astype(jnp.int32) + dz, res_arr)
    dense_idx = (ix * (res_arr + 1) + iy) * (res_arr + 1) + iz
    h = (ix.astype(jnp.uint32)
         ^ (iy.astype(jnp.uint32) * jnp.uint32(_PRIMES[1]))
         ^ (iz.astype(jnp.uint32) * jnp.uint32(_PRIMES[2])))
    h = jnp.bitwise_and(h, jnp.uint32(T - 1)).astype(jnp.int32)
    idx = jnp.where(is_dense, dense_idx, h)
    cwx = wx if dx else 1.0 - wx
    cwy = wy if dy else 1.0 - wy
    cwz = wz if dz else 1.0 - wz
    return idx, cwx * cwy * cwz


def _make_kernel(cfg: HashGridConfig, mode: str):
    def kernel(res_ref, dense_ref, xp_ref, yp_ref, zp_ref, g_ref, out_ref):
        level = pl.program_id(0)
        chunk = pl.program_id(1)
        T = cfg.table_size
        LO = T // _WINDOW
        F = cfg.n_features_per_level
        CH = xp_ref.shape[-1]

        xs, ys, zs = xp_ref[:], yp_ref[:], zp_ref[:]        # (1, CH)
        res_arr = res_ref[level]
        is_dense = dense_ref[level] > 0
        sub_hi = jax.lax.broadcasted_iota(jnp.int32, (_WINDOW, 1), 0)
        sub_lo = jax.lax.broadcasted_iota(jnp.int32, (LO, 1), 0)
        gf = [g_ref[f] for f in range(F)]

        acc = jnp.zeros((_WINDOW, F * LO), jnp.float32)
        for corner in range(8):
            idx, w = _corner_data(res_arr, is_dense, xs, ys, zs, corner, T)
            hi_row = jnp.bitwise_and(idx, _WINDOW - 1)
            lo_row = jnp.right_shift(idx, 7)
            if mode == "mxu":
                # constant-ish operands, same dot shapes, ~zero VPU cost
                oh_hi = jnp.full((_WINDOW, CH), 0.001, jnp.bfloat16)
                payload = jnp.full((F * LO, CH), 0.001, jnp.bfloat16)
                payload = payload * (w[0, 0] * 0 + 1).astype(jnp.bfloat16)
            else:
                oh_hi = (sub_hi == hi_row).astype(jnp.bfloat16)
                oh_lo = (sub_lo == lo_row).astype(jnp.float32)
                payload = jnp.concatenate(
                    [(oh_lo * (w * g)).astype(jnp.bfloat16) for g in gf],
                    axis=0)
            if mode == "vpu":
                # consume the one-hots without the MXU
                acc = acc + jnp.sum(oh_hi.astype(jnp.float32)) * 1e-9 \
                    + jnp.sum(payload.astype(jnp.float32)[:1, :1])
            elif mode == "dot_swap":
                # (32, CH)·(128, CH)ᵀ → (32, 128); transposed-out accumulate
                d = jax.lax.dot_general(
                    payload, oh_hi, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = acc + d.T
            elif mode == "dot_tp":
                # explicit payload transpose → canonical (M,K)@(K,N)
                d = jax.lax.dot_general(
                    oh_hi, payload.T, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = acc + d
            elif mode == "dot_toh":
                # transpose oh_hi → canonical with N=128 full lanes
                d = jax.lax.dot_general(
                    payload, oh_hi.T, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = acc + d.T
            else:
                acc = acc + jax.lax.dot_general(
                    oh_hi, payload, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)

        @pl.when(chunk == 0)
        def _():
            out_ref[:] = acc

        @pl.when(chunk > 0)
        def _():
            out_ref[:] = out_ref[:] + acc

    return kernel


@functools.partial(jax.jit, static_argnames=("cfg", "mode", "tile"))
def hash_bwd_variant(x, g, cfg, mode="full", tile=8192):
    L, T, F = cfg.n_levels, cfg.table_size, cfg.n_features_per_level
    LO = T // _WINDOW
    N = x.shape[0]
    pad = (-N) % tile
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    gp = jnp.pad(g, ((0, pad), (0, 0)))
    n_chunks = (N + pad) // tile

    rows = xp.reshape(n_chunks, 1, tile, 3)
    xs, ys, zs = rows[..., 0], rows[..., 1], rows[..., 2]
    g4 = gp.reshape(n_chunks, tile, L, F).transpose(2, 3, 0, 1)
    g4 = g4.reshape(L, F, n_chunks, 1, tile)

    res_np = cfg.level_resolutions()
    res_arr = jnp.asarray(res_np, jnp.int32)
    dense_arr = jnp.asarray(
        [(int(r) + 1) ** 3 <= cfg.table_size for r in res_np], jnp.int32)

    out = pl.pallas_call(
        _make_kernel(cfg, mode),
        grid=(L, n_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((None, 1, tile), lambda l, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, tile), lambda l, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, tile), lambda l, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, F, None, 1, tile),
                         lambda l, c: (l, 0, c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, _WINDOW, F * LO), lambda l, c: (l, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, _WINDOW, F * LO), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(res_arr, dense_arr, xs, ys, zs, g4)
    return out.reshape(L, _WINDOW, F, LO).transpose(0, 3, 1, 2).reshape(L, T, F)


def _scan_time(fn, iters=50):
    @jax.jit
    def run(c0):
        def body(c, _):
            out = fn(c)
            return c + jnp.sum(out) * 1e-20, None
        c, _ = jax.lax.scan(body, c0, None, length=iters)
        return c
    float(run(jnp.float32(0)))
    t0 = time.perf_counter()
    float(run(jnp.float32(1e-9)))
    return (time.perf_counter() - t0) / iters


def main():
    cfg = HashGridConfig()
    print(f"L={cfg.n_levels} T={cfg.table_size} F={cfg.n_features_per_level}")
    rng = np.random.default_rng(0)
    N = 262144
    x = jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32))
    g = jnp.asarray(rng.normal(0, 1, (N, cfg.out_dim)).astype(np.float32))

    ref = _hash_bwd_pallas(x, g, cfg)
    t0 = _scan_time(lambda c: _hash_bwd_pallas(x + c * 0, g, cfg))
    print(f"baseline kernel:        {t0*1e3:.3f} ms")

    out = hash_bwd_variant(x, g, cfg, "full", 8192)
    err = float(jnp.max(jnp.abs(out - ref)))
    t = _scan_time(lambda c: hash_bwd_variant(x + c * 0, g, cfg, "full", 8192))
    print(f"variant full tile=8192: {t*1e3:.3f} ms  max|err|={err:.2e}")

    for mode in ("vpu", "mxu", "dot_swap", "dot_tp", "dot_toh"):
        try:
            out = hash_bwd_variant(x, g, cfg, mode, 8192)
            err = (float(jnp.max(jnp.abs(out - ref)))
                   if mode.startswith("dot") else float("nan"))
            t = _scan_time(
                lambda c: hash_bwd_variant(x + c * 0, g, cfg, mode, 8192))
            print(f"variant {mode}:       {t*1e3:.3f} ms  max|err|={err:.2e}")
        except Exception as e:
            print(f"{mode} failed: {type(e).__name__}: {str(e)[:200]}")

    for tile in (16384, 32768):
        try:
            out = hash_bwd_variant(x, g, cfg, "full", tile)
            err = float(jnp.max(jnp.abs(out - ref)))
            t = _scan_time(
                lambda c: hash_bwd_variant(x + c * 0, g, cfg, "full", tile))
            print(f"variant full tile={tile}: {t*1e3:.3f} ms  "
                  f"max|err|={err:.2e}")
        except Exception as e:
            print(f"tile={tile} failed: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
