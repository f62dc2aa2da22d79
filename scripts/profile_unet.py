"""Piecewise timing of the SD-v1 UNet CFG forward (the SDS-step bottleneck).

The full SDS train step is render (~14 ms) + UNet CFG pass (~30 ms in-graph);
the UNet's arithmetic is ~0.7 TFLOP per CFG pass at batch 2, so 30 ms is
~25% of the measured 121 TFLOP/s matmul ceiling — this profiler splits the
forward by layer family to find where the rest goes. Run on the TPU:

    python -m scripts.profile_unet [--skip-bwd]

Timing method (same as bench.py / profile_render.py): the tunneled TPU
backend does not reliably block in `jax.block_until_ready`, so every region
is a `lax.scan` whose carry chains iterations, and the clock stops on a host
fetch of the final carry. Params are always passed as jit ARGUMENTS —
closing over them captures multi-GB constants and stalls lowering (see
bench.py docstring).
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp


def _param_mb(params) -> float:
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(params)) / 2 ** 20


def _scan_time(name, step, params, iters=50, reps=2, flops=None,
               weight_mb=None):
    """step(params, key, acc) -> scalar depending on the stage output."""

    @jax.jit
    def run(params, key):
        def body(carry, _):
            key, acc = carry
            key, sub = jax.random.split(key)
            return (key, step(params, sub, acc)), None

        (_, acc), _ = jax.lax.scan(
            body, (key, jnp.float32(0.0)), None, length=iters)
        return acc

    out = float(run(params, jax.random.key(0)))
    assert out == out, f"NaN in stage {name}"
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        _ = float(run(params, jax.random.key(r + 1)))
        best = min(best, (time.perf_counter() - t0) / iters)
    eff = f"  ({flops / best / 1e12:6.1f} TF/s)" if flops else ""
    wb = ""
    if weight_mb is not None:
        # HBM floor from the weight read alone (819 GB/s v5e)
        wb = f"  [w {weight_mb:7.1f} MB ≥{weight_mb / 819:5.2f} ms]"
    print(f"{name:<52s} {best*1e3:8.2f} ms{eff}{wb}", flush=True)
    return best


def main():
    from flax import linen as nn

    from tpunerf.guidance.unet import (Attention, ResnetBlock, Transformer2D,
                                       UNet2DCondition, UNetConfig)

    skip_bwd = "--skip-bwd" in sys.argv
    # --dtype f32|bf16: the guide.unet_dtype policy under profile (bf16 =
    # weights copy + compute dtype, guidance/unet.py:apply_unet_dtype)
    dtype_tag = "bf16" if "bf16" in sys.argv else "f32"
    B = 2                      # CFG batch
    cfg = UNetConfig.sd_v1()
    unet = UNet2DCondition(cfg)
    ctx = jnp.zeros((B, 77, cfg.cross_attention_dim))
    x0 = jnp.zeros((B, 64, 64, 4))
    t0_ = jnp.zeros((B,), jnp.int32)
    params = jax.jit(unet.init)(jax.random.key(0), x0, t0_, ctx)
    if dtype_tag == "bf16":
        from tpunerf.guidance.unet import apply_unet_dtype
        unet, params = apply_unet_dtype(unet, params, "bfloat16")
    blk_dt = jnp.bfloat16 if dtype_tag == "bf16" else jnp.float32

    def cast(p):
        return jax.tree_util.tree_map(lambda x: x.astype(blk_dt), p) \
            if dtype_tag == "bf16" else p

    print(f"backend={jax.default_backend()}  B={B}  dtype={dtype_tag}",
          flush=True)

    # ---- whole UNet ----------------------------------------------------
    def whole(p, sub, acc):
        x = jax.random.normal(sub, (B, 64, 64, 4))
        eps = unet.apply(p, x, t0_, ctx)
        return jnp.sum(jnp.abs(eps)) * 1e-10 + acc * 1e-20

    t_whole = _scan_time("UNet fwd (B=2, 64x64x4)", whole, params,
                         weight_mb=_param_mb(params))

    if not skip_bwd:
        def whole_bwd(p, sub, acc):
            x = jax.random.normal(sub, (B, 64, 64, 4))

            def loss(p):
                return jnp.sum(unet.apply(p, x, t0_, ctx) ** 2)

            l, g = jax.value_and_grad(loss)(p)
            gsum = sum(jnp.sum(jnp.abs(t))
                       for t in jax.tree_util.tree_leaves(g))
            return l * 1e-10 + gsum * 1e-20 + acc * 1e-20

        _scan_time("UNet fwd+bwd", whole_bwd, params, iters=20)

    # ---- layer families, at each resolution ---------------------------
    temb = jnp.zeros((B, 1280))
    resnets = [(64, 320, 320, 4 + 1), (32, 640, 640, 4 + 1),
               (16, 1280, 1280, 4 + 1), (8, 1280, 1280, 2 + 2 + 3)]
    total = 0.0
    for H, ci, co, n in resnets:
        blk = ResnetBlock(co, cfg.norm_num_groups, dtype=blk_dt)
        p = cast(jax.jit(blk.init)(jax.random.key(1),
                                   jnp.zeros((B, H, H, ci)), temb))
        fl = 2 * 2 * B * H * H * 9 * ci * co
        # fixed random input, serialised by an acc perturbation — per-iter
        # jax.random.normal of the (B,H,H,C) input costs more VPU time
        # than small blocks themselves and inflated every family row (r5)
        x0 = jax.random.normal(jax.random.key(2), (B, H, H, ci))

        def step(p, sub, acc, blk=blk, x0=x0):
            x = x0 * (1.0 + acc * 1e-20)
            return jnp.sum(jnp.abs(blk.apply(p, x, temb))
                           .astype(jnp.float32)) * 1e-10 + acc * 1e-20

        t = _scan_time(f"resnet {H}x{H} c{ci}->{co}  (x{n} in UNet)", step, p,
                       flops=fl, weight_mb=_param_mb(p))
        total += t * n

    transformers = [(64, 320, 2 + 3), (32, 640, 2 + 3), (16, 1280, 2 + 3),
                    (8, 1280, 1)]
    for H, ch, n in transformers:
        blk = Transformer2D(cfg.attention_num_heads, cfg.norm_num_groups,
                            dtype=blk_dt)
        p = cast(jax.jit(blk.init)(jax.random.key(1),
                                   jnp.zeros((B, H, H, ch)),
                                   jnp.zeros((B, 77,
                                              cfg.cross_attention_dim))))
        N = H * H
        fl = (2 * 2 * B * N * N * ch
              + 2 * B * N * ch * ch * 4
              + 2 * B * N * ch * ch * 2
              + 2 * B * 77 * 768 * ch * 2
              + 2 * 2 * B * N * 77 * ch
              + 2 * B * N * ch * (8 * ch + 4 * ch))

        x0 = jax.random.normal(jax.random.key(2), (B, H, H, ch))
        c0 = jax.random.normal(jax.random.key(3),
                               (B, 77, cfg.cross_attention_dim))

        def step(p, sub, acc, blk=blk, x0=x0, c0=c0):
            x = x0 * (1.0 + acc * 1e-20)
            return jnp.sum(jnp.abs(blk.apply(p, x, c0))
                           .astype(jnp.float32)) * 1e-10 + acc * 1e-20

        t = _scan_time(f"transformer2d {H}x{H} c{ch}  (x{n} in UNet)", step, p,
                       flops=fl, weight_mb=_param_mb(p))
        total += t * n

    # up-path resnets see concat'd skips (ci up to 2×co) — the family rows
    # above undercount them; the gap to the whole-UNet row is that + glue
    print(f"{'sum of family times x counts (approx)':<52s} "
          f"{total*1e3:8.2f} ms   vs whole {t_whole*1e3:.2f} ms", flush=True)

    # ---- isolated hot candidates ---------------------------------------
    attn = Attention(cfg.attention_num_heads)
    p_attn = jax.jit(attn.init)(jax.random.key(1), jnp.zeros((B, 4096, 320)))

    xa0 = jax.random.normal(jax.random.key(2), (B, 4096, 320))

    def self_attn_step(p, sub, acc):
        x = xa0 * (1.0 + acc * 1e-20)
        return jnp.sum(jnp.abs(attn.apply(p, x))) * 1e-10 + acc * 1e-20

    _scan_time("self-attn 4096 tokens c320 (flash path)", self_attn_step,
               p_attn)

    attn1024 = Attention(cfg.attention_num_heads)
    p_attn1024 = jax.jit(attn1024.init)(jax.random.key(1),
                                        jnp.zeros((B, 1024, 640)))

    xb0 = jax.random.normal(jax.random.key(2), (B, 1024, 640))

    def self_attn_1024(p, sub, acc):
        x = xb0 * (1.0 + acc * 1e-20)
        return jnp.sum(jnp.abs(attn1024.apply(p, x))) * 1e-10 + acc * 1e-20

    _scan_time("self-attn 1024 tokens c640 (naive path)", self_attn_1024,
               p_attn1024)

    for dt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        conv = nn.Conv(320, (3, 3), padding=1, dtype=dt)
        pc = jax.jit(conv.init)(jax.random.key(1),
                                jnp.zeros((B, 64, 64, 320), dt))
        fl = 2 * B * 64 * 64 * 9 * 320 * 320

        xc0 = jax.random.normal(jax.random.key(2), (B, 64, 64, 320)).astype(dt)

        def conv_step(pc, sub, acc, conv=conv, xc0=xc0):
            x = xc0 * (1.0 + acc * 1e-20).astype(xc0.dtype)
            return jnp.sum(jnp.abs(conv.apply(pc, x)).astype(jnp.float32)) \
                * 1e-10 + acc * 1e-20

        _scan_time(f"conv3x3 64x64 c320->320 {tag}", conv_step, pc, flops=fl)


if __name__ == "__main__":
    main()
