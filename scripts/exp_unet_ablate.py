"""Structural ablation of the SD-v1 UNet forward — in-graph family costs.

Isolated per-block microbenches proved unreliable for composing a floor
(weights re-read per scan iteration, 2× run-to-run noise on this tunnel);
this experiment instead times WHOLE UNet variants with families removed
and reads marginal in-graph costs off the diffs:

    attn-total  = t(full) − t(attn stripped from all down/up blocks)
    resnet ≈ remainder

Variants run under both dtype policies so the bf16 question ("why does
the bf16 weight copy only buy ~1 ms of a 20 ms pass?") gets a
per-family answer. Run on the TPU:

    python -m scripts.exp_unet_ablate [--skip-bf16]
"""
from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp


def _scan_time(name, apply_fn, params, iters=30, reps=3):
    @jax.jit
    def run(params, key):
        def body(carry, _):
            key, acc = carry
            key, sub = jax.random.split(key)
            return (key, apply_fn(params, sub, acc)), None

        (_, acc), _ = jax.lax.scan(
            body, (key, jnp.float32(0.0)), None, length=iters)
        return acc

    out = float(run(params, jax.random.key(0)))
    assert out == out, f"NaN in {name}"
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        float(run(params, jax.random.key(r + 1)))
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name:<46s} {best*1e3:8.2f} ms", flush=True)
    return best


def main():
    from tpunerf.guidance.unet import (UNet2DCondition, UNetConfig,
                                       apply_unet_dtype)

    B = 2
    ctx = jnp.zeros((B, 77, 768))
    t0_ = jnp.zeros((B,), jnp.int32)

    def build(cfg):
        unet = UNet2DCondition(cfg)
        params = jax.jit(unet.init)(jax.random.key(0),
                                    jnp.zeros((B, 64, 64, cfg.in_channels)),
                                    t0_, ctx)
        return unet, params

    def timed(tag, unet, params):
        def step(p, sub, acc):
            x = jax.random.normal(sub, (B, 64, 64, 4))
            eps = unet.apply(p, x, t0_, ctx)
            return jnp.sum(jnp.abs(eps)) * 1e-10 + acc * 1e-20

        return _scan_time(tag, step, params)

    results = {}
    variants = [
        ("full", UNetConfig.sd_v1()),
        # strip the 15 down/up cross-attn transformers (mid stays)
        ("no-downup-attn", dataclasses.replace(
            UNetConfig.sd_v1(),
            down_block_has_attn=(False,) * 4,
            up_block_has_attn=(False,) * 4)),
        # single resnet per down block (7 fewer resnets + 4 fewer attns)
        ("layers1", dataclasses.replace(UNetConfig.sd_v1(),
                                        layers_per_block=1)),
    ]
    dtypes = ["f32"] if "--skip-bf16" in sys.argv else ["f32", "bf16"]
    import gc
    for tag, cfg in variants:
        # one variant resident at a time — two 3.4 GB f32 UNets plus a bf16
        # copy OOM the 16 GB chip
        unet, params = build(cfg)
        results[f"{tag}/f32"] = timed(f"{tag} f32", unet, params)
        if "bf16" in dtypes:
            u16, p16 = apply_unet_dtype(unet, params, "bfloat16")
            del params
            gc.collect()
            results[f"{tag}/bf16"] = timed(f"{tag} bf16", u16, p16)
            del u16, p16
        else:
            del params
        gc.collect()
        jax.clear_caches()

    for dt in dtypes:
        full = results[f"full/{dt}"]
        noat = results[f"no-downup-attn/{dt}"]
        print(f"[{dt}] 15 down/up transformers in-graph: "
              f"{(full - noat) * 1e3:.2f} ms "
              f"({(full - noat) / full * 100:.0f}% of the pass)", flush=True)


if __name__ == "__main__":
    main()
