"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.json): rays/s/chip, forward+backward, at a 64×64
latent render of the default latent-NeRF field (12-level hash grid, T=2048
per level — VMEM-resident for the Pallas kernels, fields/encoding.py — with
128 stratified samples → 64 compacted per ray, occupancy-pruned, 4-channel
latent head). Runs on whatever platform JAX selects (TPU under the driver).

Timing method: the remote-tunneled TPU backend does not reliably block in
`jax.block_until_ready` (measured: 20 dispatched UNet forwards "complete" in
10 ms), so every measured region is a `lax.scan` whose carry chains one
iteration into the next — the device must execute serially — and the clock
stops on a host fetch of the final carry. Params are passed as jit arguments
(closing over them captures multi-GB constants and stalls lowering), and the
mock UNet weights are random, not zeros (all-zero weights measurably hit
fast paths).

Iteration counts amortize the tunneled backend's fixed ~24 ms per-dispatch
cost (measured: a mul-only 30-iter scan reads 0.80 ms/iter, 100-iter reads
0.25 ms/iter — same body); 100/30 iters keep that pollution ≤ 3%.

vs_baseline: ratio against the best previous round (BENCH_r*.json in repo
root); 1.0 when no prior record exists (the reference publishes no numbers —
BASELINE.md §1).
"""
from __future__ import annotations

import glob
import json
import time

import jax
import jax.numpy as jnp


def _timed_scan(step_fn, params, key, iters):
    """Run `iters` serially-dependent iterations of step_fn inside one jit;
    returns seconds/iter measured to a host fetch of the chained carry."""

    @jax.jit
    def run(params, key):
        def body(carry, _):
            key, acc = carry
            key, sub = jax.random.split(key)
            loss = step_fn(params, sub, acc)
            return (key, loss), None

        (key, acc), _ = jax.lax.scan(
            body, (key, jnp.float32(0.0)), None, length=iters)
        return acc

    acc = float(run(params, key))            # compile + warmup (host fetch)
    assert acc == acc, "NaN in benchmark loss"
    t0 = time.perf_counter()
    acc = float(run(params, jax.random.fold_in(key, 1)))
    dt = time.perf_counter() - t0
    assert acc == acc, "NaN in benchmark loss"
    return dt / iters


def main() -> None:
    from tpunerf.core.views import ViewSamplerConfig, rand_poses
    from tpunerf.fields.scene import LatentNeRFScene

    H = W = 64
    B = 1
    scene = LatentNeRFScene.create(nerf_type="latent", tiny=False,
                                   num_samples=128, num_compacted=64,
                                   train_grid_size=H)
    key = jax.random.key(0)
    params = scene.init_params(key)
    views = rand_poses(key, B, ViewSamplerConfig())

    # warm the occupancy grid so pruning reflects steady-state training
    upd = jax.jit(scene.update_occupancy)
    for i in range(4):
        params = upd(params, jax.random.fold_in(key, i))

    def render_step(p, sub, acc):
        def loss_fn(p):
            out = scene.render_train(p, views, sub, jnp.asarray(0))
            return jnp.sum(out["image"] ** 2) + out["sparsity_loss"]

        loss, grads = jax.value_and_grad(loss_fn)(p)
        # consume the grads so backward can't be dead-code-eliminated;
        # chain acc so iterations serialize
        gsum = sum(jnp.sum(jnp.abs(g)) for g in jax.tree_util.tree_leaves(
            grads))
        return loss + 1e-20 * gsum + 1e-20 * acc

    sec = _timed_scan(render_step, params, key, iters=100)
    rays_per_s = B * H * W / sec

    # ---- secondary metric: full SDS train-step iters/s ----------------
    # render fwd+bwd + full-size (859M-param) SD-v1 UNet CFG pass with the
    # real architecture (random weights — compute cost is identical).
    sds_iters_per_s = None
    try:
        from tpunerf.guidance.unet import UNet2DCondition, UNetConfig
        from tpunerf.guidance import sds as sds_lib

        ucfg = UNetConfig.sd_v1()
        unet = UNet2DCondition(ucfg)
        ctx = jnp.zeros((2 * B, 77, ucfg.cross_attention_dim))
        # real init (not zeros / ad-hoc random): all-zero or degenerate
        # weights produce zero activations, which hit measurably unreal
        # fast paths on this backend
        uparams = jax.jit(unet.init)(jax.random.key(0),
                                     jnp.zeros((2 * B, H, W, 4)),
                                     jnp.zeros((2 * B,), jnp.int32), ctx)
        from tpunerf.guidance.schedulers import NoiseSchedule
        nsched = NoiseSchedule.scaled_linear()

        def sds_step(p, sub, acc):
            prm, up = p

            def loss_fn(prm):
                out = scene.render_train(prm, views, sub, jnp.asarray(0))
                lat = out["image"]
                return sds_lib.sds_loss(
                    lambda x, t, c: unet.apply(up, x, t, c),
                    nsched, sub, lat, ctx, guidance_scale=100.0) \
                    + 5e-4 * out["sparsity_loss"]

            loss, grads = jax.value_and_grad(loss_fn)(prm)
            gsum = sum(jnp.sum(jnp.abs(g))
                       for g in jax.tree_util.tree_leaves(grads))
            return loss + 1e-20 * gsum + 1e-20 * acc

        sec_sds = _timed_scan(sds_step, (params, uparams), key,
                              iters=30)
        sds_iters_per_s = 1.0 / sec_sds
    except Exception:
        pass

    prev_best = 0.0
    for f in glob.glob("BENCH_r*.json"):
        try:
            rec = json.load(open(f))
            if rec.get("unit") == "rays/s":
                prev_best = max(prev_best, float(rec.get("value", 0.0)))
        except Exception:
            pass
    vs_baseline = rays_per_s / prev_best if prev_best > 0 else 1.0

    out = {"metric": "latent_nerf_rays_per_s_fwd_bwd_64x64",
           "value": round(rays_per_s, 1), "unit": "rays/s",
           "vs_baseline": round(vs_baseline, 3),
           # method record: per-iter time amortizes a fixed ~24 ms dispatch
           # cost, so the iteration count is part of the measurement —
           # r01 was taken at 30 iters, r02+ at 100 (ADVICE.md)
           "scan_iters": 100}
    if sds_iters_per_s is not None:
        out["sds_iters_per_s_full_unet"] = round(sds_iters_per_s, 2)
        out["sds_scan_iters"] = 30
    print(json.dumps(out))


if __name__ == "__main__":
    main()
