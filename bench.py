"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.json): rays/s/chip, forward+backward, at a 64×64
latent render of the full-size latent-NeRF field (16-level 2^19 hash grid,
128 stratified samples → 64 compacted per ray, occupancy-pruned, 4-channel
latent head). Runs on whatever platform JAX selects (TPU under the driver).

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

    @jax.jit
    def fwd_bwd(params, key):
        def loss_fn(p):
            out = scene.render_train(p, views, key, jnp.asarray(0))
            return jnp.sum(out["image"] ** 2) + out["sparsity_loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        return loss, grads

    # compile + warmup
    loss, grads = fwd_bwd(params, key)
    jax.block_until_ready((loss, grads))

    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        loss, grads = fwd_bwd(params, jax.random.fold_in(key, i))
    jax.block_until_ready((loss, grads))
    dt = time.perf_counter() - t0

    rays_per_s = B * H * W * iters / dt

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
        shapes_ = jax.eval_shape(
            lambda: unet.init(jax.random.key(0),
                              jnp.zeros((2 * B, H, W, 4)),
                              jnp.zeros((2 * B,), jnp.int32), ctx))
        uparams = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes_)
        from tpunerf.guidance.schedulers import NoiseSchedule
        nsched = NoiseSchedule.scaled_linear()

        @jax.jit
        def sds_step(params, key):
            def loss_fn(p):
                out = scene.render_train(p, views, key, jnp.asarray(0))
                lat = out["image"]
                return sds_lib.sds_loss(
                    lambda x, t, c: unet.apply(uparams, x, t, c),
                    nsched, key, lat, ctx, guidance_scale=100.0) \
                    + 5e-4 * out["sparsity_loss"]

            return jax.value_and_grad(loss_fn)(params)

        loss, grads = sds_step(params, key)
        jax.block_until_ready((loss, grads))
        n_sds = 10
        t0 = time.perf_counter()
        for i in range(n_sds):
            loss, grads = sds_step(params, jax.random.fold_in(key, i))
        jax.block_until_ready((loss, grads))
        sds_iters_per_s = n_sds / (time.perf_counter() - t0)
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
           "vs_baseline": round(vs_baseline, 3)}
    if sds_iters_per_s is not None:
        out["sds_iters_per_s_full_unet"] = round(sds_iters_per_s, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
