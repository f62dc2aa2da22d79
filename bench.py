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


def mesh_metrics() -> dict:
    """Mesh-raster path timings (VERDICT r2 task 3): the numbers claimed in
    kernels/rasterize.py comments become reproducible records here so a
    kernel regression shows up in BENCH_r*.json. Sphere mesh (3968 faces),
    same camera conventions as the golden tests."""
    from tpunerf.core import camera as cam
    from tpunerf.kernels import rasterize as rast
    from tpunerf.meshrep.shapes import uv_sphere

    mesh = uv_sphere()
    verts = jnp.asarray(mesh.vertices) * 0.6
    faces = jnp.asarray(mesh.faces)
    tr = cam.camera_transform_from_view(1.0, 0.7, 1.3)
    fv_cam, fv_img, _ = cam.prepare_vertices(
        verts, faces, cam.perspective_projection(), tr)
    fv_z = fv_cam[..., 2]
    F = int(faces.shape[0])
    feats = jax.random.normal(jax.random.key(1), (F, 3, 4))

    def timed(step_fn, iters):
        @jax.jit
        def run(fv, key):
            def body(carry, _):
                key, acc = carry
                key, sub = jax.random.split(key)
                return (key, step_fn(fv, acc)), None

            (_, acc), _ = jax.lax.scan(
                body, (key, jnp.float32(0.0)), None, length=iters)
            return acc

        key = jax.random.key(0)
        acc = float(run(fv_img, key))
        assert acc == acc
        t0 = time.perf_counter()
        float(run(fv_img, jax.random.fold_in(key, 1)))
        return (time.perf_counter() - t0) / iters

    def hard_fwd_bwd(hw):
        def step(fv, acc):
            def loss(fv):
                img, _ = rast.rasterize(hw, hw, fv_z[None], fv[None],
                                        feats[None])
                return jnp.sum(img ** 2)

            l, g = jax.value_and_grad(loss)(fv + acc * 1e-20)
            return l + 1e-20 * jnp.sum(jnp.abs(g))
        return step

    def soft_fwd_bwd(hw):
        def step(fv, acc):
            def loss(fv):
                return jnp.sum(
                    rast.soft_silhouette(hw, hw, fv[None]) ** 2)

            l, g = jax.value_and_grad(loss)(fv + acc * 1e-20)
            return l + 1e-20 * jnp.sum(jnp.abs(g))
        return step

    return {
        "mesh_faces": F,
        "rasterize_64_fwd_bwd_ms": round(
            timed(hard_fwd_bwd(64), 100) * 1e3, 3),
        "rasterize_512_fwd_bwd_ms": round(
            timed(hard_fwd_bwd(512), 50) * 1e3, 3),
        "soft_silhouette_512_fwd_bwd_ms": round(
            timed(soft_fwd_bwd(512), 30) * 1e3, 3),
    }


def main() -> None:
    from tpunerf.core.views import ViewSamplerConfig, rand_poses
    from tpunerf.fields.scene import LatentNeRFScene

    H = W = 64
    scene = LatentNeRFScene.create(nerf_type="latent", tiny=False,
                                   num_samples=128, num_compacted=64,
                                   train_grid_size=H)
    key = jax.random.key(0)
    params = scene.init_params(key)

    # Warm the occupancy grid to EMA steady state: from the optimistic
    # init (grid=1.0, decay 0.95) empty space needs ~90 updates to decay
    # below the 0.01 threshold. r1-r3 warmed only 4 updates, i.e. measured
    # a 100%-occupied grid — the training-time steady state is the blob
    # the density init actually occupies, which the r4 sparse window
    # sweep exploits. Both states are recorded: `value` = steady state
    # (the rate a real run sustains), `rays_per_s_occ_full` = the old
    # fully-occupied protocol (r3-comparable).
    upd = jax.jit(scene.update_occupancy)
    for i in range(4):
        params = upd(params, jax.random.fold_in(key, i))
    params_full = params                    # 100%-occupied grid (r3 proto)
    for i in range(4, 100):
        params = upd(params, jax.random.fold_in(key, i))
    occ_frac = float(jnp.mean(
        (params["occ_grid"] > scene.occ_cfg.density_threshold)
        .astype(jnp.float32)))

    def measure_rays(B, iters, prm):
        views = rand_poses(key, B, ViewSamplerConfig())

        def render_step(p, sub, acc):
            def loss_fn(p):
                out = scene.render_train(p, views, sub, jnp.asarray(0))
                return jnp.sum(out["image"] ** 2) + out["sparsity_loss"]

            loss, grads = jax.value_and_grad(loss_fn)(p)
            # consume the grads so backward can't be dead-code-eliminated;
            # chain acc so iterations serialize
            gsum = sum(jnp.sum(jnp.abs(g))
                       for g in jax.tree_util.tree_leaves(grads))
            return loss + 1e-20 * gsum + 1e-20 * acc

        sec = _timed_scan(render_step, prm, key, iters=iters)
        return B * H * W / sec

    # batch-1 rate (the r01/r02 measurement) + batched B=8. Measured r3:
    # B=8 is ~14% SLOWER per ray than B=1 on this chip (bigger working set
    # beats the amortized dispatch), so the headline is the best of the
    # two with the winning batch recorded — the achievable per-chip rate
    # the BASELINE targets.
    rays_per_s_b1 = measure_rays(1, 100, params)
    rays_per_s_b8 = measure_rays(8, 25, params)
    rays_per_s_occ_full = measure_rays(1, 100, params_full)
    rays_per_s = max(rays_per_s_b1, rays_per_s_b8)
    best_batch = 1 if rays_per_s_b1 >= rays_per_s_b8 else 8
    B = 1   # SDS secondary metric stays batch-1 (r01/r02-comparable)
    views = rand_poses(key, B, ViewSamplerConfig())

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
        # the production default policy (guide.unet_dtype="auto" → bf16
        # weights+compute on TPU): frozen UNet, so the bf16 copy halves
        # the ~3.4 GB/step weight HBM traffic (r5; BASELINE.md §3 carries
        # the f32-vs-bf16 comparison)
        from tpunerf.guidance.unet import apply_unet_dtype
        unet, uparams = apply_unet_dtype(unet, uparams, "auto")
        sds_unet_dtype = jnp.dtype(unet.config.dtype).name
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
            # the driver wraps the printed JSON under "parsed"
            rec = rec.get("parsed", rec)
            if rec.get("unit") == "rays/s":
                prev_best = max(prev_best, float(rec.get("value", 0.0)))
        except Exception:
            pass
    vs_baseline = rays_per_s / prev_best if prev_best > 0 else 1.0

    out = {"metric": "latent_nerf_rays_per_s_fwd_bwd_64x64",
           "value": round(rays_per_s, 1), "unit": "rays/s",
           "vs_baseline": round(vs_baseline, 3),
           # method record: r01/r02 measured batch=1; r03+ measures batch
           # 1 and 8 and reports the best (batch recorded). Per-iter time
           # amortizes a fixed ~24 ms dispatch cost, so iteration counts
           # are part of the measurement: b1 at 100 iters, b8 at 25.
           "batch": best_batch,
           "scan_iters": 100 if best_batch == 1 else 25,
           "rays_per_s_b1": round(rays_per_s_b1, 1),
           "rays_per_s_b8": round(rays_per_s_b8, 1),
           # r3-protocol point (grid warmed only 4 EMA updates → 100%
           # occupied: sparse window sweep disabled, compaction saturated)
           "rays_per_s_occ_full": round(rays_per_s_occ_full, 1),
           "occ_frac_steady": round(occ_frac, 4),
           "occ_warm_updates": 100}
    if sds_iters_per_s is not None:
        out["sds_iters_per_s_full_unet"] = round(sds_iters_per_s, 2)
        out["sds_scan_iters"] = 30
        out["sds_unet_dtype"] = sds_unet_dtype
    try:
        out.update(mesh_metrics())
    except Exception as e:
        import sys
        print(f"mesh_metrics failed: {type(e).__name__}: {e}",
              file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
