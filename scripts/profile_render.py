"""Piecewise timing of the volumetric render fwd+bwd (the bench headline).

Times each stage of the hot path separately on the current backend so kernel
work targets the real bottleneck (SURVEY.md §5.1 tooling). Run:
    python -m scripts.profile_render
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def _timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:<44s} {dt:8.2f} ms")
    return dt


def main():
    from tpunerf.core.views import ViewSamplerConfig, rand_poses
    from tpunerf.fields.scene import LatentNeRFScene
    from tpunerf.fields import occupancy as occ_lib
    from tpunerf.fields import volume_render as vr

    H = W = 64
    B = 1
    scene = LatentNeRFScene.create(nerf_type="latent", tiny=False,
                                   num_samples=128, num_compacted=64,
                                   train_grid_size=H)
    key = jax.random.key(0)
    params = scene.init_params(key)
    views = rand_poses(key, B, ViewSamplerConfig())
    upd = jax.jit(scene.update_occupancy)
    for i in range(4):
        params = upd(params, jax.random.fold_in(key, i))

    N = B * H * W * scene.march.num_compacted          # field points
    print(f"backend={jax.default_backend()}  rays={B*H*W}  "
          f"S={scene.march.num_samples} K={scene.march.num_compacted}  "
          f"field pts={N}")

    # ---- full fwd / fwd+bwd ------------------------------------------
    @jax.jit
    def full_fwd(params, key):
        out = scene.render_train(params, views, key, jnp.asarray(0))
        return out["image"], out["sparsity_loss"]

    @jax.jit
    def full_fwd_bwd(params, key):
        def loss_fn(p):
            out = scene.render_train(p, views, key, jnp.asarray(0))
            return jnp.sum(out["image"] ** 2) + out["sparsity_loss"]
        return jax.value_and_grad(loss_fn)(params)

    _timeit("full render fwd", full_fwd, params, key)
    _timeit("full render fwd+bwd", full_fwd_bwd, params, key)

    # ---- ray generation ----------------------------------------------
    gen = jax.jit(lambda: vr.generate_rays(
        views.theta, views.phi, views.radius, H, W, fovy=scene.fovy,
        bound=scene.march.bound))
    _timeit("generate_rays", gen)
    rays = gen()

    # ---- sampling + occupancy + compaction (no field) ----------------
    S, K = scene.march.num_samples, scene.march.num_compacted

    @jax.jit
    def sample_compact(params, key):
        u = (jnp.arange(S, dtype=jnp.float32) + 0.5) / S
        u = jnp.broadcast_to(u, (B, H * W, S))
        u = u + (jax.random.uniform(key, u.shape) - 0.5) / S
        t = rays.near[..., None] + (rays.far - rays.near)[..., None] * u
        xyz = rays.origins[..., None, :] + rays.dirs[..., None, :] * t[..., None]
        xyz = jnp.clip(xyz, -1.0, 1.0)
        occ = occ_lib.occupied(params["occ_grid"], xyz, scene.occ_cfg)
        gi, valid = occ_lib.compact_samples(occ, K)
        t_k = jnp.take_along_axis(t, gi, axis=-1)
        xyz_k = jnp.take_along_axis(xyz, gi[..., None], axis=-2)
        return t_k, xyz_k, valid

    _timeit("sample+occ-lookup+compact+gather", sample_compact, params, key)
    t_k, xyz_k, valid = jax.jit(sample_compact)(params, key)
    flat_x = xyz_k.reshape(-1, 3)
    flat_d = jnp.broadcast_to(rays.dirs[..., None, :],
                              xyz_k.shape).reshape(-1, 3)

    # ---- compaction pieces -------------------------------------------
    @jax.jit
    def occ_only(params):
        u = (jnp.arange(S, dtype=jnp.float32) + 0.5) / S
        t = rays.near[..., None] + (rays.far - rays.near)[..., None] * u
        xyz = rays.origins[..., None, :] + rays.dirs[..., None, :] * t[..., None]
        return occ_lib.occupied(params["occ_grid"], xyz, scene.occ_cfg)

    occ = occ_only(params)
    _timeit("  occ lookup alone", occ_only, params)
    _timeit("  compact_samples (argsort) alone",
            jax.jit(lambda o: occ_lib.compact_samples(o, K)), occ)

    # ---- field pieces -------------------------------------------------
    from tpunerf.kernels.hashgrid import hash_encode_auto, supports_pallas
    gcfg = scene.field.config.grid
    print(f"pallas hash path: {supports_pallas(gcfg)}  "
          f"(L={gcfg.n_levels} T={gcfg.table_size} F={gcfg.n_features_per_level})")
    table = params["field"]["params"]["hash_table"]
    x01 = jnp.clip((flat_x + 1.0) / 2.0, 0.0, 1.0)

    _timeit("hash encode fwd", jax.jit(
        lambda x, t: hash_encode_auto(x, t, gcfg)), x01, table)

    @jax.jit
    def hash_fwd_bwd(x, t):
        return jax.grad(lambda tt: jnp.sum(
            hash_encode_auto(x, tt, gcfg) ** 2))(t)
    _timeit("hash encode fwd+bwd", hash_fwd_bwd, x01, table)

    @jax.jit
    def field_fwd(p, x, d):
        return scene.field.apply(p, x, d)
    _timeit("field apply fwd (hash+MLPs)", field_fwd, params["field"],
            flat_x, flat_d)

    @jax.jit
    def field_fwd_bwd(p, x, d):
        def loss(pp):
            s, c = scene.field.apply(pp, x, d)
            return jnp.sum(s) + jnp.sum(c ** 2)
        return jax.grad(loss)(p)
    _timeit("field apply fwd+bwd", field_fwd_bwd, params["field"],
            flat_x, flat_d)

    # ---- composite -----------------------------------------------------
    sigma, color = field_fwd(params["field"], flat_x, flat_d)
    sigma = sigma.reshape(B, H * W, K)
    color = color.reshape(B, H * W, K, 4)
    dt_full = ((rays.far - rays.near) / S)[..., None]
    _timeit("composite", jax.jit(vr.composite), sigma, color, dt_full,
            valid.astype(sigma.dtype), t_k)


if __name__ == "__main__":
    main()
