"""Piecewise timing of the volumetric render fwd+bwd (the bench headline).

Times each stage of the hot path separately on the current backend so kernel
work targets the real bottleneck (SURVEY.md §5.1 tooling). Run:
    python -m scripts.profile_render

Timing method (same as bench.py): the tunneled TPU backend does not reliably
block in `jax.block_until_ready`, so each stage runs as a `lax.scan` whose
carry chains iterations (forcing serial device execution) and the clock stops
on a host fetch of the final carry. 100 iterations amortize the tunnel's
fixed ~24 ms per-dispatch cost to ≤ 0.25 ms/iter (see bench.py docstring).
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def _scan_time(name, step, iters=100, reps=2):
    """step(key, acc) -> scalar that depends on the stage's full output."""

    @jax.jit
    def run(key):
        def body(carry, _):
            key, acc = carry
            key, sub = jax.random.split(key)
            return (key, step(sub, acc)), None

        (_, acc), _ = jax.lax.scan(
            body, (key, jnp.float32(0.0)), None, length=iters)
        return acc

    out = float(run(jax.random.key(0)))            # compile + warm
    assert out == out, f"NaN in stage {name}"
    best = float("inf")
    for r in range(reps):
        t0 = time.perf_counter()
        _ = float(run(jax.random.key(r + 1)))
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name:<44s} {best*1e3:8.2f} ms")
    return best


def _consume(tree):
    return sum(jnp.sum(jnp.abs(x).astype(jnp.float32))
               for x in jax.tree_util.tree_leaves(tree)) * 1e-20


def main():
    from tpunerf.core.views import ViewSamplerConfig, rand_poses
    from tpunerf.fields.scene import LatentNeRFScene
    from tpunerf.fields import occupancy as occ_lib
    from tpunerf.fields import volume_render as vr

    import os
    H = W = 64
    # batch sweep for the B=8-slower-than-B=1 question (VERDICT r3 weak #4):
    # TPUNERF_PROFILE_B=8 python -m scripts.profile_render
    B = int(os.environ.get("TPUNERF_PROFILE_B", "1"))
    scene = LatentNeRFScene.create(nerf_type="latent", tiny=False,
                                   num_samples=128, num_compacted=64,
                                   train_grid_size=H)
    key = jax.random.key(0)
    params = scene.init_params(key)
    views = rand_poses(key, B, ViewSamplerConfig())
    upd = jax.jit(scene.update_occupancy)
    # EMA steady state: the optimistic init (grid=1.0, decay 0.95) needs
    # ~90 updates before empty space decays below the 0.01 threshold —
    # 4 warmups (r1-r3) benchmarked a 100%-occupied grid, which disables
    # the r4 sparse window sweep and overfills compaction
    warm = int(os.environ.get("TPUNERF_PROFILE_OCC_WARM", "100"))
    for i in range(warm):
        params = upd(params, jax.random.fold_in(key, i))
    occ_frac = float(jnp.mean(
        (params["occ_grid"] > scene.occ_cfg.density_threshold)
        .astype(jnp.float32)))
    print(f"occupancy grid: {warm} EMA updates, "
          f"occupied fraction {occ_frac:.3f}")

    N = B * H * W * scene.march.num_compacted          # field points
    print(f"backend={jax.default_backend()}  rays={B*H*W}  "
          f"S={scene.march.num_samples} K={scene.march.num_compacted}  "
          f"field pts={N}")

    def full_fwd(sub, acc):
        out = scene.render_train(params, views, sub, jnp.asarray(0))
        return _consume(out["image"]) + out["sparsity_loss"] * 0 + acc * 1e-20

    def full_fwd_bwd(sub, acc):
        def loss_fn(p):
            out = scene.render_train(p, views, sub, jnp.asarray(0))
            return jnp.sum(out["image"] ** 2) + out["sparsity_loss"]
        loss, grads = jax.value_and_grad(loss_fn)(params)
        return loss * 1e-20 + _consume(grads) + acc * 1e-20

    _scan_time("full render fwd", full_fwd)
    _scan_time("full render fwd+bwd", full_fwd_bwd)

    def gen_step(sub, acc):
        th = views.theta + acc * 1e-20 + jax.random.uniform(sub, ()) * 1e-20
        rays = vr.generate_rays(th, views.phi, views.radius, H, W,
                                fovy=scene.fovy, bound=scene.march.bound)
        return _consume((rays.origins, rays.dirs, rays.near, rays.far))

    _scan_time("generate_rays", gen_step)
    rays = jax.jit(lambda: vr.generate_rays(
        views.theta, views.phi, views.radius, H, W, fovy=scene.fovy,
        bound=scene.march.bound))()

    S, K = scene.march.num_samples, scene.march.num_compacted

    def make_xyz(sub):
        u = (jnp.arange(S, dtype=jnp.float32) + 0.5) / S
        u = jnp.broadcast_to(u, (B, H * W, S))
        u = u + (jax.random.uniform(sub, u.shape) - 0.5) / S
        t = rays.near[..., None] + (rays.far - rays.near)[..., None] * u
        xyz = rays.origins[..., None, :] + rays.dirs[..., None, :] * t[..., None]
        return t, jnp.clip(xyz, -1.0, 1.0)

    def sample_compact(sub, acc):
        t, xyz = make_xyz(sub)
        xyz = xyz + acc * 1e-20
        occ = occ_lib.occupied(params["occ_grid"], xyz, scene.occ_cfg)
        valid, t_k, xyz_k = occ_lib.compact_gather(occ, K, t, xyz)
        return _consume((t_k, xyz_k)) + _consume(valid)

    _scan_time("sample+occ-lookup+compact+gather", sample_compact)

    def occ_only(sub, acc):
        _, xyz = make_xyz(sub)
        occ = occ_lib.occupied(params["occ_grid"] + acc * 1e-20, xyz,
                               scene.occ_cfg)
        return _consume(occ)

    _scan_time("  sample+occ lookup", occ_only)

    _, xyz0 = jax.jit(make_xyz)(key)
    occ0 = jax.jit(lambda: occ_lib.occupied(params["occ_grid"], xyz0,
                                            scene.occ_cfg))()

    def compact_only(sub, acc):
        o = jnp.logical_or(occ0, jax.random.uniform(sub, occ0.shape) > 2.0)
        gi, valid = occ_lib.compact_samples(o, K)
        return _consume(gi) + _consume(valid) + acc * 1e-20

    _scan_time("  compact_samples alone", compact_only)

    from tpunerf.kernels.hashgrid import hash_encode_auto, supports_pallas
    gcfg = scene.field.config.grid
    print(f"pallas hash path: {supports_pallas(gcfg)}  "
          f"(L={gcfg.n_levels} T={gcfg.table_size} F={gcfg.n_features_per_level})")
    table = params["field"]["params"]["hash_table"]
    flat_x = xyz0[..., :K, :].reshape(-1, 3)
    flat_d = jnp.broadcast_to(rays.dirs[..., None, :],
                              xyz0[..., :K, :].shape).reshape(-1, 3)
    x01 = jnp.clip((flat_x + 1.0) / 2.0, 0.0, 1.0)

    def hash_fwd(sub, acc):
        return _consume(hash_encode_auto(x01 + acc * 1e-20, table, gcfg))

    _scan_time("hash encode fwd", hash_fwd)

    def hash_fwd_bwd(sub, acc):
        g = jax.grad(lambda tt: jnp.sum(
            hash_encode_auto(x01 + acc * 1e-20, tt, gcfg) ** 2))(table)
        return _consume(g)

    _scan_time("hash encode fwd+bwd", hash_fwd_bwd)

    def field_fwd(sub, acc):
        s, c = scene.field.apply(params["field"], flat_x + acc * 1e-20,
                                 flat_d)
        return _consume((s, c))

    _scan_time("field apply fwd (hash+MLPs)", field_fwd)

    def field_fwd_bwd(sub, acc):
        def loss(pp):
            s, c = scene.field.apply(pp, flat_x + acc * 1e-20, flat_d)
            return jnp.sum(s) + jnp.sum(c ** 2)
        return _consume(jax.grad(loss)(params["field"]))

    _scan_time("field apply fwd+bwd", field_fwd_bwd)

    sigma, color = jax.jit(
        lambda: scene.field.apply(params["field"], flat_x, flat_d))()
    sigma = sigma.reshape(B, H * W, K)
    color = color.reshape(B, H * W, K, 4)
    t_k = jnp.broadcast_to(
        jnp.linspace(0.1, 2.0, K, dtype=jnp.float32), (B, H * W, K))
    dt_full = ((rays.far - rays.near) / S)[..., None]
    valid = jnp.ones((B, H * W, K), sigma.dtype)

    def comp_step(sub, acc):
        out = vr.composite(sigma + acc * 1e-20, color, dt_full, valid, t_k)
        return _consume(out)

    _scan_time("composite", comp_step)


if __name__ == "__main__":
    main()
