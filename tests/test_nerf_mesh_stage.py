"""NeRF→mesh fitting stage + latent→RGB head migration + displacement MLP."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpunerf.training.config import (GuideConfig, LogConfig, OptimConfig,
                                     RenderConfig, TrainConfig)
from tpunerf.training.latent_nerf_app import LatentNeRFApp
from tpunerf.training.trainer import Trainer


def _cfg(tmp_path, exp="nm"):
    return TrainConfig(
        log=LogConfig(exp_name=exp, exp_root=tmp_path, save_interval=2,
                      eval_size=1, full_eval_size=1, vis_train_prob=0.0,
                      save_mesh=False),
        render=RenderConfig(train_grid_size=16, eval_grid_size=32,
                            num_samples_per_ray=32),
        optim=OptimConfig(iters=2, seed=0),
        guide=GuideConfig(text="a castle", tiny_diffusion=True,
                          texture_resolution=32),
    )


def test_nerf_to_mesh_pipeline(tmp_path, tiny_sd_guidance):
    cfg = _cfg(tmp_path)
    app = LatentNeRFApp.create(cfg, guidance=tiny_sd_guidance)
    trainer = Trainer(cfg, app)
    trainer.train()  # writes checkpoints

    from scripts.train_latent_nerf_mesh import extract_mesh_from_checkpoint
    mesh = extract_mesh_from_checkpoint(cfg, resolution=24, iso=1.0)
    assert mesh.num_vertices > 10 and mesh.num_faces > 10

    # paint stage on the extracted mesh
    from tpunerf.training.latent_paint import LatentPaintApp
    paint_cfg = dataclasses.replace(
        cfg,
        log=dataclasses.replace(cfg.log, exp_name="nm_mesh"),
        optim=dataclasses.replace(cfg.optim, ckpt=None, iters=1),
        render=dataclasses.replace(cfg.render, train_grid_size=16))
    papp = LatentPaintApp.create(paint_cfg, guidance=app.guidance, mesh=mesh)
    ptr = Trainer(paint_cfg, papp)
    ptr.train()
    assert np.isfinite(np.asarray(ptr.params["texture_img"])).all()


def test_latent_to_rgb_head_migration(tmp_path, tiny_sd_guidance):
    cfg = _cfg(tmp_path, exp="mig")
    app_lat = LatentNeRFApp.create(cfg, guidance=tiny_sd_guidance)
    params = app_lat.init_params(jax.random.key(0))

    rgb_cfg = dataclasses.replace(
        cfg, render=dataclasses.replace(cfg.render, nerf_type="rgb"))
    app_rgb = LatentNeRFApp.create(rgb_cfg, guidance=app_lat.guidance)
    migrated = app_rgb.migrate_params(
        jax.tree_util.tree_map(np.asarray, params))
    # geometry kept, color head re-shaped to 3 channels
    np.testing.assert_array_equal(
        np.asarray(migrated["field"]["params"]["hash_table"]),
        np.asarray(params["field"]["params"]["hash_table"]))
    cmlp = migrated["field"]["params"]["color_mlp"]
    last = sorted(cmlp.keys())[-1]
    assert cmlp[last]["kernel"].shape[-1] == 3
    # and the migrated params actually run
    from tpunerf.core.views import circle_poses, ViewSamplerConfig
    views = circle_poses(1, ViewSamplerConfig())
    migrated = jax.tree_util.tree_map(jnp.asarray, migrated)
    out = jax.jit(lambda p, v: app_rgb.eval_render(p, v, (16, 16)))(
        migrated, views)
    assert out["image"].shape == (1, 16, 16, 3)


def test_displacement_mlp_shapes():
    from tpunerf.meshrep.displacement_mlp import DisplacementMLP
    mlp = DisplacementMLP(width=32, depth=2)
    v = jax.random.normal(jax.random.key(0), (50, 3))
    params = mlp.init(jax.random.key(1), v)
    d = mlp.apply(params, v)
    assert d.shape == (50, 3)
    # zero-init output head → zero initial displacement
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-7)
