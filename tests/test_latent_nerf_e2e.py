"""End-to-end volumetric latent-NeRF training (BASELINE configs #1/#3/#4
shrunk to CPU scale): SDS + occupancy updates + sketch-shape + trainer."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpunerf.training.config import (GuideConfig, LogConfig, OptimConfig,
                                     RenderConfig, TrainConfig)
from tpunerf.training.latent_nerf_app import LatentNeRFApp
from tpunerf.training.trainer import Trainer


def _cfg(tmp_path, **over):
    base = dict(
        log=LogConfig(exp_name="nerf", exp_root=tmp_path, save_interval=4,
                      eval_size=1, full_eval_size=1, vis_train_prob=0.0,
                      save_mesh=False),
        render=RenderConfig(train_grid_size=16, eval_grid_size=32,
                            num_samples_per_ray=32),
        optim=OptimConfig(iters=5, seed=0, lr=1e-2),
        guide=GuideConfig(text="a sand castle", tiny_diffusion=True),
    )
    base.update(over)
    return TrainConfig(**base)


def test_unconstrained_training_step(tmp_path, tiny_sd_guidance):
    cfg = _cfg(tmp_path)
    app = LatentNeRFApp.create(cfg, guidance=tiny_sd_guidance)
    trainer = Trainer(cfg, app)
    table_before = np.asarray(
        trainer.params["field"]["params"]["hash_table"]).copy()
    occ_before = np.asarray(trainer.params["occ_grid"]).copy()
    trainer.train()
    table_after = np.asarray(trainer.params["field"]["params"]["hash_table"])
    assert np.abs(table_after - table_before).max() > 0
    assert np.isfinite(table_after).all()
    # occupancy grid refreshed by post_step (not by the optimizer)
    assert np.abs(np.asarray(trainer.params["occ_grid"]) - occ_before).max() > 0
    # eval artifacts exist
    assert len(list((cfg.log.exp_dir / "vis" / "eval").glob("*.png"))) > 0


def test_sketch_shape_guided_training(tmp_path, tiny_sd_guidance):
    cfg = _cfg(tmp_path, guide=GuideConfig(
        text="a teddy bear", tiny_diffusion=True, shape_path="sphere",
        proximal_surface=0.2))
    cfg = dataclasses.replace(
        cfg, optim=dataclasses.replace(cfg.optim, iters=3, lambda_shape=1.0))
    app = LatentNeRFApp.create(cfg, guidance=tiny_sd_guidance)
    assert app.scene.sdf is not None
    trainer = Trainer(cfg, app)
    trainer.train()
    assert np.isfinite(
        np.asarray(trainer.params["field"]["params"]["hash_table"])).all()


def test_rgb_refinement_mode(tmp_path, tiny_sd_guidance):
    cfg = _cfg(tmp_path, render=RenderConfig(
        train_grid_size=16, eval_grid_size=32, num_samples_per_ray=32,
        nerf_type="rgb"))
    cfg = dataclasses.replace(cfg,
                              optim=dataclasses.replace(cfg.optim, iters=2))
    app = LatentNeRFApp.create(cfg, guidance=dataclasses.replace(
        tiny_sd_guidance, latent_mode=False))
    trainer = Trainer(cfg, app)
    trainer.train()
    from tpunerf.core.views import circle_poses
    views = circle_poses(1, trainer.view_cfg)
    out = app.eval_render(trainer.params, views, (32, 32))
    assert out["image"].shape == (1, 32, 32, 3)
    assert float(out["image"].max()) <= 1.0


def test_single_frame_fwd_bwd_finite(tmp_path, tiny_sd_guidance):
    """BASELINE config #1: single 64×64-style latent frame, fixed camera,
    CPU fwd+bwd check (here 16×16 for speed)."""
    cfg = _cfg(tmp_path)
    app = LatentNeRFApp.create(cfg, guidance=tiny_sd_guidance)
    params = app.init_params(jax.random.key(0))
    from tpunerf.core.views import ViewBatch
    views = ViewBatch(theta=jnp.array([1.0]), phi=jnp.array([0.5]),
                      radius=jnp.array([1.8]),
                      dirs=jnp.array([0], jnp.int32),
                      is_body=jnp.array([True]))
    loss, grads = jax.jit(jax.value_and_grad(
        lambda p: app.loss_fn(p, views, jax.random.key(1),
                              jnp.asarray(0))[0]))(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads["field"])
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert sum(float(jnp.abs(l).sum()) for l in leaves) > 0


def test_latent_to_rgb_checkpoint_migration(tmp_path, tiny_sd_guidance):
    """The REAL eval-config-#4 stage-2 path: train latent, checkpoint, load
    that checkpoint into an RGB app via --optim.ckpt, train a refine step.
    Regression for the r4 production-run failure: migrate_params fixed only
    the color head — the bg_mlp's 4-channel final layer tripped a
    ScopeParamShapeError when the real checkpoint loaded."""
    cfg = _cfg(tmp_path)
    cfg = dataclasses.replace(
        cfg, optim=dataclasses.replace(cfg.optim, iters=4))
    app = LatentNeRFApp.create(cfg, guidance=tiny_sd_guidance)
    t1 = Trainer(cfg, app)
    t1.train()
    ckpt = sorted((t1.ckpt_dir).glob("step_*.ckpt"))[-1]

    cfg2 = _cfg(tmp_path, render=RenderConfig(
        train_grid_size=16, eval_grid_size=32, num_samples_per_ray=32,
        nerf_type="rgb"))
    cfg2 = dataclasses.replace(
        cfg2,
        log=dataclasses.replace(cfg2.log, exp_name="nerf_rgb"),
        optim=dataclasses.replace(cfg2.optim, iters=5, ckpt=ckpt))
    app2 = LatentNeRFApp.create(cfg2, guidance=dataclasses.replace(
        tiny_sd_guidance, latent_mode=False))
    t2 = Trainer(cfg2, app2)
    # geometry carried over from the latent run
    np.testing.assert_array_equal(
        np.asarray(t2.params["field"]["params"]["hash_table"]),
        np.asarray(t1.params["field"]["params"]["hash_table"]))
    table_before = np.asarray(
        t2.params["field"]["params"]["hash_table"]).copy()
    t2.train()      # refine steps run (incl. the bg_mlp render path)
    # refine gradients actually flow into the migrated geometry (a sane
    # field; the r4 production stress run showed a garbage stage-1 field
    # saturates the sigmoid head to zero grads — that is data, not plumbing)
    assert np.abs(np.asarray(
        t2.params["field"]["params"]["hash_table"]) - table_before).max() > 0
    out = app2.eval_render(t2.params, __import__(
        "tpunerf.core.views", fromlist=["circle_poses"]).circle_poses(
        1, t2.view_cfg), (32, 32))
    assert out["image"].shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out["image"])).all()


def test_batched_eval_orbit_matches_per_pose(tmp_path, tiny_sd_guidance):
    """The chunked/jitted eval orbit (r5: one dispatch per log.eval_batch
    poses, tail padded) writes the same frames as per-pose eval_render,
    including a non-divisible size (5 poses, chunk 2 → pad)."""
    cfg = _cfg(tmp_path)
    cfg = dataclasses.replace(
        cfg,
        log=dataclasses.replace(cfg.log, eval_batch=2, eval_size=5),
        optim=dataclasses.replace(cfg.optim, iters=0))
    app = LatentNeRFApp.create(cfg, guidance=tiny_sd_guidance)
    trainer = Trainer(cfg, app)
    trainer.evaluate(step=0, size=5)
    trainer._drain_io()     # frame writes are async (overlap training)
    pngs = sorted((cfg.log.exp_dir / "vis" / "eval").glob("step_000000_*.png"))
    assert len(pngs) == 5

    from PIL import Image
    from tpunerf.core.views import circle_poses
    from tpunerf.utils import tensor2numpy
    views = circle_poses(5, trainer.view_cfg)
    for i, p in enumerate(pngs):
        v = jax.tree_util.tree_map(lambda x: x[i:i + 1], views)
        ref = app.eval_render(trainer.params, v, (32, 32))
        ref_img = tensor2numpy(np.asarray(ref["image"][0]))
        got = np.asarray(Image.open(p))
        # uint8 images; jit fusion may flip a rounding ULP on rare pixels
        assert np.mean(np.abs(got.astype(int) - ref_img.astype(int))) < 0.05
        assert np.max(np.abs(got.astype(int) - ref_img.astype(int))) <= 1


def test_rgb_eval_batch_capped(tmp_path, tiny_sd_guidance):
    """RGB-mode volumetric eval ray-marches every output pixel — the
    memory cap must force one 512²-class pose per dispatch (the r5 refine
    run OOMed batching 5); latent mode stays uncapped (renders at the
    latent grid)."""
    cfg = _cfg(tmp_path, render=RenderConfig(
        train_grid_size=16, eval_grid_size=32, num_samples_per_ray=128,
        nerf_type="rgb"))
    app = LatentNeRFApp.create(cfg, guidance=dataclasses.replace(
        tiny_sd_guidance, latent_mode=False))
    assert app.max_eval_batch((512, 512)) == 1
    assert app.max_eval_batch((64, 64)) >= 5

    lat_app = LatentNeRFApp.create(_cfg(tmp_path), guidance=tiny_sd_guidance)
    assert lat_app.max_eval_batch((512, 512)) > 1000
