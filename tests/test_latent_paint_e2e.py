"""End-to-end latent-paint slice (SURVEY.md §7 step 3 / BASELINE config #2):
tiny diffusion + procedural sphere + SDS + trainer + ckpt + eval, on CPU."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpunerf.training.config import (GuideConfig, LogConfig, OptimConfig,
                                     RenderConfig, TrainConfig)
from tpunerf.training.latent_paint import LatentPaintApp
from tpunerf.training.trainer import Trainer


def _tiny_cfg(tmp_path, iters=6, latent_mode=True):
    return TrainConfig(
        log=LogConfig(exp_name="t", exp_root=tmp_path, save_interval=3,
                      eval_size=2, full_eval_size=2, vis_train_prob=0.0),
        render=RenderConfig(train_grid_size=24, eval_grid_size=32,
                            nerf_type="latent" if latent_mode else "rgb"),
        optim=OptimConfig(iters=iters, seed=0, lr=1e-2),
        guide=GuideConfig(text="a red fish", shape_path="sphere",
                          tiny_diffusion=True, texture_resolution=32),
    )


@pytest.fixture(scope="module")
def trained(tmp_path_factory, tiny_sd_guidance):
    tmp = tmp_path_factory.mktemp("lp")
    cfg = _tiny_cfg(tmp)
    app = LatentPaintApp.create(cfg, guidance=tiny_sd_guidance)
    trainer = Trainer(cfg, app)
    tex_before = np.asarray(trainer.params["texture_img"]).copy()
    trainer.train()
    return cfg, app, trainer, tex_before


def test_training_updates_texture(trained):
    cfg, app, trainer, tex_before = trained
    tex_after = np.asarray(trainer.params["texture_img"])
    assert np.abs(tex_after - tex_before).max() > 1e-6
    assert np.isfinite(tex_after).all()
    # frozen param untouched in latent mode
    assert np.abs(np.asarray(
        trainer.params["texture_img_rgb_finetune"])).max() == 0


def test_artifacts_written(trained):
    cfg, app, trainer, _ = trained
    exp = cfg.log.exp_dir
    assert (exp / "config.yaml").exists()
    assert (exp / "log.txt").exists()
    assert len(list((exp / "checkpoints").glob("step_*.ckpt"))) >= 1
    assert len(list((exp / "checkpoints").glob("step_*.ckpt"))) <= \
        cfg.log.max_keep_ckpts
    assert len(list((exp / "vis" / "eval").glob("*.png"))) > 0
    # final eval: either mp4 or fallback pngs in results/
    assert len(list((exp / "results").iterdir())) > 0
    # mesh export
    assert (exp / "mesh" / "mesh.obj").exists()
    assert (exp / "mesh" / "albedo.png").exists()


def test_resume_from_checkpoint(trained):
    cfg, app, trainer, _ = trained
    cfg2 = dataclasses.replace(
        cfg, optim=dataclasses.replace(cfg.optim, resume=True, iters=7))
    trainer2 = Trainer(cfg2, app)
    # restored AT the saved step 6: the increment-then-run loop executes
    # exactly step 7 next (the old `saved+1` restore silently skipped it)
    assert trainer2.train_step_idx == 6
    np.testing.assert_allclose(np.asarray(trainer2.params["texture_img"]),
                               np.asarray(trainer.params["texture_img"]))
    trainer2.train()
    assert trainer2.train_step_idx == 7


def test_latent_to_rgb_migration(trained):
    cfg, app, trainer, _ = trained
    ckpts = sorted((cfg.log.exp_dir / "checkpoints").glob("step_*.ckpt"))
    cfg_rgb = _tiny_cfg(cfg.log.exp_root, latent_mode=False)
    cfg_rgb = dataclasses.replace(
        cfg_rgb, optim=dataclasses.replace(cfg_rgb.optim, ckpt=ckpts[-1]),
        log=dataclasses.replace(cfg_rgb.log, exp_name="t"))
    app_rgb = LatentPaintApp.create(cfg_rgb, guidance=dataclasses.replace(
        app.guidance, latent_mode=False))
    trainer_rgb = Trainer(cfg_rgb, app_rgb)
    # RGB finetune texture seeded from decoded latent texture
    rgb = np.asarray(trainer_rgb.params["texture_img_rgb_finetune"])
    assert np.abs(rgb).max() > 0


def test_eval_render_shapes(trained):
    cfg, app, trainer, _ = trained
    from tpunerf.core.views import circle_poses
    views = circle_poses(2, trainer.view_cfg)
    v0 = jax.tree_util.tree_map(lambda x: x[:1], views)
    out = app.eval_render(trainer.params, v0, (32, 32))
    assert out["image"].shape == (1, 32, 32, 3)
    assert float(out["image"].min()) >= 0.0
