"""Chunked (lax.scan) trainer — `optim.train_chunk > 1`.

The chunked path exists to amortize per-dispatch host overhead (~24 ms/step
through the TPU tunnel on the eager loop, BASELINE.md §3). Its contract is
trajectory equivalence: identical PRNG threading to the eager loop, the
occupancy refresh folded into the scan as a lax.cond, and eval/checkpoint
cadence preserved by clipping chunks at save_interval boundaries.
"""
import dataclasses

import jax
import numpy as np
import pytest

from tpunerf.training.config import (GuideConfig, LogConfig, OptimConfig,
                                     RenderConfig, TrainConfig)
from tpunerf.training.latent_nerf_app import LatentNeRFApp
from tpunerf.training.latent_paint import LatentPaintApp
from tpunerf.training.trainer import Trainer


def _nerf_cfg(tmp_path, name, **optim_over):
    optim = dict(iters=6, seed=0, lr=1e-2)
    optim.update(optim_over)
    return TrainConfig(
        log=LogConfig(exp_name=name, exp_root=tmp_path, save_interval=4,
                      eval_size=1, full_eval_size=1, vis_train_prob=0.0,
                      save_mesh=False),
        render=RenderConfig(train_grid_size=16, eval_grid_size=16,
                            num_samples_per_ray=32),
        optim=OptimConfig(**optim),
        guide=GuideConfig(text="a sand castle", tiny_diffusion=True),
    )


def _paint_cfg(tmp_path, name, **optim_over):
    return TrainConfig(
        log=LogConfig(exp_name=name, exp_root=tmp_path, save_interval=4,
                      eval_size=1, full_eval_size=1, vis_train_prob=0.0,
                      save_mesh=False),
        render=RenderConfig(train_grid_size=16, eval_grid_size=16),
        optim=OptimConfig(iters=6, seed=0, lr=1e-2, **optim_over),
        guide=GuideConfig(text="a red fish", shape_path="sphere",
                          tiny_diffusion=True, texture_resolution=16),
    )


def _run(cfg, make_app):
    app = make_app(cfg)
    trainer = Trainer(cfg, app)
    trainer.train()
    return trainer


def _assert_trees_close(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-6)


def test_chunked_matches_eager_nerf(tmp_path, tiny_sd_guidance):
    """Same seed, chunk=4 vs eager: identical parameter trajectory,
    including the in-scan occupancy refresh (interval 2 → refreshes at
    steps 1, 2, 4, 6 in both paths) and the final PRNG key."""
    def make_app(cfg):
        app = LatentNeRFApp.create(cfg, guidance=tiny_sd_guidance)
        app.scene.occ_update_interval = 2
        return app

    eager = _run(_nerf_cfg(tmp_path, "eager"), make_app)
    chunked = _run(_nerf_cfg(tmp_path, "chunk", train_chunk=4), make_app)
    _assert_trees_close(eager.params, chunked.params)
    assert eager.train_step_idx == chunked.train_step_idx == 6
    np.testing.assert_array_equal(
        jax.random.key_data(eager.key), jax.random.key_data(chunked.key))


def test_chunked_matches_eager_paint(tmp_path, tiny_sd_guidance):
    """App without post_step (no extra key split per step)."""
    make_app = lambda cfg: LatentPaintApp.create(  # noqa: E731
        cfg, guidance=tiny_sd_guidance)
    eager = _run(_paint_cfg(tmp_path, "eager"), make_app)
    chunked = _run(_paint_cfg(tmp_path, "chunk", train_chunk=3), make_app)
    _assert_trees_close(eager.params, chunked.params)
    np.testing.assert_array_equal(
        jax.random.key_data(eager.key), jax.random.key_data(chunked.key))


def test_chunk_respects_eval_cadence(tmp_path, tiny_sd_guidance):
    """A chunk larger than the save_interval must still checkpoint/eval at
    every boundary: chunks get clipped (here 4, 4, then 2 for iters=10)."""
    cfg = _nerf_cfg(tmp_path, "cadence", train_chunk=32)
    cfg = dataclasses.replace(
        cfg, optim=dataclasses.replace(cfg.optim, iters=10))
    trainer = _run(cfg, lambda c: LatentNeRFApp.create(
        c, guidance=tiny_sd_guidance))
    ckpts = sorted(p.name for p in
                   (cfg.log.exp_dir / "checkpoints").glob("step_*.ckpt"))
    # boundary saves at exactly 4 and 8 (retention 2 keeps both); exact
    # names so a cadence regression saving at wrong boundaries fails
    assert ckpts == ["step_000004.ckpt", "step_000008.ckpt"]
    # compiled chunk sizes: 4 (clipped at boundaries) and 2 (tail)
    assert set(trainer._chunk_fns) == {4, 2}
    assert trainer.train_step_idx == 10


def test_chunked_nan_guard(tmp_path, tiny_sd_guidance):
    """check_nan in chunked mode: a poisoned step inside the chunk raises
    and saves the chunk-start params outside rolling retention."""
    cfg = _nerf_cfg(tmp_path, "nan", train_chunk=4, check_nan=True, lr=1e30)
    app = LatentNeRFApp.create(cfg, guidance=tiny_sd_guidance)
    trainer = Trainer(cfg, app)
    with pytest.raises(FloatingPointError):
        trainer.train()
    assert list((cfg.log.exp_dir / "checkpoints").glob("nan_debug*"))
