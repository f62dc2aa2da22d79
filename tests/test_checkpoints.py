"""Checkpoint manager edge cases + the NaN post-mortem path (ADVICE.md r1:
the debug save must hold PRE-update params and sit outside rolling
retention so it can neither evict the last good checkpoint nor be resumed)."""
import dataclasses
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tpunerf.training.checkpoints import CheckpointManager


def test_save_debug_outside_retention_and_resume(tmp_path):
    mgr = CheckpointManager(tmp_path, max_keep=2)
    params = {"w": jnp.ones((3,))}
    for step in (1, 2):
        mgr.save(step, params)
    dbg = mgr.save_debug("nan_debug", 2, {"w": jnp.full((3,), 7.0)})
    # a debug save must not count toward nor trigger rolling retention
    mgr.save(3, params)
    names = sorted(p.name for p in tmp_path.glob("*.ckpt"))
    assert names == ["nan_debug.ckpt", "step_000002.ckpt", "step_000003.ckpt"]
    # latest-resume ignores the debug file
    _, _, next_step = mgr.load(params_template=params)
    assert next_step == 4
    # the debug file itself loads by explicit path
    p, _, _ = mgr.load(dbg, params_template=params)
    np.testing.assert_allclose(np.asarray(p["w"]), 7.0)


def test_trainer_nan_guard_saves_pre_update_params(tmp_path):
    """Drive the real Trainer with an app whose loss goes NaN at step 3 and
    check nan_debug.ckpt holds the step-2 (pre-poisoning) params."""
    from tpunerf.core.views import ViewBatch
    from tpunerf.training.config import (LogConfig, OptimConfig, TrainConfig)
    from tpunerf.training.trainer import Trainer

    class NaNApp:
        def init_params(self, key):
            return {"w": jnp.zeros((2,))}

        def loss_fn(self, params, views, key, step):
            base = jnp.sum(params["w"] ** 2) + 1.0
            loss = jnp.where(step >= 3, jnp.nan, base)
            return loss, {}

        def eval_render(self, params, views, dims):
            return {"image": jnp.zeros((1, *dims, 3), jnp.uint8)}

        def make_optimizer(self):
            return optax.sgd(1.0)

        def export(self, params, path):
            raise NotImplementedError

        def preview_latents(self, latents):
            return latents

    cfg = TrainConfig(log=LogConfig(exp_name="nan", exp_root=tmp_path,
                                    eval_size=0, save_interval=1000,
                                    log_images=False),
                      optim=OptimConfig(iters=10, check_nan=True))
    tr = Trainer(cfg, NaNApp())
    with pytest.raises(FloatingPointError):
        tr.train()
    dbg = tr.ckpt_dir / "nan_debug.ckpt"
    assert dbg.exists()
    p, _, _ = tr.ckpts.load(dbg, params_template=tr.params)
    # params saved BEFORE the poisoned update applied: still finite
    assert np.isfinite(np.asarray(p["w"])).all()


def test_async_save_retention_and_flush(tmp_path):
    """async_write saves on a background thread: flush() joins, files land
    with correct content, rolling retention still evicts, and a worker
    failure surfaces at the next flush (r5 — overlaps the tunnel's
    seconds-long device→host state fetch with training)."""
    from tpunerf.training.checkpoints import CheckpointManager

    mgr = CheckpointManager(tmp_path, max_keep=2)
    for step in (1, 2, 3):
        params = {"w": jnp.full((4,), float(step))}
        mgr.save(step, params, opt_state={"m": jnp.zeros(4)},
                 async_write=True)
    mgr.flush()
    names = sorted(p.name for p in (tmp_path).glob("step_*.ckpt"))
    assert names == ["step_000002.ckpt", "step_000003.ckpt"]
    p, opt, nxt = mgr.load(params_template={"w": jnp.zeros(4)},
                           opt_state_template={"m": jnp.zeros(4)})
    assert nxt == 4
    np.testing.assert_array_equal(np.asarray(p["w"]), np.full(4, 3.0))

    # a failing worker raises at the next flush, not silently
    mgr2 = CheckpointManager(tmp_path / "sub", max_keep=2)
    unserializable = {"w": object()}
    mgr2.save(9, unserializable, async_write=True)
    with pytest.raises(Exception):
        mgr2.flush()
