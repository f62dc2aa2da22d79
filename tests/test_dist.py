"""Distribution layer: sharded train step on the 8-device virtual CPU mesh
(the multi-chip validation strategy of SURVEY.md §4/§2.7)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from tpunerf.core.views import ViewSamplerConfig, rand_poses, \
    train_view_stream
from tpunerf.dist.mesh import make_mesh, shard_params_replicated, shard_views


@pytest.fixture(scope="module")
def layout():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    return make_mesh(n_data=4, n_rays=2)


def test_mesh_axes(layout):
    assert layout.n_data == 4 and layout.n_rays == 2
    assert layout.replicated().spec == P()
    assert layout.views().spec == P("data")


def test_data_parallel_latent_nerf_step(layout, tmp_path):
    from tpunerf.training.config import (GuideConfig, LogConfig, OptimConfig,
                                         RenderConfig, TrainConfig)
    from tpunerf.training.latent_nerf_app import LatentNeRFApp

    cfg = TrainConfig(
        log=LogConfig(exp_name="d", exp_root=tmp_path),
        render=RenderConfig(train_grid_size=16, num_samples_per_ray=16,
                            batch_size=4),
        optim=OptimConfig(iters=1, seed=0),
        guide=GuideConfig(text="x", tiny_diffusion=True))
    app = LatentNeRFApp.create(cfg)
    key = jax.random.key(0)
    params = shard_params_replicated(app.init_params(key), layout)
    tx = app.make_optimizer()
    opt_state = shard_params_replicated(tx.init(params), layout)
    views = shard_views(rand_poses(key, 4, ViewSamplerConfig()), layout)

    @jax.jit
    def step(params, opt_state, key, views):
        (loss, _), grads = jax.value_and_grad(
            app.loss_fn, has_aux=True)(params, views, key, jnp.asarray(0))
        upd, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    params2, opt_state2, loss = step(params, opt_state, key, views)
    assert np.isfinite(float(loss))
    # params remain replicated after the update (gradient psum inserted)
    leaf = jax.tree_util.tree_leaves(params2)[0]
    assert leaf.sharding.is_fully_replicated


def test_view_stream_hosts_draw_disjoint_views():
    cfg = ViewSamplerConfig()
    s0 = next(train_view_stream(jax.random.key(0), 2, cfg, host_id=0))
    s1 = next(train_view_stream(jax.random.key(0), 2, cfg, host_id=1))
    assert np.abs(np.asarray(s0.theta) - np.asarray(s1.theta)).max() > 1e-6


def test_sharded_equals_single_device_loss(layout, tmp_path):
    """The sharded loss must equal the unsharded loss bit-for-bit-ish."""
    from tpunerf.training.config import (GuideConfig, LogConfig, OptimConfig,
                                         RenderConfig, TrainConfig)
    from tpunerf.training.latent_nerf_app import LatentNeRFApp

    cfg = TrainConfig(
        log=LogConfig(exp_name="d2", exp_root=tmp_path),
        render=RenderConfig(train_grid_size=16, num_samples_per_ray=16,
                            batch_size=4),
        optim=OptimConfig(iters=1, seed=0),
        guide=GuideConfig(text="x", tiny_diffusion=True))
    app = LatentNeRFApp.create(cfg)
    key = jax.random.key(0)
    params = app.init_params(key)
    views = rand_poses(key, 4, ViewSamplerConfig())

    loss_single = app.loss_fn(params, views, key, jnp.asarray(0))[0]
    loss_sharded = jax.jit(
        lambda p, v: app.loss_fn(p, v, key, jnp.asarray(0))[0])(
        shard_params_replicated(params, layout), shard_views(views, layout))
    np.testing.assert_allclose(float(loss_single), float(loss_sharded),
                               rtol=1e-4)


def test_trainer_dp_resume_restores_replication(tmp_path):
    """Resume under auto data-parallel must re-place restored params with the
    replicated sharding (regression: a plain asarray load lands on one
    device while views stay mesh-sharded)."""
    import dataclasses

    from tpunerf.training.config import (GuideConfig, LogConfig, OptimConfig,
                                         RenderConfig, TrainConfig)
    from tpunerf.training.latent_nerf_app import LatentNeRFApp
    from tpunerf.training.trainer import Trainer

    cfg = TrainConfig(
        log=LogConfig(exp_name="dpr", exp_root=tmp_path, save_interval=2,
                      eval_size=1, full_eval_size=1, vis_train_prob=0.0,
                      save_mesh=False),
        render=RenderConfig(train_grid_size=16, num_samples_per_ray=16,
                            eval_grid_size=16, batch_size=8),
        optim=OptimConfig(iters=2, seed=0),
        guide=GuideConfig(text="x", tiny_diffusion=True))
    t1 = Trainer(cfg, LatentNeRFApp.create(cfg))
    assert t1.layout is not None, "8 virtual devices must enable DP"
    t1.train()

    cfg2 = dataclasses.replace(
        cfg, optim=dataclasses.replace(cfg.optim, iters=3, resume=True))
    t2 = Trainer(cfg2, LatentNeRFApp.create(cfg2))
    assert t2.train_step_idx == 2
    leaf = jax.tree_util.tree_leaves(t2.params)[0]
    assert leaf.sharding.is_fully_replicated
    t2.train()                       # one more DP step from the restore
    assert t2.train_step_idx == 3
