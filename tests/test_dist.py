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


def _tiny_nerf_app(tmp_path, batch_size=4, rays_axis=1):
    from tpunerf.training.config import (DistConfig, GuideConfig, LogConfig,
                                         OptimConfig, RenderConfig,
                                         TrainConfig)
    from tpunerf.training.latent_nerf_app import LatentNeRFApp

    cfg = TrainConfig(
        log=LogConfig(exp_name="rays", exp_root=tmp_path),
        render=RenderConfig(train_grid_size=16, num_samples_per_ray=16,
                            batch_size=batch_size),
        optim=OptimConfig(iters=1, seed=0),
        guide=GuideConfig(text="x", tiny_diffusion=True),
        dist=DistConfig(rays_axis=rays_axis))
    return cfg, LatentNeRFApp.create(cfg)


def test_rays_sharded_loss_matches_unsharded(layout, tmp_path):
    """The flagship rays axis: with the layout WIRED (set_layout), the
    (data=4, rays=2) sharded loss must equal the unsharded loss — the
    in-render constrain_rays/constrain_flat constraints change placement,
    never values (VERDICT r2 task 1)."""
    _, app = _tiny_nerf_app(tmp_path)
    key = jax.random.key(0)
    params = app.init_params(key)
    views = rand_poses(key, 4, ViewSamplerConfig())
    loss_single = float(app.loss_fn(params, views, key, jnp.asarray(0))[0])

    app.set_layout(layout)          # rays axis now live inside the render
    loss_sharded = float(jax.jit(
        lambda p, v: app.loss_fn(p, v, key, jnp.asarray(0))[0])(
        shard_params_replicated(params, layout), shard_views(views, layout)))
    np.testing.assert_allclose(loss_single, loss_sharded, rtol=1e-4)


def test_rays_axis_shards_in_render_intermediates(layout):
    """Assert the rays axis actually shards the marching tensors: probe the
    flattened field-MLP batch and a (B, P) ray tensor inside the jitted
    render via jax.debug.inspect_array_sharding."""
    from tpunerf.fields import volume_render as vr

    B, H, W, S = 4, 16, 16, 16
    rays = vr.generate_rays(jnp.linspace(0.6, 1.2, B),
                            jnp.linspace(0.0, 3.0, B),
                            jnp.full((B,), 1.5), H, W, fovy=np.pi / 3)
    cfg = vr.MarchConfig(num_samples=S, num_compacted=8)
    flat_specs, ray_specs = [], []

    def sigma_color(x, d):
        jax.debug.inspect_array_sharding(
            x, callback=lambda s: flat_specs.append(s.spec))
        return jnp.ones(x.shape[:-1]), jnp.ones((*x.shape[:-1], 4))

    def render(rays_in):
        rays_in = vr.Rays(*(layout.constrain_rays(r) for r in rays_in))
        res = vr.render_rays(sigma_color, rays_in, jax.random.key(0), cfg,
                             perturb=False, layout=layout)
        jax.debug.inspect_array_sharding(
            res.weights_sum, callback=lambda s: ray_specs.append(s.spec))
        return res.image

    img = jax.jit(render)(jax.device_put(rays, layout.rays()))
    jax.block_until_ready(img)
    assert flat_specs and flat_specs[0] == P(("data", "rays"))
    assert ray_specs and ray_specs[0] == P("data", "rays")


def test_trainer_wires_rays_axis(tmp_path):
    """Trainer with dist.rays_axis=2 on 8 devices must build the (4, 2) mesh,
    call set_layout, and run a finite step (regression: no test ever set
    dist.rays_axis before r3)."""
    from tpunerf.training.config import (DistConfig, GuideConfig, LogConfig,
                                         OptimConfig, RenderConfig,
                                         TrainConfig)
    from tpunerf.training.latent_nerf_app import LatentNeRFApp
    from tpunerf.training.trainer import Trainer

    cfg = TrainConfig(
        log=LogConfig(exp_name="rw", exp_root=tmp_path, save_interval=100,
                      eval_size=1, full_eval_size=1, vis_train_prob=0.0,
                      save_mesh=False),
        render=RenderConfig(train_grid_size=16, num_samples_per_ray=16,
                            eval_grid_size=16, batch_size=4),
        optim=OptimConfig(iters=1, seed=0),
        guide=GuideConfig(text="x", tiny_diffusion=True),
        dist=DistConfig(rays_axis=2))
    app = LatentNeRFApp.create(cfg)
    t = Trainer(cfg, app)
    assert t.layout is not None and t.layout.n_rays == 2 \
        and t.layout.n_data == 4
    assert app.scene.layout is t.layout    # set_layout was called
    t.train()
    assert t.train_step_idx == 1


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


def test_trainer_chunked_on_mesh_matches_eager(tmp_path):
    """Chunked (optim.train_chunk) training on the (4, 2) data×rays mesh:
    in-scan pose sampling gets its sharding from with_sharding_constraint
    (views are created inside jit, so the eager path's device_put cannot
    apply) — the parameter trajectory must match eager mesh training."""
    import dataclasses

    from tpunerf.training.config import (DistConfig, GuideConfig, LogConfig,
                                         OptimConfig, RenderConfig,
                                         TrainConfig)
    from tpunerf.training.latent_nerf_app import LatentNeRFApp
    from tpunerf.training.trainer import Trainer

    def _cfg(name, chunk):
        return TrainConfig(
            log=LogConfig(exp_name=name, exp_root=tmp_path, save_interval=4,
                          eval_size=1, full_eval_size=1, vis_train_prob=0.0,
                          save_mesh=False),
            render=RenderConfig(train_grid_size=16, num_samples_per_ray=16,
                                eval_grid_size=16, batch_size=4),
            optim=OptimConfig(iters=6, seed=0, train_chunk=chunk),
            guide=GuideConfig(text="x", tiny_diffusion=True),
            dist=DistConfig(rays_axis=2))

    te = Trainer(_cfg("eagerm", 1), LatentNeRFApp.create(_cfg("eagerm", 1)))
    assert te.layout is not None and te.layout.n_rays == 2
    te.train()
    tc = Trainer(_cfg("chunkm", 3), LatentNeRFApp.create(_cfg("chunkm", 3)))
    tc.train()
    for a, b in zip(jax.tree_util.tree_leaves(te.params),
                    jax.tree_util.tree_leaves(tc.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    # chunked updates stay replicated on the mesh
    leaf = jax.tree_util.tree_leaves(tc.params)[0]
    assert leaf.sharding.is_fully_replicated


# --------------------------------------------------------------------------
# Paint apps on the mesh (VERDICT r3 task 5 — the distribution story must
# cover the framework, not one app)
# --------------------------------------------------------------------------

def _paint_mesh_app(tmp_path, batch_size=4):
    from tpunerf.training.config import (GuideConfig, LogConfig, OptimConfig,
                                         RenderConfig, TrainConfig)
    from tpunerf.training.latent_paint_mesh import LatentPaintMeshApp

    cfg = TrainConfig(
        log=LogConfig(exp_name="pm", exp_root=tmp_path),
        render=RenderConfig(train_grid_size=16, eval_grid_size=16,
                            batch_size=batch_size),
        optim=OptimConfig(iters=1, seed=0, mode=0),
        guide=GuideConfig(text="x", shape_path="sphere", tiny_diffusion=True,
                          texture_resolution=16))
    return cfg, LatentPaintMeshApp.create(cfg)


def test_paint_mesh_sharded_step_equals_unsharded(layout, tmp_path):
    """Paint-mesh train step on the (4, 2) mesh with set_layout wired:
    sharded loss == unsharded loss, params stay replicated after the
    gradient psum."""
    import optax

    _, app = _paint_mesh_app(tmp_path)
    key = jax.random.key(0)
    params = app.init_params(key)
    views = rand_poses(key, 4, ViewSamplerConfig())
    loss_single = float(app.loss_fn(params, views, key, jnp.asarray(0))[0])

    app.set_layout(layout)
    tx = app.make_optimizer()
    params_s = shard_params_replicated(params, layout)
    opt_state = shard_params_replicated(tx.init(params_s), layout)
    views_s = shard_views(views, layout)

    @jax.jit
    def step(params, opt_state, key, views):
        (loss, _), grads = jax.value_and_grad(
            app.loss_fn, has_aux=True)(params, views, key, jnp.asarray(0))
        upd, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    params2, _, loss_sharded = step(params_s, opt_state, key, views_s)
    np.testing.assert_allclose(loss_single, float(loss_sharded), rtol=1e-4)
    leaf = jax.tree_util.tree_leaves(params2)[0]
    assert leaf.sharding.is_fully_replicated


def test_paint_mesh_rays_axis_shards_render_images(layout, tmp_path):
    """The (data, rays) constraint is live inside the paint-mesh render:
    probe the composited train image's sharding spec in-jit."""
    _, app = _paint_mesh_app(tmp_path)
    app.set_layout(layout)
    params = shard_params_replicated(app.init_params(jax.random.key(0)),
                                     layout)
    views = shard_views(rand_poses(jax.random.key(1), 4,
                                   ViewSamplerConfig()), layout)
    specs = []

    @jax.jit
    def render(p, v):
        out = app.scene.render_train(p, v)
        jax.debug.inspect_array_sharding(
            out["image"], callback=lambda s: specs.append(s.spec))
        return out["image"]

    img = render(params, views)
    jax.block_until_ready(img)
    assert specs and specs[0] == P("data", "rays")


def test_latent_paint_app_sharded_eval_render(layout, tmp_path):
    """The 512²-class eval render path (here 32²) of the plain paint app
    under the mesh: render_test images shard (data, rays) and values match
    the unsharded render."""
    from tpunerf.training.config import (GuideConfig, LogConfig, OptimConfig,
                                         RenderConfig, TrainConfig)
    from tpunerf.training.latent_paint import LatentPaintApp

    cfg = TrainConfig(
        log=LogConfig(exp_name="lp", exp_root=tmp_path),
        render=RenderConfig(train_grid_size=16, eval_grid_size=32,
                            batch_size=4),
        optim=OptimConfig(iters=1, seed=0),
        guide=GuideConfig(text="x", shape_path="sphere", tiny_diffusion=True,
                          texture_resolution=16))
    app = LatentPaintApp.create(cfg)
    params = app.init_params(jax.random.key(0))
    views = rand_poses(jax.random.key(1), 4, ViewSamplerConfig())
    ref = np.asarray(app.eval_render(params, views, (32, 32))["image"])

    app.set_layout(layout)
    out = jax.jit(lambda p, v: app.eval_render(p, v, (32, 32))["image"])(
        shard_params_replicated(params, layout), shard_views(views, layout))
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5)
