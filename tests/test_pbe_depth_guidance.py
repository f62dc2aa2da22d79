"""Paint-by-Example and depth-SD guidance backends (tiny configs, CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpunerf.guidance.clip_vision import (CLIPImageEmbedder, CLIPVisionConfig,
                                          clip_preprocess, img_clip_loss,
                                          img_text_clip_loss)
from tpunerf.guidance.depth import (StableDiffusionDepthGuidance,
                                    normalize_depth)
from tpunerf.guidance.paint_by_example import (PaintByExampleGuidance,
                                               approx_latent2rgb)


@pytest.fixture(scope="module")
def pbe(tiny_pbe_guidance):
    return tiny_pbe_guidance


@pytest.fixture(scope="module")
def sdd(tiny_depth_guidance):
    return tiny_depth_guidance


def test_clip_vision_embedder_shapes():
    cfg = CLIPVisionConfig.tiny()
    model = CLIPImageEmbedder(cfg)
    px = jnp.zeros((2, cfg.image_size, cfg.image_size, 3))
    params = model.init(jax.random.key(0), px)
    z = model.apply(params, px)
    assert z.shape == (2, cfg.projection_dim)

    emb = lambda p: model.apply(params, p)
    rgb = jax.random.uniform(jax.random.key(1), (1, 48, 48, 3))
    l1 = img_clip_loss(emb, rgb, rgb, size=cfg.image_size)
    assert float(l1) == pytest.approx(-1.0, abs=1e-5)  # identical images
    tz = jax.random.normal(jax.random.key(2), (1, cfg.projection_dim))
    l2 = img_text_clip_loss(emb, rgb, tz, size=cfg.image_size)
    assert -1.0 <= float(l2) <= 1.0


def test_pbe_exemplar_embeddings(pbe):
    ex = jax.random.uniform(jax.random.key(1), (1, 32, 32, 3))
    emb = pbe.encode_exemplar(ex)
    assert emb.shape[0] == 2  # [uncond; cond]
    assert np.abs(np.asarray(emb[0] - emb[1])).max() > 1e-6


def test_pbe_train_step_gradient(pbe):
    lat = jax.random.normal(jax.random.key(2), (1, 16, 16, 4))
    mask = jnp.zeros((1, 16, 16, 1)).at[:, 4:12, 4:12].set(1.0)
    ex = jax.random.uniform(jax.random.key(3), (1, 32, 32, 3))
    emb = pbe.encode_exemplar(ex)
    g = jax.jit(jax.grad(
        lambda l: pbe.train_step_loss(jax.random.key(4), l, mask,
                                      emb)))(lat)
    assert g.shape == lat.shape
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_pbe_latent_forward_and_full_inpaint(pbe):
    lat = jnp.zeros((1, 16, 16, 4))
    mask = jnp.zeros((1, 16, 16, 1)).at[:, 4:12, 4:12].set(1.0)
    ex = jax.random.uniform(jax.random.key(5), (1, 32, 32, 3))
    emb = pbe.encode_exemplar(ex)
    out = pbe.latent_forward(jax.random.key(6), lat, mask, emb,
                             num_inference_steps=4)
    assert out.shape == lat.shape and np.isfinite(np.asarray(out)).all()

    img = jax.random.uniform(jax.random.key(7), (1, 64, 64, 3))
    m = jnp.zeros((1, 64, 64, 1)).at[:, 16:48, 16:48].set(1.0)
    res = pbe.forward(jax.random.key(8), img, m, ex, num_inference_steps=2)
    assert res.shape == (1, 64, 64, 3)
    assert float(res.min()) >= 0.0 and float(res.max()) <= 1.0


def _tiny_clip_fn():
    cfg = CLIPVisionConfig.tiny()
    model = CLIPImageEmbedder(cfg)
    px = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    params = model.init(jax.random.key(9), px)
    return (lambda p: model.apply(params, p)), cfg.image_size


def test_pbe_use_clip_branch(pbe):
    """The t ≤ 0.4·T CLIP branch (reference pbe :658-664): with the timestep
    window pinned below 0.4 the loss must be the CLIP loss (finite,
    differentiable, different from the SDS identity-loss); pinned above 0.4
    the SDS branch must fire."""
    clip_fn, clip_size = _tiny_clip_fn()
    ref = jax.random.uniform(jax.random.key(1), (1, 64, 64, 3))
    lat = jax.random.normal(jax.random.key(2), (1, 16, 16, 4))
    mask = jnp.zeros((1, 16, 16, 1)).at[:, 4:12, 4:12].set(1.0)
    ex = jax.random.uniform(jax.random.key(3), (1, 32, 32, 3))
    emb = pbe.encode_exemplar(ex)

    kw = dict(use_clip=True, clip_embed_fn=clip_fn, ref_image01=ref,
              clip_image_size=clip_size)
    pbe_lo = PaintByExampleGuidance.create(jax.random.key(0), tiny=True,
                                           min_step=0.25, max_step=0.35)
    loss_clip, g_clip = jax.jit(jax.value_and_grad(
        lambda l: pbe_lo.train_step_loss(jax.random.key(4), l, mask, emb,
                                         **kw)))(lat)
    assert np.isfinite(float(loss_clip))
    assert np.isfinite(np.asarray(g_clip)).all()
    assert np.abs(np.asarray(g_clip)).max() > 0
    # pure-CLIP branch: loss is 10·(−cos) ∈ [−10, 10]
    assert -10.0 <= float(loss_clip) <= 10.0

    pbe_hi = PaintByExampleGuidance.create(jax.random.key(0), tiny=True,
                                           min_step=0.45, max_step=0.55)
    loss_sds, g_sds = jax.jit(jax.value_and_grad(
        lambda l: pbe_hi.train_step_loss(jax.random.key(4), l, mask, emb,
                                         **kw)))(lat)
    assert np.isfinite(float(loss_sds))
    assert np.abs(np.asarray(g_sds)).max() > 0
    # SDS identity-loss grad is constant per-pixel stop-grad; CLIP grad is
    # not — the two branches must differ
    assert np.abs(np.asarray(g_sds) - np.asarray(g_clip)).max() > 1e-8


def test_pbe_mapper_depth_matches_hf_rule():
    from tpunerf.guidance.paint_by_example import pbe_num_mapper_blocks
    assert pbe_num_mapper_blocks(CLIPVisionConfig.vit_l_14()) == 5
    assert pbe_num_mapper_blocks(CLIPVisionConfig.tiny()) == 1


def test_depth_inpaint_unet_variant(tiny_depth_guidance):
    """SD2-inpainting 9-ch UNet flavor (reference
    stable_diffusion_depth.py:59-62,:211-237): constructible, used inside
    the inpaint window of img2img_step (the output must depend on
    masked_latents only through that window), finite."""
    sdd = tiny_depth_guidance
    assert sdd.inpaint_unet is not None
    assert sdd.inpaint_unet.config.in_channels == 9

    lat = jax.random.normal(jax.random.key(1), (1, 16, 16, 4)) * 0.1
    depth = jnp.ones((1, 16, 16, 1)) * 0.5
    emb = sdd.get_text_embeds(["x"])
    upd = jnp.zeros((1, 16, 16, 1)).at[:, :8].set(1.0)
    ml_a = jnp.zeros((1, 16, 16, 4))
    ml_b = jnp.ones((1, 16, 16, 4))

    @jax.jit
    def run(ml):
        return sdd.img2img_step(jax.random.key(0), emb, lat, depth,
                                update_mask=upd, num_inference_steps=8,
                                strength=1.0, inpaint_lo=2, inpaint_hi=5,
                                masked_latents=ml)

    out_a, out_b = run(ml_a), run(ml_b)
    assert np.isfinite(np.asarray(out_a)).all()
    # different masked_latents reach the walk only via the 9-ch UNet inside
    # the window — outputs must differ, proving the inpaint UNet executed
    assert np.abs(np.asarray(out_a) - np.asarray(out_b)).max() > 1e-6

    # window disabled (lo=hi) → masked_latents unused → identical outputs
    @jax.jit
    def run_nowin(ml):
        return sdd.img2img_step(jax.random.key(0), emb, lat, depth,
                                update_mask=upd, num_inference_steps=8,
                                strength=1.0, inpaint_lo=4, inpaint_hi=4,
                                masked_latents=ml)

    np.testing.assert_allclose(np.asarray(run_nowin(ml_a)),
                               np.asarray(run_nowin(ml_b)), rtol=1e-6)


def test_depth_encode_masked_inputs(tiny_depth_guidance):
    sdd = tiny_depth_guidance
    img = jax.random.uniform(jax.random.key(1), (1, 64, 64, 3))
    upd = jnp.zeros((1, 16, 16, 1)).at[:, 4:12, 4:12].set(1.0)
    ml = sdd.encode_masked_inputs(img, upd, jax.random.key(2))
    assert ml.shape == (1, 16, 16, 4)
    assert np.isfinite(np.asarray(ml)).all()


def test_approx_latent2rgb_recovers_linear_map():
    key = jax.random.key(0)
    M_true = jax.random.normal(key, (4, 3))
    lat = jax.random.normal(jax.random.key(1), (500, 4))
    rgb = lat @ M_true
    M = approx_latent2rgb(lat, rgb)
    np.testing.assert_allclose(np.asarray(M), np.asarray(M_true), atol=0.02)


def test_normalize_depth_range():
    d = jax.random.uniform(jax.random.key(0), (1, 8, 8, 1), minval=2.0,
                           maxval=5.0)
    n = normalize_depth(d)
    assert float(n.min()) == pytest.approx(-1.0, abs=1e-5)
    assert float(n.max()) == pytest.approx(1.0, abs=1e-5)


def test_depth_sds_gradient(sdd):
    lat = jax.random.normal(jax.random.key(1), (1, 16, 16, 4))
    depth = jax.random.uniform(jax.random.key(2), (1, 16, 16, 1))
    emb = sdd.get_text_embeds(["a nascar"])
    g = jax.jit(jax.grad(
        lambda l: sdd.train_step_loss(jax.random.key(3), emb, l,
                                      depth)))(lat)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_depth_img2img_step_masked(sdd):
    lat = jnp.zeros((1, 16, 16, 4))
    depth = jnp.ones((1, 16, 16, 1)) * 0.5
    emb = sdd.get_text_embeds(["x"])
    upd = jnp.zeros((1, 16, 16, 1)).at[:, :8].set(1.0)
    chk = jnp.zeros((1, 16, 16, 1)).at[:, :4].set(1.0)
    out = sdd.img2img_step(jax.random.key(0), emb, lat, depth,
                           update_mask=upd, check_mask=chk,
                           num_inference_steps=4, strength=1.0)
    assert out.shape == lat.shape and np.isfinite(np.asarray(out)).all()


def test_depth_prompt_to_img(sdd):
    depth = jnp.ones((1, 16, 16, 1)) * 0.5
    img = sdd.prompt_to_img(jax.random.key(0), ["a castle"], depth,
                            num_inference_steps=2)
    assert img.shape == (1, 64, 64, 3)
