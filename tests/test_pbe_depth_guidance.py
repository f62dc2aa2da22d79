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
def pbe():
    return PaintByExampleGuidance.create(jax.random.key(0), tiny=True)


@pytest.fixture(scope="module")
def sdd():
    return StableDiffusionDepthGuidance.create(jax.random.key(0), tiny=True)


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
    g = jax.grad(lambda l: pbe.train_step_loss(jax.random.key(4), l, mask,
                                               emb))(lat)
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
    g = jax.grad(lambda l: sdd.train_step_loss(jax.random.key(3), emb, l,
                                               depth))(lat)
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
