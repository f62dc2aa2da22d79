import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpunerf.guidance.clip_vision import CLIPImageEmbedder, CLIPVisionConfig
from tpunerf.guidance.stable_diffusion import StableDiffusionGuidance
from tpunerf.training.text_token_opt import (encode_text_embedding,
                                             initial_token_embeddings,
                                             optimize_text_token)


@pytest.fixture(scope="module")
def sd():
    return StableDiffusionGuidance.create(jax.random.key(0), tiny=True)


def test_encode_text_embedding_differentiable(sd):
    tok = initial_token_embeddings(sd, "a goldfish")
    assert tok.shape[0] == 1 and tok.ndim == 3
    g = jax.grad(lambda t: jnp.sum(encode_text_embedding(sd, t) ** 2))(tok)
    assert np.abs(np.asarray(g)).max() > 0


def test_optimize_text_token_improves_objective(sd):
    cfg = CLIPVisionConfig.tiny()
    embedder = CLIPImageEmbedder(cfg)
    px = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    eparams = embedder.init(jax.random.key(1), px)
    embed_fn = lambda p: embedder.apply(eparams, p)
    ref = jax.random.uniform(jax.random.key(2), (1, 48, 48, 3))

    tok0 = initial_token_embeddings(sd, "a fish")
    tok, ctx = optimize_text_token(
        sd, embed_fn, ref, "a fish", jax.random.key(3), num_steps=5,
        lr=1e-2, num_sample_steps=2, clip_size=cfg.image_size)
    assert tok.shape == tok0.shape
    assert np.abs(np.asarray(tok - tok0)).max() > 0  # actually moved
    assert np.isfinite(np.asarray(tok)).all()
    assert ctx.shape[0] == 2  # [uncond; cond]
