"""Optimized text tokens: fit a prompt embedding to a reference image.

The `optim.use_opt_txt` capability specified by the reference's experimental
trainer (src/latent_paint_mesh/training/trainer_experiment.py:323-496
`optimize_text_token`): gradient-optimize the *token embeddings* of a prompt
(before the CLIP text transformer) so that images sampled from those
embeddings match a reference image under a CLIP loss — optionally
differentiating through a short DDIM sampling chain.

TPU-native design: the whole inner objective (token embeds → CLIP text
transformer → UNet DDIM chain → VAE decode → CLIP image loss) is one jitted
function; the chain uses a small fixed number of steps so the graph stays
bounded.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from tpunerf.guidance import sds as sds_lib
from tpunerf.guidance.clip_vision import clip_preprocess
from tpunerf.guidance.schedulers import ddim_step, ddim_timesteps
from tpunerf.guidance.stable_diffusion import StableDiffusionGuidance


def encode_text_embedding(guidance: StableDiffusionGuidance,
                          token_embeddings: jnp.ndarray) -> jnp.ndarray:
    """Differentiable path through the CLIP text transformer given raw token
    embeddings (reference `encode_text_embedding`, trainer.py:240-256)."""
    return guidance.text_encoder.apply(
        guidance.text_params,
        jnp.zeros(token_embeddings.shape[:2], jnp.int32),
        input_embeddings=token_embeddings)


def initial_token_embeddings(guidance: StableDiffusionGuidance,
                             prompt: str) -> jnp.ndarray:
    """(1, L, D) token-embedding rows for the prompt."""
    ids = jnp.asarray(guidance.tokenizer([prompt]))
    emb_table = guidance.text_params["params"]["token_embedding"]["embedding"]
    return emb_table[ids]


def optimize_text_token(
        guidance: StableDiffusionGuidance,
        clip_embed_fn,                       # [0,1] NHWC → (B, D) embeddings
        ref_image01: jnp.ndarray,            # (1, H, W, 3)
        prompt: str,
        key: jax.Array,
        num_steps: int = 100,
        lr: float = 1e-3,
        num_sample_steps: int = 4,
        guidance_scale: float = 7.5,
        through_sampling: bool = True,
        clip_size: int = 224) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (optimized token embeddings (1, L, D), final CFG context
    (2, L, D_ctx)).

    `through_sampling=True` differentiates through a short DDIM chain +
    VAE decode (the expensive reference variant); otherwise the loss is
    CLIP(text-embedding pooled) vs image embedding (cheap variant).
    """
    tok = initial_token_embeddings(guidance, prompt)
    uncond = guidance.get_text_embeds([""])[0:1]
    ref_z = clip_embed_fn(clip_preprocess(ref_image01, clip_size))
    ref_z = ref_z / jnp.linalg.norm(ref_z, axis=-1, keepdims=True)

    ts = ddim_timesteps(num_sample_steps)
    h = guidance.latent_size

    def objective(tok_emb, k):
        ctx = encode_text_embedding(guidance, tok_emb)
        if through_sampling:
            emb = jnp.concatenate([uncond, ctx], axis=0)
            lat = jax.random.normal(k, (1, h, h, 4))

            def body(lat, t):
                eps = sds_lib.cfg_eps(guidance.unet_apply, lat, t, emb,
                                      guidance_scale)
                return ddim_step(guidance.sched, eps, t, lat,
                                 num_sample_steps).prev_sample, None

            lat, _ = jax.lax.scan(body, lat, ts)
            img = guidance.decode_latents(lat)
            z = clip_embed_fn(clip_preprocess(img, clip_size))
        else:
            # cheap proxy: pooled text representation vs image embedding
            z = jnp.mean(ctx, axis=1)
            z = z[..., :ref_z.shape[-1]] if z.shape[-1] >= ref_z.shape[-1] \
                else jnp.pad(z, ((0, 0), (0, ref_z.shape[-1] - z.shape[-1])))
        z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-8)
        return -jnp.mean(jnp.sum(z * ref_z, axis=-1))

    opt = optax.adam(lr)

    @jax.jit
    def run(tok, key):
        state = opt.init(tok)

        def step(carry, i):
            tok, state = carry
            k = jax.random.fold_in(key, i)
            loss, g = jax.value_and_grad(objective)(tok, k)
            upd, state = opt.update(g, state)
            return (optax.apply_updates(tok, upd), state), loss

        (tok, _), losses = jax.lax.scan(step, (tok, state),
                                        jnp.arange(num_steps))
        return tok, losses

    tok, _ = run(tok, key)
    ctx = encode_text_embedding(guidance, tok)
    return tok, jnp.concatenate([uncond, ctx], axis=0)
