"""Flax CLIP vision tower + image/text similarity losses.

TPU-native equivalent of the OpenAI CLIP usage in the reference:
* `clip_model.encode_image` for image-image / image-text cosine losses
  (src/stable_diffusion.py:206-221, latent_paint_mesh/training/
  trainer.py:172-180 — ViT-L/14 or ViT-B/32);
* the vision backbone of Paint-by-Example's exemplar encoder
  (src/paint_by_example.py:705-751).

Standard CLIP ViT: patch conv (no bias), class token, learned positional
embedding, pre-LN transformer (quick-gelu), post-LN on the class token and a
linear projection to the shared embedding space.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tpunerf.guidance.clip_text import quick_gelu

# CLIP preprocessing constants (reference stable_diffusion.py:97-100).
# Plain numpy on purpose: module-level jnp constants become leaked tracers
# when the module is first imported inside a jit trace (tests/test_import_in_trace.py).
CLIP_IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    projection_dim: int = 768
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def vit_l_14(cls, dtype=jnp.float32) -> "CLIPVisionConfig":
        return cls(dtype=dtype)

    @classmethod
    def vit_b_32(cls, dtype=jnp.float32) -> "CLIPVisionConfig":
        return cls(patch_size=32, hidden_size=768, num_layers=12,
                   num_heads=12, intermediate_size=3072, projection_dim=512,
                   dtype=dtype)

    @classmethod
    def tiny(cls, dtype=jnp.float32) -> "CLIPVisionConfig":
        return cls(image_size=32, patch_size=8, hidden_size=32, num_layers=2,
                   num_heads=4, intermediate_size=64, projection_dim=16,
                   dtype=dtype)


class _VisionAttention(nn.Module):
    config: CLIPVisionConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        D = cfg.hidden_size
        hd = D // cfg.num_heads
        q = nn.Dense(D, dtype=cfg.dtype, name="q_proj")(x) * (hd ** -0.5)
        k = nn.Dense(D, dtype=cfg.dtype, name="k_proj")(x)
        v = nn.Dense(D, dtype=cfg.dtype, name="v_proj")(x)

        def split(t):
            B, N, _ = t.shape
            return t.reshape(B, N, cfg.num_heads, hd).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        attn = nn.softmax(jnp.einsum("bhqd,bhkd->bhqk", q, k,
                                     preferred_element_type=jnp.float32),
                          axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        B, H, N, hd2 = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(B, N, H * hd2)
        return nn.Dense(D, dtype=cfg.dtype, name="out_proj")(out)


class CLIPVisionModel(nn.Module):
    config: CLIPVisionConfig

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray,
                 return_sequence: bool = False) -> jnp.ndarray:
        """pixel_values (B, H, W, 3), CLIP-normalized → pooled class
        embedding (B, D) after post-LN (or the full sequence)."""
        cfg = self.config
        x = nn.Conv(cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
                    strides=cfg.patch_size, use_bias=False, dtype=cfg.dtype,
                    name="patch_embedding")(pixel_values.astype(cfg.dtype))
        B, gh, gw, D = x.shape
        x = x.reshape(B, gh * gw, D)
        cls_tok = self.param("class_embedding",
                             nn.initializers.normal(0.02), (D,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_tok, (B, 1, D)).astype(cfg.dtype), x],
            axis=1)
        pos = self.param("position_embedding",
                         nn.initializers.normal(0.02),
                         (gh * gw + 1, D))
        x = x + pos[None].astype(cfg.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="pre_layernorm")(x)
        for i in range(cfg.num_layers):
            h = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name=f"layer_{i}_ln1")(x)
            x = x + _VisionAttention(cfg, name=f"layer_{i}_attn")(h)
            h = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name=f"layer_{i}_ln2")(x)
            h = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype,
                         name=f"layer_{i}_fc1")(h)
            h = quick_gelu(h)
            x = x + nn.Dense(cfg.hidden_size, dtype=cfg.dtype,
                             name=f"layer_{i}_fc2")(h)
        if return_sequence:
            return x.astype(jnp.float32)
        pooled = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="post_layernorm")(x[:, 0])
        return pooled.astype(jnp.float32)


class CLIPImageEmbedder(nn.Module):
    """Vision tower + projection to the shared space (`encode_image`)."""
    config: CLIPVisionConfig

    def setup(self):
        self.vision = CLIPVisionModel(self.config)
        self.projection = nn.Dense(self.config.projection_dim,
                                   use_bias=False,
                                   dtype=self.config.dtype,
                                   name="visual_projection")

    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        return self.projection(self.vision(pixel_values)).astype(jnp.float32)


def clip_preprocess(images01: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    """[0,1] NHWC → resized + CLIP-normalized (reference `aug` transform,
    stable_diffusion.py:97-100)."""
    B, H, W, C = images01.shape
    if (H, W) != (size, size):
        images01 = jax.image.resize(images01, (B, size, size, C),
                                    method="bilinear")
    return (images01 - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD


def img_clip_loss(embed_fn, rgb1: jnp.ndarray, rgb2: jnp.ndarray,
                  size: int = 224) -> jnp.ndarray:
    """−cos(E(rgb1), E(rgb2)) (reference `img_clip_loss`, sd.py:206-213)."""
    z1 = embed_fn(clip_preprocess(rgb1, size))
    z2 = embed_fn(clip_preprocess(rgb2, size))
    z1 = z1 / jnp.linalg.norm(z1, axis=-1, keepdims=True)
    z2 = z2 / jnp.linalg.norm(z2, axis=-1, keepdims=True)
    return -jnp.mean(jnp.sum(z1 * z2, axis=-1))


def img_text_clip_loss(embed_fn, rgb: jnp.ndarray, text_z: jnp.ndarray,
                       size: int = 224) -> jnp.ndarray:
    """−cos(E(rgb), text_z) (reference `img_text_clip_loss`, sd.py:215-221)."""
    z = embed_fn(clip_preprocess(rgb, size))
    z = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
    t = text_z / jnp.linalg.norm(text_z, axis=-1, keepdims=True)
    return -jnp.mean(jnp.sum(z * t, axis=-1))
