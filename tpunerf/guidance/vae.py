"""Flax AutoencoderKL — Stable Diffusion's VAE.

TPU-native implementation of the model the reference consumes through
diffusers (src/stable_diffusion.py:77 `AutoencoderKL.from_pretrained`,
encode/decode with the 0.18215 latent scaling at :462-489).
NHWC layout; encode returns the diagonal-Gaussian moments so callers can
sample (`encode_imgs`) or take the mode.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

LATENT_SCALE = 0.18215  # reference stable_diffusion.py:465,487


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def sd_v1(cls, dtype=jnp.float32) -> "VAEConfig":
        return cls(dtype=dtype)

    @classmethod
    def tiny(cls, dtype=jnp.float32) -> "VAEConfig":
        return cls(block_out_channels=(16, 32, 32), layers_per_block=1,
                   norm_num_groups=4, dtype=dtype)

    @property
    def downscale(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)


class VAEResnet(nn.Module):
    out_channels: int
    groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=self.dtype,
                         name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=self.dtype,
                         name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class VAEAttention(nn.Module):
    groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=self.dtype,
                         name="group_norm")(x)
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(C, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(C, dtype=self.dtype, name="to_v")(h)
        N = H * W
        if (N >= 2048 and N % 1024 == 0 and C <= 128
                and jax.default_backend() == "tpu"):
            # single-head long self-attention: same HBM argument as the
            # UNet's 64² layers (unet.py:_flash_sdpa) — don't materialize
            # the (B, N, N) matrix. Wide single-head attention (SD VAE
            # mid-block: C=512) stays on the naive path: its N² matrix
            # (67 MB f32 at 64²) is cheaper than flash blocks that must
            # shrink 4× to fit scoped VMEM at that head width
            from tpunerf.guidance.unet import _flash_sdpa
            h = _flash_sdpa(q[:, None].astype(jnp.float32),
                            k[:, None].astype(jnp.float32),
                            v[:, None].astype(jnp.float32), C)[:, 0]
            h = h.astype(v.dtype)
        else:
            attn = jax.nn.softmax(
                jnp.einsum("bqc,bkc->bqk", q, k,
                           preferred_element_type=jnp.float32) * (C ** -0.5),
                axis=-1)
            h = jnp.einsum("bqk,bkc->bqc", attn.astype(v.dtype), v)
        h = nn.Dense(C, dtype=self.dtype, name="to_out")(h)
        return x + h.reshape(B, H, W, C)


class Encoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=cfg.dtype, name="conv_in")(x.astype(cfg.dtype))
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = VAEResnet(ch, cfg.norm_num_groups, cfg.dtype,
                              name=f"down_{i}_res_{j}")(h)
            if i < len(cfg.block_out_channels) - 1:
                h = nn.Conv(ch, (3, 3), strides=2, padding=((0, 1), (0, 1)),
                            dtype=cfg.dtype, name=f"down_{i}_downsample")(h)
        mid = cfg.block_out_channels[-1]
        h = VAEResnet(mid, cfg.norm_num_groups, cfg.dtype, name="mid_res_0")(h)
        h = VAEAttention(cfg.norm_num_groups, cfg.dtype, name="mid_attn")(h)
        h = VAEResnet(mid, cfg.norm_num_groups, cfg.dtype, name="mid_res_1")(h)
        h = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-6, dtype=cfg.dtype,
                         name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1,
                       dtype=cfg.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        rev = tuple(reversed(cfg.block_out_channels))
        h = nn.Conv(rev[0], (3, 3), padding=1, dtype=cfg.dtype,
                    name="conv_in")(z.astype(cfg.dtype))
        h = VAEResnet(rev[0], cfg.norm_num_groups, cfg.dtype, name="mid_res_0")(h)
        h = VAEAttention(cfg.norm_num_groups, cfg.dtype, name="mid_attn")(h)
        h = VAEResnet(rev[0], cfg.norm_num_groups, cfg.dtype, name="mid_res_1")(h)
        for i, ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                h = VAEResnet(ch, cfg.norm_num_groups, cfg.dtype,
                              name=f"up_{i}_res_{j}")(h)
            if i < len(rev) - 1:
                B, H, W, C = h.shape
                h = jax.image.resize(h, (B, H * 2, W * 2, C), method="nearest")
                h = nn.Conv(ch, (3, 3), padding=1, dtype=cfg.dtype,
                            name=f"up_{i}_upsample")(h)
        h = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-6, dtype=cfg.dtype,
                         name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=cfg.dtype,
                       name="conv_out")(h)


class AutoencoderKL(nn.Module):
    config: VAEConfig

    def setup(self):
        self.encoder = Encoder(self.config)
        self.decoder = Decoder(self.config)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1),
                                  dtype=self.config.dtype, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1),
                                       dtype=self.config.dtype,
                                       name="post_quant_conv")

    def encode_moments(self, images: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """images (B,H,W,3) in [−1,1] → (mean, logvar) of the latent
        posterior, each (B, H/8, W/8, 4)."""
        moments = self.quant_conv(self.encoder(images))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, latents: jnp.ndarray) -> jnp.ndarray:
        """Scaled latents → images in [−1,1] (before the caller's /2+.5)."""
        z = latents / LATENT_SCALE
        return self.decoder(self.post_quant_conv(z)).astype(jnp.float32)

    def __call__(self, images, rng):
        mean, logvar = self.encode_moments(images)
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape)
        return self.decode(z * LATENT_SCALE), mean, logvar


def encode_imgs(vae: AutoencoderKL, params, images01: jnp.ndarray,
                rng) -> jnp.ndarray:
    """[0,1] images → scaled latents, sampling the posterior
    (reference `encode_imgs`, stable_diffusion.py:479-489)."""
    images = images01 * 2.0 - 1.0
    mean, logvar = vae.apply(params, images, method=vae.encode_moments)
    z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape)
    return z * LATENT_SCALE


def encode_imgs_mode(vae: AutoencoderKL, params, images01: jnp.ndarray
                     ) -> jnp.ndarray:
    """Deterministic (posterior-mode) encode for texture init
    (reference mesh trainer, latent_paint_mesh/training/trainer.py:70-84)."""
    images = images01 * 2.0 - 1.0
    mean, _ = vae.apply(params, images, method=vae.encode_moments)
    return mean * LATENT_SCALE


def decode_latents(vae: AutoencoderKL, params, latents: jnp.ndarray
                   ) -> jnp.ndarray:
    """Scaled latents → [0,1] images (reference `decode_latents`,
    stable_diffusion.py:462-470)."""
    imgs = vae.apply(params, latents, method=vae.decode)
    return jnp.clip(imgs / 2.0 + 0.5, 0.0, 1.0)
