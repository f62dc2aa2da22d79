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


def pbe_num_mapper_blocks(vision_config: CLIPVisionConfig) -> int:
    """Mapper depth of the real checkpoint: (num_hidden_layers + 1) // 5
    — 5 blocks for the ViT-L tower (diffusers PaintByExampleMapper; the
    reference consumes it via Fantasy-Studio/Paint-by-Example,
    paint_by_example.py:705-751). Floor of 1 for tiny test configs."""
    return max(1, (vision_config.num_layers + 1) // 5)


class PaintByExampleImageEncoder(nn.Module):
    """CLIP vision + mapper transformer + proj + learned uncond vector
    (reference paint_by_example.py:705-751). Structure mirrors the HF
    checkpoint: N 1-head pre-norm transformer blocks with biased attention
    and exact (erf) GELU feed-forward, so real weights load 1:1
    (weights.convert_pbe_image_encoder)."""
    vision_config: CLIPVisionConfig
    proj_dim: int = 768

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, 3) CLIP-normalized → (B, 1, proj_dim) cond embedding."""
        # registered here (not used in the output) so init() materializes it
        # and the weight converter can shape-check it like every other leaf
        self.param("uncond_vector", nn.initializers.normal(0.02),
                   (1, 1, self.proj_dim))
        pooled = CLIPVisionModel(self.vision_config, name="model")(
            pixel_values)                                   # (B, D)
        x = pooled[:, None, :]
        D = x.shape[-1]
        for i in range(pbe_num_mapper_blocks(self.vision_config)):
            h = nn.LayerNorm(epsilon=1e-5, name=f"block_{i}_norm1")(x)
            q = nn.Dense(D, name=f"block_{i}_q")(h)
            k = nn.Dense(D, name=f"block_{i}_k")(h)
            v = nn.Dense(D, name=f"block_{i}_v")(h)
            attn = nn.softmax(jnp.einsum("bqd,bkd->bqk", q, k) * (D ** -0.5),
                              axis=-1)
            x = x + nn.Dense(D, name=f"block_{i}_out")(
                jnp.einsum("bqk,bkd->bqd", attn, v))
            h = nn.LayerNorm(epsilon=1e-5, name=f"block_{i}_norm3")(x)
            h = nn.Dense(D * 4, name=f"block_{i}_fc1")(h)
            x = x + nn.Dense(D, name=f"block_{i}_fc2")(
                nn.gelu(h, approximate=False))
        x = nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(x)
        return nn.Dense(self.proj_dim, name="proj_out")(x)


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
               min_step: float = 0.2, max_step: float = 0.6,
               model_dir: Optional[Any] = None,
               unet_dtype: str = "float32") -> "PaintByExampleGuidance":
        """model_dir: diffusers-layout Paint-by-Example checkpoint directory
        (Fantasy-Studio/Paint-by-Example: unet/, vae/, image_encoder/). When
        given, real weights are converted in (weights.load_pbe_params);
        otherwise the modules run with random init (tests / smoke runs)."""
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

        if model_dir is not None:
            from tpunerf.guidance.weights import load_pbe_params
            unet_params, vae_params, enc_params = load_pbe_params(
                model_dir, unet, vae, enc)
        else:
            lat = jnp.zeros((1, latent_size, latent_size, 9))
            ctx = jnp.zeros((1, 1, ucfg.cross_attention_dim))
            unet_params = jax.jit(unet.init)(k1, lat,
                                             jnp.zeros((1,), jnp.int32),
                                             ctx)
            vae_params = jax.jit(vae.init)(
                k2, jnp.zeros((1, image_size, image_size, 3)),
                jax.random.key(0))
            px = jnp.zeros((1, vis.image_size, vis.image_size, 3))
            enc_params = jax.jit(enc.init)(k3, px)

        from tpunerf.guidance.unet import apply_unet_dtype
        unet, unet_params = apply_unet_dtype(unet, unet_params, unet_dtype)
        return cls(unet=unet, unet_params=unet_params, vae=vae,
                   vae_params=vae_params, image_encoder=enc,
                   image_encoder_params=enc_params,
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
                        guidance_scale: float = 7.5,
                        use_clip: bool = False,
                        clip_embed_fn: Optional[Callable] = None,
                        ref_image01: Optional[jnp.ndarray] = None,
                        clip_image_size: int = 224) -> jnp.ndarray:
        """SDS on masked latents (reference `train_step`, pbe :583-680):
        foreground replaced by the grey latent, the UNet's mask channel is
        the KEEP/background mask (ref `masks = 1 - input_masks`, :609,:646),
        w = (1−ᾱ_t), gradient injected through the Σ latents·sg(grad)
        identity.

        use_clip (ref :658-664): for sampled t ≤ 0.4·T, instead of the SDS
        gradient take one full-schedule DDIM step from the noised latents,
        decode, and return 10 × img_clip_loss(decoded, ref_image01) — the
        gradient flows latents → x_t → x_{t−1} → VAE → CLIP. The branch is a
        lax.cond on the traced t so the whole step stays jittable.

        latents (B, h, w, 4); mask (B, h, w, 1) foreground=1.
        """
        k_t, k_n = jax.random.split(key)
        t = sds_lib.sample_timestep(k_t, self.min_step, self.max_step)
        lat_sg = jax.lax.stop_gradient(latents)
        masked = lat_sg * (1 - mask) + LATENT_GRAY * mask  # grey-fill fg
        noise = jax.random.normal(k_n, lat_sg.shape)
        lat_noisy = self.sched.add_noise(lat_sg, noise, t)
        eps_hat = jax.lax.stop_gradient(
            self._unet_9ch(lat_noisy, masked, 1.0 - mask, t, image_embeds,
                           guidance_scale))

        def sds_branch(latents):
            w = self.sched.sds_weight(t, form="sigma2")
            grad = jax.lax.stop_gradient(
                sds_lib.nan_guard(w * (eps_hat - noise)))
            return jnp.sum(latents * grad)

        if not use_clip:
            return sds_branch(latents)
        assert clip_embed_fn is not None and ref_image01 is not None

        def clip_branch(latents):
            from tpunerf.guidance.clip_vision import img_clip_loss
            lat_noisy_g = self.sched.add_noise(latents, noise, t)
            prev = ddim_step(self.sched, eps_hat, t, lat_noisy_g,
                             self.sched.num_train_timesteps).prev_sample
            imgs = vae_lib.decode_latents(self.vae, self.vae_params, prev)
            return 10.0 * img_clip_loss(clip_embed_fn, imgs, ref_image01,
                                        size=clip_image_size)

        threshold = (4 * self.sched.num_train_timesteps) // 10
        return jax.lax.cond(t <= threshold, clip_branch, sds_branch, latents)

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
            # keep/background mask channel, as in train_step (ref :646)
            eps = self._unet_9ch(lat, masked, 1.0 - mask, t, image_embeds,
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
