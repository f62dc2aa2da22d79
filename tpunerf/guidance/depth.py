"""Depth-conditioned Stable Diffusion guidance (SD2-depth family).

TPU-native re-design of src/stable_diffusion_depth.py (imported by nothing in
the reference fork but a standalone capability — SURVEY.md §2.3): a
5-channel UNet ([latent, depth], ref :341-344), PNDM scheduler (ref :66-68),
SDS with w = (1−ᾱ_t) (ref :302-365), strength-truncated img2img
(`get_timesteps`, ref :428-435), single-step img2img (ref :136-168), the
masked iterative img2img refinement loop with update/check masks and the
10<i<20 inpaint window (ref :170-300), and depth-channel txt2img
(ref :437-467). Drives BASELINE config #5 (depth-conditioned paint-mesh).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from tpunerf.guidance import sds as sds_lib
from tpunerf.guidance import vae as vae_lib
from tpunerf.guidance.clip_text import CLIPTextConfig, CLIPTextModel, \
    make_tokenizer
from tpunerf.guidance.schedulers import (NoiseSchedule, PNDMState, ddim_step,
                                         ddim_timesteps, pndm_init, pndm_step,
                                         strength_timesteps)
from tpunerf.guidance.unet import UNet2DCondition, UNetConfig


def normalize_depth(depth: jnp.ndarray, mask: Optional[jnp.ndarray] = None
                    ) -> jnp.ndarray:
    """Depth map → [−1, 1] over the valid region (SD2-depth convention)."""
    if mask is None:
        lo = jnp.min(depth, axis=(1, 2, 3), keepdims=True)
        hi = jnp.max(depth, axis=(1, 2, 3), keepdims=True)
    else:
        big = jnp.where(mask > 0, depth, jnp.inf)
        small = jnp.where(mask > 0, depth, -jnp.inf)
        lo = jnp.min(big, axis=(1, 2, 3), keepdims=True)
        hi = jnp.max(small, axis=(1, 2, 3), keepdims=True)
    d = (depth - lo) / jnp.maximum(hi - lo, 1e-6)
    return d * 2.0 - 1.0


@dataclasses.dataclass
class StableDiffusionDepthGuidance:
    unet: UNet2DCondition              # 5-channel input ([latent, depth])
    unet_params: Any
    vae: vae_lib.AutoencoderKL
    vae_params: Any
    text_encoder: CLIPTextModel
    text_params: Any
    tokenizer: Any
    sched: NoiseSchedule
    min_step: int = 20
    max_step: int = 980
    latent_size: int = 64
    image_size: int = 512
    # SD2-inpainting 9-channel UNet ([latent, mask, masked-image latent]),
    # used inside the img2img inpaint window (reference
    # stable_diffusion_depth.py:59-62, :211-237)
    inpaint_unet: Optional[UNet2DCondition] = None
    inpaint_unet_params: Any = None

    @classmethod
    def create(cls, key: jax.Array, tiny: bool = False,
               model_dir=None, min_step: float = 0.02,
               max_step: float = 0.98, use_inpaint: bool = False,
               inpaint_model_dir=None,
               unet_dtype: str = "float32"
               ) -> "StableDiffusionDepthGuidance":
        """use_inpaint: also construct the SD2-inpainting 9-ch UNet
        (reference `use_inpaint`, stable_diffusion_depth.py:23,:59-62).
        inpaint_model_dir: diffusers-layout checkpoint dir for its weights
        (stabilityai/stable-diffusion-2-inpainting); random init without."""
        if tiny:
            ucfg = UNetConfig.tiny(in_channels=5)
            vcfg = vae_lib.VAEConfig.tiny()
            tcfg = CLIPTextConfig.tiny()
            latent_size, image_size = 16, 64
        else:
            # SD2-depth: 1024-dim text context
            ucfg = dataclasses.replace(UNetConfig.sd_v1(in_channels=5),
                                       cross_attention_dim=1024)
            vcfg = vae_lib.VAEConfig.sd_v1()
            tcfg = dataclasses.replace(CLIPTextConfig.vit_l_14(),
                                       hidden_size=1024, num_heads=16,
                                       intermediate_size=4096,
                                       num_layers=23)
            latent_size, image_size = 64, 512
        unet = UNet2DCondition(ucfg)
        vae = vae_lib.AutoencoderKL(vcfg)
        text = CLIPTextModel(tcfg)
        tokenizer = make_tokenizer(model_dir, vocab_size=tcfg.vocab_size,
                                   max_length=tcfg.max_length)
        if model_dir is not None:
            from tpunerf.guidance import weights
            unet_params, vae_params, text_params = weights.load_sd_params(
                model_dir, unet, vae, text)
        else:
            k1, k2, k3 = jax.random.split(key, 3)
            lat = jnp.zeros((1, latent_size, latent_size, 5))
            ctx = jnp.zeros((1, tcfg.max_length, ucfg.cross_attention_dim))
            unet_params = jax.jit(unet.init)(k1, lat,
                                             jnp.zeros((1,), jnp.int32),
                                             ctx)
            vae_params = jax.jit(vae.init)(
                k2, jnp.zeros((1, image_size, image_size, 3)),
                jax.random.key(0))
            text_params = jax.jit(text.init)(
                k3, jnp.zeros((1, tcfg.max_length), jnp.int32))
        inpaint_unet = inpaint_params = None
        if use_inpaint:
            icfg = dataclasses.replace(ucfg, in_channels=9)
            inpaint_unet = UNet2DCondition(icfg)
            if inpaint_model_dir is not None:
                from tpunerf.guidance import weights
                inpaint_params = weights.load_unet_params(
                    inpaint_model_dir, inpaint_unet)
            else:
                lat9 = jnp.zeros((1, latent_size, latent_size, 9))
                ctx = jnp.zeros((1, tcfg.max_length,
                                 ucfg.cross_attention_dim))
                inpaint_params = jax.jit(inpaint_unet.init)(
                    jax.random.fold_in(key, 9), lat9,
                    jnp.zeros((1,), jnp.int32), ctx)
        from tpunerf.guidance.unet import apply_unet_dtype
        unet, unet_params = apply_unet_dtype(unet, unet_params, unet_dtype)
        if inpaint_unet is not None:
            inpaint_unet, inpaint_params = apply_unet_dtype(
                inpaint_unet, inpaint_params, unet_dtype)
        sched = NoiseSchedule.scaled_linear()
        return cls(unet=unet, unet_params=unet_params, vae=vae,
                   vae_params=vae_params, text_encoder=text,
                   text_params=text_params, tokenizer=tokenizer, sched=sched,
                   min_step=int(1000 * min_step),
                   max_step=int(1000 * max_step),
                   latent_size=latent_size, image_size=image_size,
                   inpaint_unet=inpaint_unet,
                   inpaint_unet_params=inpaint_params)

    # ------------------------------------------------------------------ #
    def get_text_embeds(self, prompts: Sequence[str],
                        negative_prompts=None) -> jnp.ndarray:
        if isinstance(prompts, str):
            prompts = [prompts]
        if negative_prompts is None:
            negative_prompts = [""] * len(prompts)
        elif isinstance(negative_prompts, str):
            negative_prompts = [negative_prompts] * len(prompts)
        cond = self.text_encoder.apply(
            self.text_params, jnp.asarray(self.tokenizer(list(prompts))))
        uncond = self.text_encoder.apply(
            self.text_params,
            jnp.asarray(self.tokenizer(list(negative_prompts))))
        return jnp.concatenate([uncond, cond], axis=0)

    def _cfg_eps_depth(self, latents_noisy, depth64, t, text_embeddings,
                       guidance_scale):
        B = latents_noisy.shape[0]
        inp = jnp.concatenate([latents_noisy, depth64], axis=-1)
        eps = self.unet.apply(self.unet_params, jnp.concatenate([inp] * 2),
                              t, text_embeddings)
        eps_u, eps_c = eps[:B], eps[B:]
        return eps_u + guidance_scale * (eps_c - eps_u)

    def _cfg_eps_inpaint(self, latents_noisy, mask64, masked_latents, t,
                         text_embeddings, guidance_scale):
        """SD2-inpainting 9-ch UNet CFG pass: input channel order
        [latent, mask, masked-image latent] (reference
        stable_diffusion_depth.py:231-237)."""
        B = latents_noisy.shape[0]
        inp = jnp.concatenate([latents_noisy, mask64, masked_latents],
                              axis=-1)
        eps = self.inpaint_unet.apply(self.inpaint_unet_params,
                                      jnp.concatenate([inp] * 2), t,
                                      text_embeddings)
        eps_u, eps_c = eps[:B], eps[B:]
        return eps_u + guidance_scale * (eps_c - eps_u)

    def train_step_loss(self, key: jax.Array, text_embeddings: jnp.ndarray,
                        latents: jnp.ndarray, depth: jnp.ndarray,
                        guidance_scale: float = 100.0) -> jnp.ndarray:
        """SDS with depth conditioning; w = (1−ᾱ_t) (reference depth
        `train_step` :302-365 — internal-backward semantics reproduced by
        the Σ latents·sg(grad) identity); nan_to_num guard (ref :358)."""
        k_t, k_n = jax.random.split(key)
        t = sds_lib.sample_timestep(k_t, self.min_step, self.max_step)
        lat_sg = jax.lax.stop_gradient(latents)
        noise = jax.random.normal(k_n, lat_sg.shape)
        lat_noisy = self.sched.add_noise(lat_sg, noise, t)
        depth64 = jax.image.resize(
            depth, (*lat_sg.shape[:3], 1), method="bilinear")
        eps_hat = self._cfg_eps_depth(lat_noisy, depth64, t, text_embeddings,
                                      guidance_scale)
        w = self.sched.sds_weight(t, form="sigma2")
        grad = jax.lax.stop_gradient(
            sds_lib.nan_guard(w * (eps_hat - noise)))
        return jnp.sum(latents * grad)

    # ------------------------------------------------------------------ #
    def img2img_single_step(self, key: jax.Array, text_embeddings, latents,
                            depth64, step: int,
                            num_inference_steps: int = 50,
                            guidance_scale: float = 7.5
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """One noise→denoise refinement (reference `img2img_single_step`,
        :136-168): add noise to level t_step, predict, DDIM-step back.
        Returns (prev_sample, pred_x0)."""
        ts = ddim_timesteps(num_inference_steps)
        t = ts[step]
        noise = jax.random.normal(key, latents.shape)
        lat_noisy = self.sched.add_noise(latents, noise, t)
        eps = self._cfg_eps_depth(lat_noisy, depth64, t, text_embeddings,
                                  guidance_scale)
        out = ddim_step(self.sched, eps, t, lat_noisy, num_inference_steps)
        return out.prev_sample, out.pred_x0

    def img2img_step(self, key: jax.Array, text_embeddings, latents,
                     depth64, update_mask: Optional[jnp.ndarray] = None,
                     check_mask: Optional[jnp.ndarray] = None,
                     num_inference_steps: int = 50,
                     guidance_scale: float = 7.5,
                     strength: float = 0.8,
                     inpaint_lo: int = 10, inpaint_hi: int = 20,
                     check_mask_iters: float = 0.5,
                     masked_latents: Optional[jnp.ndarray] = None
                     ) -> jnp.ndarray:
        """Masked iterative img2img (reference `img2img_step` sample loop,
        stable_diffusion_depth.py:179-268): strength-truncated DDIM walk.

        Per step i (matching the reference's order of operations):
        * outside the inpaint window, the region where `curr_mask` is 0 is
          forced back to the re-noised original latents; curr_mask is
          `check_mask` for the first `check_mask_iters` fraction of steps,
          `update_mask` after (ref :216-222);
        * inside the window (inpaint_lo < i < inpaint_hi), when the
          9-channel SD2-inpainting UNet is constructed (`use_inpaint`) and
          `masked_latents` are given, the noise is predicted by that UNet on
          [latent, update_mask, masked_latents] instead of the depth UNet
          (ref :211,:229-237);
        * with `update_mask`, the walk starts from pure noise (ref :199-203).
        """
        ts, _ = strength_timesteps(num_inference_steps, strength)
        noise = jax.random.normal(key, latents.shape)
        if update_mask is not None:
            lat = jax.random.normal(jax.random.fold_in(key, 1),
                                    latents.shape)
        else:
            lat = self.sched.add_noise(latents, noise, ts[0])
        use_inpaint = (self.inpaint_unet is not None
                       and masked_latents is not None
                       and update_mask is not None)
        n_check = int(len(ts) * check_mask_iters)

        def body(carry, inp):
            lat, i = carry
            t = inp
            in_window = (i > inpaint_lo) & (i < inpaint_hi) \
                if use_inpaint else jnp.asarray(False)
            if update_mask is not None:
                noised_truth = self.sched.add_noise(latents, noise, t)
                if check_mask is not None:
                    curr_mask = jnp.where(i < n_check, check_mask,
                                          update_mask)
                else:
                    curr_mask = update_mask
                constrained = lat * curr_mask + noised_truth * (1 - curr_mask)
                lat = jnp.where(in_window, lat, constrained)

            if use_inpaint:
                eps = jax.lax.cond(
                    in_window,
                    lambda l: self._cfg_eps_inpaint(
                        l, update_mask, masked_latents, t, text_embeddings,
                        guidance_scale),
                    lambda l: self._cfg_eps_depth(
                        l, depth64, t, text_embeddings, guidance_scale),
                    lat)
            else:
                eps = self._cfg_eps_depth(lat, depth64, t, text_embeddings,
                                          guidance_scale)
            prev = ddim_step(self.sched, eps, t, lat,
                             num_inference_steps).prev_sample
            return (prev, i + 1), None

        (lat, _), _ = jax.lax.scan(body, (lat, jnp.asarray(0)), ts)
        return lat

    def prompt_to_img(self, key: jax.Array, prompts, depth: jnp.ndarray,
                      num_inference_steps: int = 50,
                      guidance_scale: float = 7.5) -> jnp.ndarray:
        """Depth-conditioned txt2img (reference :437-467)."""
        emb = self.get_text_embeds(prompts)
        B = emb.shape[0] // 2
        lat = jax.random.normal(
            key, (B, self.latent_size, self.latent_size, 4))
        depth64 = jax.image.resize(
            depth, (B, self.latent_size, self.latent_size, 1),
            method="bilinear")
        ts = ddim_timesteps(num_inference_steps)

        def body(lat, t):
            eps = self._cfg_eps_depth(lat, depth64, t, emb, guidance_scale)
            return ddim_step(self.sched, eps, t, lat,
                             num_inference_steps).prev_sample, None

        lat, _ = jax.lax.scan(body, lat, ts)
        return vae_lib.decode_latents(self.vae, self.vae_params, lat)

    def decode_latents(self, latents):
        return vae_lib.decode_latents(self.vae, self.vae_params, latents)

    def encode_imgs(self, imgs01, key):
        return vae_lib.encode_imgs(self.vae, self.vae_params, imgs01, key)

    def encode_masked_inputs(self, imgs01: jnp.ndarray,
                             update_mask: jnp.ndarray,
                             key: jax.Array) -> jnp.ndarray:
        """Masked-image latents for the inpaint UNet: the update region is
        filled with mid-grey before VAE encoding (reference
        stable_diffusion_depth.py:276-281)."""
        m512 = jax.image.resize(update_mask,
                                (*imgs01.shape[:3], 1), method="nearest")
        masked = jnp.where(m512 < 0.5, imgs01, 0.5)
        return vae_lib.encode_imgs(self.vae, self.vae_params, masked, key)
