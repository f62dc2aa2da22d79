"""StableDiffusion guidance backend — text-conditioned SDS, samplers, inversion.

TPU-native re-design of the reference's `StableDiffusion` nn.Module
(src/stable_diffusion.py:49-667): same capability surface —

* CFG text embeddings (`get_text_embeds`, ref :161-189)
* SDS `train_step` and DDS `train_step_delta` (ref :248-414) — here exposed
  as jit-friendly *loss functions* (see guidance/sds.py for why)
* DDIM sampling with start-index skip (`produce_latents`, ref :416-458)
* VAE encode/decode with 0.18215 scaling (ref :462-489)
* DDIM inversion (`invert`, ref :587-645) and null-text inversion
  (`null_optimization`, ref :511-585)
* textual-inversion concept tokens (`load_concept`, ref :130-159)
* latent→RGB linear preview matrix (ref :116-122)

All hot paths are pure functions over (params, inputs, PRNG-key); the class
is a thin container binding module definitions to parameters.
"""
from __future__ import annotations

import dataclasses
import functools
from pathlib import Path
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpunerf.guidance import sds as sds_lib
from tpunerf.guidance import vae as vae_lib
from tpunerf.guidance.clip_text import (CLIPTextConfig, CLIPTextModel,
                                        make_tokenizer)
from tpunerf.guidance.schedulers import (NoiseSchedule, ddim_inverse_step,
                                         ddim_step, ddim_timesteps)
from tpunerf.guidance.unet import UNet2DCondition, UNetConfig

# Fixed 4×3 latent→RGB preview (reference stable_diffusion.py:116-122).
# Plain numpy on purpose: module-level jnp constants become leaked tracers
# when the module is first imported inside a jit trace (tests/test_import_in_trace.py).
LINEAR_RGB_ESTIMATOR = np.array([
    #   R       G       B
    [0.298, 0.207, 0.208],    # L1
    [0.187, 0.286, 0.173],    # L2
    [-0.158, 0.189, 0.264],   # L3
    [-0.184, -0.271, -0.473], # L4
], np.float32)

# "grey" latent constant (reference stable_diffusion.py:101-103).
LATENT_GRAY = np.array([0.9071, -0.7711, 0.7437, 0.1510], np.float32)


def latent_to_rgb_preview(latents: jnp.ndarray) -> jnp.ndarray:
    """Cheap latent→RGB linear preview, NHWC (..., 4) → (..., 3)."""
    return latents @ LINEAR_RGB_ESTIMATOR


def rgb_to_latent_init(rgb: jnp.ndarray, regularizer: float = 1e-2
                       ) -> jnp.ndarray:
    """Ridge-regularized pseudo-inverse of the preview matrix — the latent
    that previews as `rgb` (reference textured_mesh.py:65-68)."""
    A = LINEAR_RGB_ESTIMATOR.T                     # (3, 4)
    M = jnp.linalg.pinv(A.T @ A + regularizer * jnp.eye(4)) @ A.T
    return rgb @ M.T


@dataclasses.dataclass
class StableDiffusionGuidance:
    unet: UNet2DCondition
    unet_params: Any
    vae: vae_lib.AutoencoderKL
    vae_params: Any
    text_encoder: CLIPTextModel
    text_params: Any
    tokenizer: Any
    sched: NoiseSchedule
    latent_mode: bool = True
    min_step: int = 20            # int(1000·0.02), reference sd.py:71
    max_step: int = 980           # int(1000·0.98), reference sd.py:72
    latent_size: int = 64
    image_size: int = 512

    # ------------------------------------------------------------------ #
    # construction
    # ------------------------------------------------------------------ #
    @classmethod
    def create(cls, key: jax.Array, tiny: bool = False,
               model_dir: Optional[Path] = None, in_channels: int = 4,
               latent_mode: bool = True, min_step: float = 0.02,
               max_step: float = 0.98, dtype=jnp.float32,
               unet_dtype: str = "float32") -> "StableDiffusionGuidance":
        """Build modules; load converted SD weights from `model_dir` when
        given (guidance/weights.py layout), else initialize randomly.

        `tiny=True` builds the structurally identical miniature used by the
        test pyramid (SURVEY.md §4 "mocked UNet with the real API").

        `unet_dtype` is the `guide.unet_dtype` weight/compute policy for
        the (frozen) UNet — see guidance/unet.py:apply_unet_dtype. The VAE
        and text encoder stay in `dtype` (f32 default: the text encoder
        runs once at startup, and the VAE carries eval-image quality and
        the RGB-mode encode gradients)."""
        if tiny:
            ucfg = UNetConfig.tiny(in_channels=in_channels, dtype=dtype)
            vcfg = vae_lib.VAEConfig.tiny(dtype=dtype)
            tcfg = CLIPTextConfig.tiny(dtype=dtype)
            latent_size, image_size = 16, 64
        else:
            ucfg = UNetConfig.sd_v1(in_channels=in_channels, dtype=dtype)
            vcfg = vae_lib.VAEConfig.sd_v1(dtype=dtype)
            tcfg = CLIPTextConfig.vit_l_14(dtype=dtype)
            latent_size, image_size = 64, 512

        unet = UNet2DCondition(ucfg)
        vae = vae_lib.AutoencoderKL(vcfg)
        text = CLIPTextModel(tcfg)
        tokenizer = make_tokenizer(model_dir, vocab_size=tcfg.vocab_size,
                                   max_length=tcfg.max_length)

        if model_dir is not None:
            from tpunerf.guidance import weights
            unet_params, vae_params, text_params = weights.load_sd_params(
                Path(model_dir), unet, vae, text)
        else:
            k1, k2, k3 = jax.random.split(key, 3)
            lat = jnp.zeros((1, latent_size, latent_size, in_channels))
            ctx = jnp.zeros((1, tcfg.max_length, ucfg.cross_attention_dim))
            unet_params = jax.jit(unet.init)(k1, lat,
                                             jnp.zeros((1,), jnp.int32),
                                             ctx)
            img = jnp.zeros((1, image_size, image_size, 3))
            vae_params = jax.jit(vae.init)(k2, img, jax.random.key(0))
            ids = jnp.zeros((1, tcfg.max_length), jnp.int32)
            text_params = jax.jit(text.init)(k3, ids)

        from tpunerf.guidance.unet import apply_unet_dtype
        unet, unet_params = apply_unet_dtype(unet, unet_params, unet_dtype)

        sched = NoiseSchedule.scaled_linear()
        return cls(unet=unet, unet_params=unet_params, vae=vae,
                   vae_params=vae_params, text_encoder=text,
                   text_params=text_params, tokenizer=tokenizer, sched=sched,
                   latent_mode=latent_mode,
                   min_step=int(sched.num_train_timesteps * min_step),
                   max_step=int(sched.num_train_timesteps * max_step),
                   latent_size=latent_size, image_size=image_size)

    # ------------------------------------------------------------------ #
    # text
    # ------------------------------------------------------------------ #
    def unet_apply(self, latents, t, context):
        return self.unet.apply(self.unet_params, latents, t, context)

    def encode_text_ids(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        return self.text_encoder.apply(self.text_params, input_ids)

    def get_text_embeds(self, prompts: Sequence[str],
                        negative_prompts: Optional[Sequence[str]] = None
                        ) -> jnp.ndarray:
        """[uncond; cond] (2B, L, D) CFG pair (reference sd.py:161-189).
        `negative_prompts` replaces the empty-string uncond branch
        (`guide.append_neg_text` capability)."""
        if isinstance(prompts, str):
            prompts = [prompts]
        if negative_prompts is None:
            negative_prompts = [""] * len(prompts)
        elif isinstance(negative_prompts, str):
            negative_prompts = [negative_prompts] * len(prompts)
        cond_ids = jnp.asarray(self.tokenizer(list(prompts)))
        uncond_ids = jnp.asarray(self.tokenizer(list(negative_prompts)))
        cond = self.encode_text_ids(cond_ids)
        uncond = self.encode_text_ids(uncond_ids)
        return jnp.concatenate([uncond, cond], axis=0)

    def embeds_to_img(self, key: jax.Array, text_embeddings: jnp.ndarray,
                      num_inference_steps: int = 50,
                      guidance_scale: float = 7.5,
                      latents: Optional[jnp.ndarray] = None,
                      start: int = 0) -> jnp.ndarray:
        """Text embeddings → decoded [0,1] images (reference `embeds_to_img`,
        sd.py:223-246). Differentiable end-to-end (the `out_tensor=True`
        'decode_latents_grad' variant is the default here — everything is a
        pure function)."""
        lat = self.produce_latents(key, text_embeddings, num_inference_steps,
                                   guidance_scale, latents=latents,
                                   start=start)
        return self.decode_latents(lat)

    def load_concept(self, token: str, embedding: np.ndarray) -> None:
        """Textual inversion (reference `load_concept`, sd.py:130-159): add
        `token` to the tokenizer, resize the token-embedding table
        (`resize_token_embeddings` equivalent) and install the learned row."""
        self.tokenizer.add_token(token)
        emb = self.text_params["params"]["token_embedding"]["embedding"]
        emb = jnp.concatenate([emb, jnp.asarray(embedding)[None]], axis=0)
        self.text_params = jax.tree_util.tree_map(lambda x: x, self.text_params)
        self.text_params["params"]["token_embedding"]["embedding"] = emb
        new_cfg = dataclasses.replace(self.text_encoder.config,
                                      vocab_size=emb.shape[0])
        self.text_encoder = CLIPTextModel(new_cfg)

    def load_concept_dir(self, concept_dir: Path) -> str:
        """Load an sd-concepts-library checkpoint directory
        (`learned_embeds.bin` + `token_identifier.txt` — the files the
        reference pulls from the hub at sd.py:130-137). Returns the token."""
        concept_dir = Path(concept_dir)
        token = (concept_dir / "token_identifier.txt").read_text().strip()
        import torch
        learned = torch.load(concept_dir / "learned_embeds.bin",
                             map_location="cpu", weights_only=True)
        trained_token = list(learned.keys())[0]
        self.load_concept(token, learned[trained_token].numpy())
        return token

    def maybe_load_concept(self, concept_name) -> Optional[str]:
        """cfg-driven textual-inversion hook, shared by every app (the
        reference loads concepts inside StableDiffusion.__init__, sd.py:91,
        so all trainers get them): `concept_name` is a concept directory
        path; no-op when unset or missing."""
        if not concept_name:
            return None
        cdir = Path(concept_name)
        if cdir.is_dir():
            return self.load_concept_dir(cdir)
        return None

    # ------------------------------------------------------------------ #
    # SDS / DDS (jit-friendly loss functions)
    # ------------------------------------------------------------------ #
    def train_step_loss(self, key: jax.Array, text_embeddings: jnp.ndarray,
                        inputs: jnp.ndarray, guidance_scale: float = 100.0,
                        rgb_rng: Optional[jax.Array] = None) -> jnp.ndarray:
        """SDS loss on rendered latents (latent_mode) or RGB renders
        (encode through the VAE first — reference sd.py:265-270).

        d(loss)/d(inputs) reproduces the reference's injected
        `backward(gradient=w·(ε̂−ε))` exactly (upstream-correct semantics;
        the fork's latent_paint trainer dropped the backward — SURVEY.md
        Appendix A)."""
        if self.latent_mode:
            latents = inputs
        else:
            rgb = jax.image.resize(
                inputs, (inputs.shape[0], self.image_size, self.image_size,
                         inputs.shape[-1]), method="bilinear")
            latents = vae_lib.encode_imgs(
                self.vae, self.vae_params, rgb,
                rgb_rng if rgb_rng is not None else key)
        return sds_lib.sds_loss(self.unet_apply, self.sched, key, latents,
                                text_embeddings, guidance_scale,
                                self.min_step, self.max_step)

    def train_step_delta_loss(self, key, text_embeddings, inputs,
                              ref_inputs, ref_text_embeddings,
                              guidance_scale: float = 7.5) -> jnp.ndarray:
        return sds_lib.dds_loss(self.unet_apply, self.sched, key, inputs,
                                ref_inputs, text_embeddings,
                                ref_text_embeddings, guidance_scale,
                                self.min_step, self.max_step)

    # ------------------------------------------------------------------ #
    # sampling / inversion
    # ------------------------------------------------------------------ #
    def produce_latents(self, key: jax.Array, text_embeddings: jnp.ndarray,
                        num_inference_steps: int = 50,
                        guidance_scale: float = 7.5,
                        latents: Optional[jnp.ndarray] = None,
                        start: int = 0) -> jnp.ndarray:
        """DDIM sampling loop as a lax.scan (reference `produce_latents`,
        sd.py:416-458, incl. the `start`-index skip)."""
        B = text_embeddings.shape[0] // 2
        if latents is None:
            latents = jax.random.normal(
                key, (B, self.latent_size, self.latent_size, 4))
        ts = ddim_timesteps(num_inference_steps)[start:]

        def body(lat, t):
            eps = sds_lib.cfg_eps(self.unet_apply, lat, t, text_embeddings,
                                  guidance_scale)
            return ddim_step(self.sched, eps, t, lat,
                             num_inference_steps).prev_sample, None

        latents, _ = jax.lax.scan(body, latents, ts)
        return latents

    def invert(self, latents: jnp.ndarray, text_embeddings: jnp.ndarray,
               num_inference_steps: int = 50) -> jnp.ndarray:
        """DDIM inversion x₀ → x_T trajectory; returns all intermediate
        latents (reference `invert`, sd.py:587-645). CFG scale 1 (uncond
        branch unused during inversion)."""
        ts = ddim_timesteps(num_inference_steps)[::-1]  # ascending
        B = latents.shape[0]
        cond = text_embeddings[text_embeddings.shape[0] // 2:]

        def body(lat, t):
            eps = self.unet_apply(lat, t, cond)
            nxt = ddim_inverse_step(self.sched, eps, t, lat,
                                    num_inference_steps).prev_sample
            return nxt, nxt

        _, traj = jax.lax.scan(body, latents, ts)
        return traj  # (S, B, h, w, 4)

    def null_optimization(self, latents_traj: jnp.ndarray,
                          text_embeddings: jnp.ndarray,
                          num_inference_steps: int = 50,
                          num_inner_steps: int = 10,
                          lr: float = 1e-2,
                          guidance_scale: float = 7.5) -> jnp.ndarray:
        """Null-text inversion (reference `null_optimization`, sd.py:511-585):
        per-timestep optimize the uncond embedding so CFG sampling retraces
        the inversion trajectory. Returns (S, L, D) optimized embeddings."""
        import optax

        B = text_embeddings.shape[0] // 2
        uncond0 = text_embeddings[:B]
        cond = text_embeddings[B:]
        ts = ddim_timesteps(num_inference_steps)
        opt = optax.adam(lr)

        @jax.jit
        def inner(uncond, lat_cur, lat_target, t):
            state = opt.init(uncond)

            def step(carry, _):
                u, s = carry

                def loss_fn(u):
                    emb = jnp.concatenate([u, cond], axis=0)
                    eps = sds_lib.cfg_eps(self.unet_apply, lat_cur, t, emb,
                                          guidance_scale)
                    prev = ddim_step(self.sched, eps, t, lat_cur,
                                     num_inference_steps).prev_sample
                    return jnp.mean((prev - lat_target) ** 2)

                g = jax.grad(loss_fn)(u)
                upd, s = opt.update(g, s)
                return (optax.apply_updates(u, upd), s), None

            (u, _), _ = jax.lax.scan(step, (uncond, state),
                                     None, length=num_inner_steps)
            emb = jnp.concatenate([u, cond], axis=0)
            eps = sds_lib.cfg_eps(self.unet_apply, lat_cur, t, emb,
                                  guidance_scale)
            lat_prev = ddim_step(self.sched, eps, t, lat_cur,
                                 num_inference_steps).prev_sample
            return u, lat_prev

        # trajectory is ascending in t; walk it back down
        lat_cur = latents_traj[-1]
        uncond = uncond0
        out = []
        for i, t in enumerate(np.asarray(ts)):
            target_idx = len(ts) - 2 - i
            lat_target = (latents_traj[target_idx] if target_idx >= 0
                          else latents_traj[0])
            uncond, lat_cur = inner(uncond, lat_cur, lat_target,
                                    jnp.asarray(t))
            out.append(uncond)
        return jnp.stack(out)

    # ------------------------------------------------------------------ #
    # VAE plumbing
    # ------------------------------------------------------------------ #
    def decode_latents(self, latents: jnp.ndarray) -> jnp.ndarray:
        return vae_lib.decode_latents(self.vae, self.vae_params, latents)

    def encode_imgs(self, imgs01: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        return vae_lib.encode_imgs(self.vae, self.vae_params, imgs01, key)

    def encode_imgs_mode(self, imgs01: jnp.ndarray) -> jnp.ndarray:
        return vae_lib.encode_imgs_mode(self.vae, self.vae_params, imgs01)

    def prompt_to_img(self, key: jax.Array, prompts: Sequence[str],
                      num_inference_steps: int = 50,
                      guidance_scale: float = 7.5) -> np.ndarray:
        """txt2img smoke test (reference sd.py:491-509)."""
        emb = self.get_text_embeds(prompts)
        lat = self.produce_latents(key, emb, num_inference_steps,
                                   guidance_scale)
        imgs = self.decode_latents(lat)
        return np.asarray(jnp.round(imgs * 255).astype(jnp.uint8))
