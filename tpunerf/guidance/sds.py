"""Score Distillation Sampling (SDS / DDS) as pure-JAX custom gradients.

The reference implements SDS imperatively: UNet under `no_grad`, then
`latents.backward(gradient=w·(ε̂−ε))` injected by the caller
(src/stable_diffusion.py:248-334 + latent_paint_mesh/training/trainer.py:658).
TPU-native design (SURVEY.md §7 step 2): express the same pixel gradient as a
differentiable scalar

    loss = Σ latents · stop_gradient(w·(ε̂ − ε))

so `jax.grad` of the full render→loss composition injects exactly the
reference's gradient, and the *entire* training step jits into one XLA
program — no eager boundary between render, UNet, and backward.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from tpunerf.guidance.schedulers import NoiseSchedule


def sample_timestep(key: jax.Array, min_step: int, max_step: int
                    ) -> jnp.ndarray:
    """t ~ U{min_step, …, max_step} (reference stable_diffusion.py:274)."""
    return jax.random.randint(key, (), min_step, max_step + 1)


def cfg_eps(unet_apply: Callable, latents_noisy: jnp.ndarray, t: jnp.ndarray,
            text_embeddings: jnp.ndarray, guidance_scale: float
            ) -> jnp.ndarray:
    """Classifier-free-guided ε̂: batched [uncond; cond] UNet pass
    (reference stable_diffusion.py:288-298).

    text_embeddings is (2B, L, D) with the uncond half first.
    """
    B = latents_noisy.shape[0]
    latent_model_input = jnp.concatenate([latents_noisy] * 2)
    eps = unet_apply(latent_model_input, t, text_embeddings)
    eps_uncond, eps_text = eps[:B], eps[B:]
    return eps_uncond + guidance_scale * (eps_text - eps_uncond)


def score_gradient(unet_apply: Callable, sched: NoiseSchedule, key: jax.Array,
                   latents: jnp.ndarray, text_embeddings: jnp.ndarray,
                   guidance_scale: float = 100.0,
                   min_step: int = 20, max_step: int = 980,
                   weight_form: str = "sqrt"
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The raw SDS pixel gradient w·(ε̂ − ε), plus the sampled t.

    Everything is stop-gradiented — this is the quantity the reference's
    `train_step` returns (stable_diffusion.py:320-334).
    """
    k_t, k_n = jax.random.split(key)
    t = sample_timestep(k_t, min_step, max_step)
    latents_sg = jax.lax.stop_gradient(latents)
    noise = jax.random.normal(k_n, latents_sg.shape)
    latents_noisy = sched.add_noise(latents_sg, noise, t)
    eps_hat = cfg_eps(unet_apply, latents_noisy, t, text_embeddings,
                      guidance_scale)
    w = sched.sds_weight(t, form=weight_form)
    grad = w * (eps_hat - noise)
    return jax.lax.stop_gradient(grad), t


def sds_loss(unet_apply: Callable, sched: NoiseSchedule, key: jax.Array,
             latents: jnp.ndarray, text_embeddings: jnp.ndarray,
             guidance_scale: float = 100.0, min_step: int = 20,
             max_step: int = 980, weight_form: str = "sqrt") -> jnp.ndarray:
    """Scalar whose gradient w.r.t. `latents` is exactly w·(ε̂ − ε)."""
    grad, _ = score_gradient(unet_apply, sched, key, latents, text_embeddings,
                             guidance_scale, min_step, max_step, weight_form)
    return jnp.sum(latents * grad)


def dds_loss(unet_apply: Callable, sched: NoiseSchedule, key: jax.Array,
             latents: jnp.ndarray, ref_latents: jnp.ndarray,
             text_embeddings: jnp.ndarray, ref_text_embeddings: jnp.ndarray,
             guidance_scale: float = 7.5, min_step: int = 20,
             max_step: int = 980) -> jnp.ndarray:
    """Delta Denoising Score (reference `train_step_delta`,
    stable_diffusion.py:336-414): the reference branch's score is subtracted,
    cancelling the prompt-independent bias: grad = w·(ε̂ − ε̂_ref).

    Shares noise and timestep across both branches.
    """
    k_t, k_n = jax.random.split(key)
    t = sample_timestep(k_t, min_step, max_step)
    lat_sg = jax.lax.stop_gradient(latents)
    ref_sg = jax.lax.stop_gradient(ref_latents)
    noise = jax.random.normal(k_n, lat_sg.shape)
    eps_cur = cfg_eps(unet_apply, sched.add_noise(lat_sg, noise, t), t,
                      text_embeddings, guidance_scale)
    eps_ref = cfg_eps(unet_apply, sched.add_noise(ref_sg, noise, t), t,
                      ref_text_embeddings, guidance_scale)
    w = sched.sds_weight(t, form="sqrt")
    grad = jax.lax.stop_gradient(w * (eps_cur - eps_ref))
    return jnp.sum(latents * grad)


def nan_guard(grad: jnp.ndarray) -> jnp.ndarray:
    """`nan_to_num` guard the reference applies at
    stable_diffusion_depth.py:358 / paint_by_example.py:672."""
    return jnp.nan_to_num(grad)
