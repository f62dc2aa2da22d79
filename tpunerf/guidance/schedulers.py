"""Diffusion noise schedules & samplers: DDPM tables, DDIM, DDIM-inverse, PNDM.

TPU-native, purely functional replacement for the diffusers schedulers the
reference instantiates (src/stable_diffusion.py:108-114 DDIMScheduler +
DDIMInverseScheduler; src/stable_diffusion_depth.py:66-68 PNDMScheduler;
src/paint_by_example.py:195-214 hand-rolled DDIM step). Tables are computed
from the Stable-Diffusion config (scaled_linear β ∈ [0.00085, 0.012], 1000
train steps) — constants verified against the closed form in tests.

Everything here is jnp on static shapes: schedules are precomputed arrays
indexed by traced timesteps, so the whole sampling loop jits/scans.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

NUM_TRAIN_TIMESTEPS = 1000
BETA_START = 0.00085
BETA_END = 0.012


@dataclasses.dataclass(frozen=True)
class NoiseSchedule:
    """Precomputed DDPM tables (the `alphas_cumprod` the reference keeps at
    stable_diffusion.py:114)."""
    betas: jnp.ndarray            # (T,)
    alphas: jnp.ndarray           # (T,)
    alphas_cumprod: jnp.ndarray   # (T,)
    num_train_timesteps: int = NUM_TRAIN_TIMESTEPS
    # diffusers DDIM default for SD: set_alpha_to_one=False → use ᾱ₀
    final_alpha_cumprod_is_one: bool = False

    @classmethod
    def scaled_linear(cls, num_train_timesteps: int = NUM_TRAIN_TIMESTEPS,
                      beta_start: float = BETA_START,
                      beta_end: float = BETA_END) -> "NoiseSchedule":
        sqrt_betas = jnp.linspace(beta_start ** 0.5, beta_end ** 0.5,
                                  num_train_timesteps, dtype=jnp.float32)
        betas = sqrt_betas ** 2
        alphas = 1.0 - betas
        return cls(betas=betas, alphas=alphas,
                   alphas_cumprod=jnp.cumprod(alphas),
                   num_train_timesteps=num_train_timesteps)

    @property
    def final_alpha_cumprod(self) -> jnp.ndarray:
        return (jnp.asarray(1.0, jnp.float32)
                if self.final_alpha_cumprod_is_one else self.alphas_cumprod[0])

    def add_noise(self, sample: jnp.ndarray, noise: jnp.ndarray,
                  t: jnp.ndarray) -> jnp.ndarray:
        """x_t = √ᾱ_t·x₀ + √(1−ᾱ_t)·ε (scheduler.add_noise,
        used at reference stable_diffusion.py:286)."""
        a = self.alphas_cumprod[t]
        a = a.reshape(a.shape + (1,) * (sample.ndim - a.ndim))
        return jnp.sqrt(a) * sample + jnp.sqrt(1.0 - a) * noise

    def sds_weight(self, t: jnp.ndarray, form: str = "sqrt") -> jnp.ndarray:
        """SDS weight w(t). 'sqrt': √ᾱ_t·(1−ᾱ_t) (reference
        stable_diffusion.py:320); 'sigma2': (1−ᾱ_t) (depth variant,
        stable_diffusion_depth.py:344)."""
        a = self.alphas_cumprod[t]
        if form == "sqrt":
            return jnp.sqrt(a) * (1.0 - a)
        if form == "sigma2":
            return 1.0 - a
        raise ValueError(form)

    def pred_x0_from_eps(self, x_t: jnp.ndarray, eps: jnp.ndarray,
                         t: jnp.ndarray) -> jnp.ndarray:
        a = self.alphas_cumprod[t]
        a = a.reshape(a.shape + (1,) * (x_t.ndim - a.ndim))
        return (x_t - jnp.sqrt(1.0 - a) * eps) / jnp.sqrt(a)


def ddim_timesteps(num_inference_steps: int,
                   num_train_timesteps: int = NUM_TRAIN_TIMESTEPS
                   ) -> jnp.ndarray:
    """Descending timestep grid (diffusers 'leading' spacing used by SD):
    t_i = (S−1−i)·(T//S) + 1 for i ascending (e.g. 50 steps: 981, 961, … 1)."""
    ratio = num_train_timesteps // num_inference_steps
    ts = (jnp.arange(num_inference_steps, dtype=jnp.int32)[::-1] * ratio) + 1
    return ts


class DDIMStepOutput(NamedTuple):
    prev_sample: jnp.ndarray
    pred_x0: jnp.ndarray


def ddim_step(sched: NoiseSchedule, eps: jnp.ndarray, t: jnp.ndarray,
              sample: jnp.ndarray, num_inference_steps: int,
              eta: float = 0.0) -> DDIMStepOutput:
    """Deterministic DDIM update x_t → x_{t−Δ} (ε-prediction, η = 0).

    Matches the DDIM step the reference drives through diffusers
    (produce_latents, stable_diffusion.py:416-458) and hand-rolls at
    paint_by_example.py:195-214.
    """
    step = sched.num_train_timesteps // num_inference_steps
    prev_t = t - step
    a_t = sched.alphas_cumprod[t]
    a_prev = jnp.where(prev_t >= 0, sched.alphas_cumprod[jnp.maximum(prev_t, 0)],
                       sched.final_alpha_cumprod)
    shape = (1,) * sample.ndim
    a_t = a_t.reshape(shape)
    a_prev = a_prev.reshape(shape)
    pred_x0 = (sample - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
    dir_xt = jnp.sqrt(1.0 - a_prev) * eps
    prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt
    return DDIMStepOutput(prev_sample=prev, pred_x0=pred_x0)


def ddim_inverse_step(sched: NoiseSchedule, eps: jnp.ndarray, t: jnp.ndarray,
                      sample: jnp.ndarray, num_inference_steps: int
                      ) -> DDIMStepOutput:
    """DDIM inversion update x_t → x_{t+Δ} (reference `invert`,
    stable_diffusion.py:587-645, via DDIMInverseScheduler)."""
    step = sched.num_train_timesteps // num_inference_steps
    prev_t = t  # current
    next_t = t + step
    a_t = jnp.where(prev_t >= 0, sched.alphas_cumprod[jnp.maximum(prev_t, 0)],
                    sched.final_alpha_cumprod)
    a_next = sched.alphas_cumprod[
        jnp.minimum(next_t, sched.num_train_timesteps - 1)]
    shape = (1,) * sample.ndim
    a_t = a_t.reshape(shape)
    a_next = a_next.reshape(shape)
    pred_x0 = (sample - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
    nxt = jnp.sqrt(a_next) * pred_x0 + jnp.sqrt(1.0 - a_next) * eps
    return DDIMStepOutput(prev_sample=nxt, pred_x0=pred_x0)


# ---------------------------------------------------------------------------
# PNDM (the depth-SD scheduler, reference stable_diffusion_depth.py:66-68).
# PLMS multistep: first step uses a Runge-Kutta-style prime step, later steps
# the 4th-order linear multistep combination of stored ε's.
# ---------------------------------------------------------------------------

class PNDMState(NamedTuple):
    ets: jnp.ndarray        # (4, *sample_shape) ring buffer of past ε
    counter: jnp.ndarray    # int32 number of completed steps
    cur_sample: jnp.ndarray


def pndm_init(sample_shape: Tuple[int, ...]) -> PNDMState:
    return PNDMState(ets=jnp.zeros((4, *sample_shape), jnp.float32),
                     counter=jnp.zeros((), jnp.int32),
                     cur_sample=jnp.zeros(sample_shape, jnp.float32))


def _pndm_prev_sample(sched: NoiseSchedule, sample, t, prev_t, eps):
    a_t = sched.alphas_cumprod[jnp.maximum(t, 0)]
    a_prev = jnp.where(prev_t >= 0,
                       sched.alphas_cumprod[jnp.maximum(prev_t, 0)],
                       sched.final_alpha_cumprod)
    shape = (1,) * sample.ndim
    a_t = a_t.reshape(shape)
    a_prev = a_prev.reshape(shape)
    # diffusers PNDM closed form
    sample_coeff = jnp.sqrt(a_prev / a_t)
    denom = a_t * jnp.sqrt(1.0 - a_prev) + jnp.sqrt(a_t * a_prev * (1.0 - a_t))
    return sample_coeff * sample - (a_prev - a_t) * eps / denom


def pndm_step(sched: NoiseSchedule, state: PNDMState, eps: jnp.ndarray,
              t: jnp.ndarray, sample: jnp.ndarray,
              num_inference_steps: int) -> Tuple[jnp.ndarray, PNDMState]:
    """One PLMS step (skip_prk_steps=True variant used by SD pipelines)."""
    step = sched.num_train_timesteps // num_inference_steps
    prev_t = t - step
    c = state.counter

    ets = jnp.where(c >= 0,  # always true; keeps shapes static
                    jnp.roll(state.ets, shift=1, axis=0).at[0].set(eps),
                    state.ets)

    e1 = ets[0]
    e2 = ets[1]
    e3 = ets[2]
    e4 = ets[3]
    eps_prime = jnp.where(
        c == 0, e1,
        jnp.where(c == 1, (e1 + e2) / 2.0,
                  jnp.where(c == 2, (23 * e1 - 16 * e2 + 5 * e3) / 12.0,
                            (55 * e1 - 59 * e2 + 37 * e3 - 9 * e4) / 24.0)))
    # diffusers with skip_prk_steps: the very first step reuses t→t−Δ directly
    prev = _pndm_prev_sample(sched, sample, t, prev_t, eps_prime)
    return prev, PNDMState(ets=ets, counter=c + 1, cur_sample=sample)


def strength_timesteps(num_inference_steps: int, strength: float,
                       num_train_timesteps: int = NUM_TRAIN_TIMESTEPS
                       ) -> Tuple[jnp.ndarray, int]:
    """img2img truncation (reference `get_timesteps`,
    stable_diffusion_depth.py:428-435): keep the last `strength` fraction."""
    ts = ddim_timesteps(num_inference_steps, num_train_timesteps)
    init_timestep = min(int(num_inference_steps * strength),
                        num_inference_steps)
    t_start = max(num_inference_steps - init_timestep, 0)
    return ts[t_start:], t_start
