"""Flax UNet2DCondition — the Stable-Diffusion ε-prediction backbone.

TPU-native implementation of the architecture the reference consumes through
diffusers (src/stable_diffusion.py:106 `UNet2DConditionModel.from_pretrained`;
depth variant with 5-channel input at stable_diffusion_depth.py:341-344;
Paint-by-Example with 9-channel input at paint_by_example.py:643-646 — both
are just `in_channels` here).

Layout is NHWC (TPU conv-native); compute dtype is configurable via
`UNetConfig.dtype` (defaults fp32; the `guide.unet_dtype` bf16
weight+compute policy — `apply_unet_dtype` below — measured +3.3% on the
SDS step and −1.6 GB of HBM: the pass is attention/MXU-bound, not
weight-HBM-bound — BASELINE.md §3 "UNet-side speed-of-light"). The module
tree is written so a diffusers/torch checkpoint maps 1:1 through
guidance/weights.py.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    attention_num_heads: int = 8
    norm_num_groups: int = 32
    # which down/up blocks carry cross-attention transformers; SD v1:
    # down (T, T, T, F), up (F, T, T, T)
    down_block_has_attn: Tuple[bool, ...] = (True, True, True, False)
    up_block_has_attn: Tuple[bool, ...] = (False, True, True, True)
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def sd_v1(cls, in_channels: int = 4, out_channels: int = 4,
              dtype=jnp.float32) -> "UNetConfig":
        """in_channels 4 = SD v1; 5 = depth-conditioned; 9 = inpaint/PbE
        (reference stable_diffusion_depth.py:341-344,
        paint_by_example.py:643-646). ε output is always 4-channel."""
        return cls(in_channels=in_channels, out_channels=out_channels,
                   dtype=dtype)

    @classmethod
    def tiny(cls, in_channels: int = 4, out_channels: int = 4,
             cross_attention_dim: int = 32, dtype=jnp.float32) -> "UNetConfig":
        """A structurally identical miniature for tests and the mocked-UNet
        SDS plumbing (SURVEY.md §4)."""
        return cls(in_channels=in_channels, out_channels=out_channels,
                   block_out_channels=(32, 64), layers_per_block=1,
                   cross_attention_dim=cross_attention_dim,
                   attention_num_heads=4, norm_num_groups=8,
                   down_block_has_attn=(True, False),
                   up_block_has_attn=(False, True), dtype=dtype)


def apply_unet_dtype(unet: "UNet2DCondition", unet_params,
                     unet_dtype: str = "float32"):
    """Apply the `guide.unet_dtype` weight/compute policy to a built UNet.

    "auto" = bfloat16 on TPU / float32 elsewhere (utils.resolve_dtype). For
    bfloat16, BOTH the stored weights and the compute dtype are cast: the
    UNet is frozen under SDS (the score is stop-gradiented —
    guidance/sds.py), so there is no f32 master copy to keep, and an f32
    859M-param UNet reads ~3.4 GB of weights per CFG step (~4.2 ms of HBM
    at 819 GB/s) that the bf16 copy halves. Statistics stay exact: flax
    norm layers compute mean/var in f32, flash attention runs f32, the
    timestep table is built f32, and the ε output is cast back to f32.
    Divergence bound vs f32 is regression-tested in
    tests/test_guidance.py; PARITY.md pins float32 for the reference
    allclose gate."""
    from tpunerf.utils.misc import resolve_dtype
    dt = resolve_dtype(unet_dtype)
    if dt == jnp.float32 or unet_params is None:
        return unet, unet_params
    unet = UNet2DCondition(dataclasses.replace(unet.config, dtype=dt))
    unet_params = jax.tree_util.tree_map(
        lambda x: x.astype(dt)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
        unet_params)
    return unet, unet_params


def timestep_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Sinusoidal embedding, diffusers convention (flip_sin_to_cos=True,
    downscale_freq_shift=0) → [cos | sin]."""
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half, dtype=jnp.float32)
                    / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class TimestepEmbedding(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, temb):
        temb = nn.Dense(self.dim, dtype=self.dtype, name="linear_1")(temb)
        temb = nn.silu(temb)
        return nn.Dense(self.dim, dtype=self.dtype, name="linear_2")(temb)


class ResnetBlock(nn.Module):
    out_channels: int
    groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                         dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype,
                     name="time_emb_proj")(nn.silu(temb))
        h = h + t[:, None, None, :]
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                         dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


def _flash_sdpa(q, k, v, head_dim):
    """Fused Pallas flash attention for long self-attention.

    The naive formulation materializes the (B, H, N, N) matrix in HBM —
    at the UNet's 64² resolution that is 2×8×4096² f32 ≈ 2.1 GB per layer,
    making those layers HBM-bound (~5 ms measured). The fused kernel keeps
    the softmax online in VMEM: 1.55 ms with 1024-wide q/k blocks (measured
    v5e; the default block sizes run 8.6 ms — slower than naive). head_dim
    is zero-padded to the 128-lane width: zero k/q columns leave the logits
    unchanged and zero v columns are sliced off."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention, BlockSizes)
    *_, N, D = q.shape
    # scoped-VMEM budget: 1024-wide blocks overflow the 16 MB stack once
    # the (padded) head dim exceeds 128 (observed: D=512 VAE attention
    # crashed compile at 19 MB) — scale the block width down with D
    d_pad = D + (-D) % 128
    blk = min(N, max(256, 1024 * 128 // d_pad))
    blk_bwd = min(N, max(256, 512 * 128 // d_pad))
    bs = BlockSizes(
        block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
        block_q_major_dkv=blk_bwd, block_k_major_dkv=blk_bwd,
        block_k_dkv=blk_bwd, block_q_dkv=blk_bwd,
        block_k_major_dq=blk_bwd, block_k_dq=blk_bwd, block_q_dq=blk_bwd)
    pad = (-D) % 128
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, pad)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, pad)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, pad)))
    out = flash_attention(qp * (head_dim ** -0.5), kp, vp, causal=False,
                          block_sizes=bs)
    return out[..., :D]


# fused path threshold: at N=4096 flash wins 3.2×; at N ≤ 1024 the naive
# matrix fits cache-friendly tiles and the kernel's fixed costs lose
_FLASH_MIN_SEQ = 2048


class Attention(nn.Module):
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        is_self = context is None
        context = x if context is None else context
        inner = x.shape[-1]
        head_dim = inner // self.num_heads
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     name="to_v")(context)

        def split(t):
            B, N, _ = t.shape
            return t.reshape(B, N, self.num_heads, head_dim).transpose(
                0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        if (is_self and q.shape[-2] >= _FLASH_MIN_SEQ
                and q.shape[-2] % 1024 == 0
                and jax.default_backend() == "tpu"):
            # bf16 policy: feed the kernel bf16 q/k/v (QK logits still
            # accumulate f32 inside flash); f32 stays f32
            dt = jnp.float32 if v.dtype == jnp.float32 else jnp.bfloat16
            out = _flash_sdpa(q.astype(dt), k.astype(dt),
                              v.astype(dt), head_dim
                              ).astype(v.dtype)
        else:
            attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                              preferred_element_type=jnp.float32)
            attn = jax.nn.softmax(attn * (head_dim ** -0.5), axis=-1)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v)
        B, H, N, D = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(B, N, H * D)
        return nn.Dense(inner, dtype=self.dtype, name="to_out")(out)


class FeedForwardGEGLU(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = x.shape[-1] * 4
        h = nn.Dense(inner * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate)
        return nn.Dense(x.shape[-1], dtype=self.dtype, name="out")(h)


class BasicTransformerBlock(nn.Module):
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        x = x + Attention(self.num_heads, self.dtype, name="attn1")(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x))
        x = x + Attention(self.num_heads, self.dtype, name="attn2")(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x), context)
        x = x + FeedForwardGEGLU(self.dtype, name="ff")(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x))
        return x


class Transformer2D(nn.Module):
    num_heads: int
    groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        B, H, W, C = x.shape
        res = x
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                         dtype=self.dtype, name="norm")(x)
        h = nn.Conv(C, (1, 1), dtype=self.dtype, name="proj_in")(h)
        h = h.reshape(B, H * W, C)
        h = BasicTransformerBlock(self.num_heads, self.dtype,
                                  name="block_0")(h, context)
        h = h.reshape(B, H, W, C)
        h = nn.Conv(C, (1, 1), dtype=self.dtype, name="proj_out")(h)
        return h + res


class Downsample(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # diffusers pads (0,1)×(0,1) then strides 2
        return nn.Conv(self.channels, (3, 3), strides=2,
                       padding=((0, 1), (0, 1)), dtype=self.dtype,
                       name="conv")(x)


class Upsample(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
        return nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv")(x)


class UNet2DCondition(nn.Module):
    config: UNetConfig

    @nn.compact
    def __call__(self, sample: jnp.ndarray, timesteps: jnp.ndarray,
                 encoder_hidden_states: jnp.ndarray) -> jnp.ndarray:
        """sample (B, H, W, C_in), timesteps (B,) or scalar,
        encoder_hidden_states (B, L, D_ctx) → ε (B, H, W, C_out)."""
        cfg = self.config
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
        ch0 = cfg.block_out_channels[0]
        temb = timestep_embedding(timesteps, ch0)
        temb = TimestepEmbedding(ch0 * 4, cfg.dtype, name="time_embedding")(
            temb.astype(cfg.dtype))

        sample = sample.astype(cfg.dtype)
        encoder_hidden_states = encoder_hidden_states.astype(cfg.dtype)

        h = nn.Conv(ch0, (3, 3), padding=1, dtype=cfg.dtype,
                    name="conv_in")(sample)
        skips = [h]

        # ---- down path ----
        n_blocks = len(cfg.block_out_channels)
        for i, out_ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = ResnetBlock(out_ch, cfg.norm_num_groups, cfg.dtype,
                                name=f"down_{i}_res_{j}")(h, temb)
                if cfg.down_block_has_attn[i]:
                    h = Transformer2D(cfg.attention_num_heads,
                                      cfg.norm_num_groups, cfg.dtype,
                                      name=f"down_{i}_attn_{j}")(
                                          h, encoder_hidden_states)
                skips.append(h)
            if i < n_blocks - 1:
                h = Downsample(out_ch, cfg.dtype, name=f"down_{i}_downsample")(h)
                skips.append(h)

        # ---- mid ----
        mid_ch = cfg.block_out_channels[-1]
        h = ResnetBlock(mid_ch, cfg.norm_num_groups, cfg.dtype,
                        name="mid_res_0")(h, temb)
        h = Transformer2D(cfg.attention_num_heads, cfg.norm_num_groups,
                          cfg.dtype, name="mid_attn")(h, encoder_hidden_states)
        h = ResnetBlock(mid_ch, cfg.norm_num_groups, cfg.dtype,
                        name="mid_res_1")(h, temb)

        # ---- up path ----
        rev_channels = tuple(reversed(cfg.block_out_channels))
        for i, out_ch in enumerate(rev_channels):
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResnetBlock(out_ch, cfg.norm_num_groups, cfg.dtype,
                                name=f"up_{i}_res_{j}")(h, temb)
                if cfg.up_block_has_attn[i]:
                    h = Transformer2D(cfg.attention_num_heads,
                                      cfg.norm_num_groups, cfg.dtype,
                                      name=f"up_{i}_attn_{j}")(
                                          h, encoder_hidden_states)
            if i < n_blocks - 1:
                h = Upsample(out_ch, cfg.dtype, name=f"up_{i}_upsample")(h)

        h = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-5,
                         dtype=cfg.dtype, name="conv_norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=cfg.dtype,
                    name="conv_out")(h)
        return h.astype(jnp.float32)
