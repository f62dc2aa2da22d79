"""Latent-NeRF field: hash-grid encoder + MLP heads emitting 4-ch SD latents.

Reconstructs the upstream `src/latent_nerf/` volumetric capability that is
absent from the reference fork (SURVEY.md §0, §2.5): a torch-ngp-style
hash-grid NeRF whose radiance head outputs the 4-channel Stable-Diffusion
latent (`nerf_type: latent`) or RGB (`nerf_type: rgb` refinement stage),
following the stable-dreamfusion lineage (reference README.md:163).

Density activation is trunc_exp (exp with a clamped-gradient custom VJP —
torch-ngp's numerically stable choice). The field also carries a learned
direction-conditioned background MLP.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpunerf.fields.encoding import (HashGridConfig, hash_encode,
                                     init_hash_table, sh_encode)


@jax.custom_vjp
def trunc_exp(x):
    # Forward clamped like the backward: unclamped exp overflows f32 at
    # x≈88.7 and an inf σ NaNs the compositing fwd AND grads (reproduced
    # in the r4 production run: random-weight SDS drift pushed the σ head
    # past 88 by step ~100). e¹⁵ ≈ 3.3e6 already saturates alpha at any
    # reachable dt, so the clamp is semantically free; torch-ngp's
    # trunc_exp clamps only the backward and relies on real guidance
    # never reaching the overflow region (PARITY.md).
    return jnp.exp(jnp.clip(x, -15.0, 15.0))


def _trunc_exp_fwd(x):
    return jnp.exp(jnp.clip(x, -15.0, 15.0)), x


def _trunc_exp_bwd(x, g):
    # clamp the input in the backward to keep d(exp)/dx bounded
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


@dataclasses.dataclass(frozen=True)
class LatentNeRFConfig:
    grid: HashGridConfig = dataclasses.field(default_factory=HashGridConfig)
    hidden_dim: int = 64
    num_layers: int = 3
    geo_feat_dim: int = 15
    hidden_dim_color: int = 64
    num_layers_color: int = 4
    sh_degree: int = 4
    out_channels: int = 4          # 4 latent | 3 rgb
    bound: float = 1.0             # AABB half-extent
    density_blob_scale: float = 5.0   # gaussian density blob init aid
    density_blob_std: float = 0.2
    bg_hidden_dim: int = 32
    # MLP compute dtype: "auto" = bf16 on TPU (fp16-regime training à la
    # Instant-NGP; params stay f32), f32 elsewhere; or "float32"/"bfloat16"
    mlp_dtype: str = "auto"

    @classmethod
    def tiny(cls) -> "LatentNeRFConfig":
        return cls(grid=HashGridConfig(n_levels=4, log2_hashmap_size=12,
                                       base_resolution=8,
                                       desired_resolution=64),
                   hidden_dim=16, num_layers=2, geo_feat_dim=7,
                   hidden_dim_color=16, num_layers_color=2)


class MLP(nn.Module):
    out_dim: int
    hidden: int
    layers: int
    # compute dtype; params stay f32. The field MLPs are HBM-bound on TPU
    # (262k×64 activations dwarf their FLOPs — measured ~2.2 ms of the
    # 10.5 ms frame), so bf16 activations halve the traffic; outputs are
    # cast back to f32 before density/compositing math.
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        for i in range(self.layers - 1):
            x = nn.relu(nn.Dense(self.hidden, use_bias=False,
                                 dtype=self.dtype, name=f"dense_{i}")(x))
        return nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype,
                        name=f"dense_{self.layers - 1}")(x).astype(
            jnp.float32)


class LatentNeRFField(nn.Module):
    """Pure field: positions/dirs → (sigma, features/latent)."""
    config: LatentNeRFConfig

    def setup(self):
        cfg = self.config
        if cfg.mlp_dtype == "auto":
            dt = jnp.bfloat16 if jax.default_backend() == "tpu" \
                else jnp.float32
        else:
            dt = jnp.dtype(cfg.mlp_dtype)
        self.table = self.param(
            "hash_table",
            lambda key: init_hash_table(key, cfg.grid))
        self.sigma_mlp = MLP(1 + cfg.geo_feat_dim, cfg.hidden_dim,
                             cfg.num_layers, dtype=dt, name="sigma_mlp")
        self.color_mlp = MLP(cfg.out_channels, cfg.hidden_dim_color,
                             cfg.num_layers_color, dtype=dt,
                             name="color_mlp")
        self.bg_mlp = MLP(cfg.out_channels, cfg.bg_hidden_dim, 2, dtype=dt,
                          name="bg_mlp")

    def density(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x (N, 3) world coords in [−bound, bound]³ → (sigma (N,),
        geo features (N, G))."""
        cfg = self.config
        x01 = (x + cfg.bound) / (2 * cfg.bound)
        x01 = jnp.clip(x01, 0.0, 1.0)
        from tpunerf.kernels.hashgrid import hash_encode_auto
        h = hash_encode_auto(x01, self.table, cfg.grid)
        h = self.sigma_mlp(h)
        raw_sigma = h[..., 0]
        # gaussian blob bias concentrates initial density at the origin
        # (stable-dreamfusion's density_blob), easing SDS bootstrap
        d2 = jnp.sum(x * x, axis=-1)
        blob = cfg.density_blob_scale * jnp.exp(
            -d2 / (2 * cfg.density_blob_std ** 2))
        sigma = trunc_exp(raw_sigma + jnp.log(blob + 1e-6))
        return sigma, h[..., 1:]

    def __call__(self, x: jnp.ndarray, d: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x (N, 3), unit dirs d (N, 3) → (sigma (N,), color (N, C)).

        Latent channels are unbounded (SD latent space); in RGB mode the
        head is squashed to [0, 1]."""
        cfg = self.config
        sigma, geo = self.density(x)
        enc_d = sh_encode(d, cfg.sh_degree)
        c = self.color_mlp(jnp.concatenate([enc_d, geo], axis=-1))
        if cfg.out_channels == 3:
            c = nn.sigmoid(c)
        return sigma, c

    def background(self, d: jnp.ndarray) -> jnp.ndarray:
        """Direction-conditioned background (N, C)."""
        c = self.bg_mlp(sh_encode(d, self.config.sh_degree))
        if self.config.out_channels == 3:
            c = nn.sigmoid(c)
        return c

    def init_all(self, x: jnp.ndarray, d: jnp.ndarray):
        """Init entry touching every submodule (flax creates params only for
        traced paths, and `__call__` alone skips the background MLP)."""
        sigma, c = self(x, d)
        return sigma, c, self.background(d)
