"""Multiresolution hash-grid encoding (Instant-NGP) + SH direction encoding.

TPU-native replacement for the torch-ngp CUDA `gridencoder` the upstream
latent-NeRF depends on (SURVEY.md §2.5/§2.6; reference README.md:155,
BASELINE.json north star). Forward is gather + trilinear lerp; backward is a
scatter-add into the hash table — both expressed as XLA gather/segment_sum
here, with a Pallas kernel variant in kernels/hashgrid.py for the hot path.

Coordinates are in [0, 1]³. Per-level resolution grows geometrically from
`base_resolution` to `desired_resolution`; levels whose dense grid fits the
table are indexed directly, larger ones via the Instant-NGP spatial hash
(π₁, π₂, π₃ prime XORs).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = (1, 2654435761, 805459861)


@dataclasses.dataclass(frozen=True)
class HashGridConfig:
    """Defaults sized for TPU: T = 2¹¹ keeps the whole table VMEM-resident
    for the Pallas gather kernel (kernels/hashgrid.py), and 256³ top
    resolution matches the 64×64-latent supervision bandwidth. torch-ngp's
    (T=2¹⁹, 2048³) remains available for parity experiments via the jnp
    path."""
    n_levels: int = 12
    n_features_per_level: int = 2
    log2_hashmap_size: int = 11
    base_resolution: int = 16
    desired_resolution: int = 256

    @property
    def table_size(self) -> int:
        return 1 << self.log2_hashmap_size

    @property
    def per_level_scale(self) -> float:
        if self.n_levels == 1:
            return 1.0
        return math.exp(math.log(self.desired_resolution /
                                 self.base_resolution) /
                        (self.n_levels - 1))

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.n_features_per_level

    def level_resolutions(self) -> np.ndarray:
        s = self.per_level_scale
        return np.array([int(np.floor(self.base_resolution * s ** l))
                         for l in range(self.n_levels)], np.int32)


def init_hash_table(key: jax.Array, cfg: HashGridConfig) -> jnp.ndarray:
    """(L, T, F) feature table, U(−1e-4, 1e-4) like Instant-NGP."""
    return jax.random.uniform(
        key, (cfg.n_levels, cfg.table_size, cfg.n_features_per_level),
        minval=-1e-4, maxval=1e-4)


def _corner_index(ix: jnp.ndarray, iy: jnp.ndarray, iz: jnp.ndarray,
                  res: jnp.ndarray, table_size: int,
                  dense: jnp.ndarray) -> jnp.ndarray:
    """Grid corner → table slot: dense row-major when the level fits,
    spatial hash otherwise. All args broadcastable int32."""
    dense_idx = (ix * (res + 1) + iy) * (res + 1) + iz
    p1 = jnp.uint32(_PRIMES[1])
    p2 = jnp.uint32(_PRIMES[2])
    hashed = (ix.astype(jnp.uint32) ^ (iy.astype(jnp.uint32) * p1)
              ^ (iz.astype(jnp.uint32) * p2))
    hashed = jnp.bitwise_and(hashed, jnp.uint32(table_size - 1))
    return jnp.where(dense, dense_idx, hashed.astype(jnp.int32))


def corner_indices_and_weights(x: jnp.ndarray, cfg: HashGridConfig
                               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x (N, 3) in [0,1]³ → (idx8 (L, N, 8) int32 table slots,
    w8 (L, N, 8) trilinear weights). Pure int/VPU math, shared by the jnp
    forward, the Pallas kernel's XLA backward, and tests."""
    res_np = cfg.level_resolutions()
    res = jnp.asarray(res_np)                              # (L,)
    # host-side int64: (res+1)³ overflows int32 for fine levels, and
    # int32-overflow wrap differs between CPU and TPU backends
    dense = jnp.asarray(
        (res_np.astype(np.int64) + 1) ** 3 <= cfg.table_size)  # (L,)

    xl = x[None, :, :] * res[:, None, None].astype(x.dtype)  # (L, N, 3)
    x0 = jnp.floor(xl)
    w = xl - x0                                             # (L, N, 3)
    x0 = x0.astype(jnp.int32)
    x0 = jnp.clip(x0, 0, res[:, None, None])               # guard edges

    idxs = []
    wgts = []
    for corner in range(8):
        dx, dy, dz = (corner >> 2) & 1, (corner >> 1) & 1, corner & 1
        ix = jnp.minimum(x0[..., 0] + dx, res[:, None])
        iy = jnp.minimum(x0[..., 1] + dy, res[:, None])
        iz = jnp.minimum(x0[..., 2] + dz, res[:, None])
        idxs.append(_corner_index(ix, iy, iz, res[:, None], cfg.table_size,
                                  dense[:, None]))          # (L, N)
        wx = w[..., 0] if dx else 1.0 - w[..., 0]
        wy = w[..., 1] if dy else 1.0 - w[..., 1]
        wz = w[..., 2] if dz else 1.0 - w[..., 2]
        wgts.append(wx * wy * wz)
    return jnp.stack(idxs, axis=-1), jnp.stack(wgts, axis=-1)


def hash_encode(x: jnp.ndarray, table: jnp.ndarray,
                cfg: HashGridConfig) -> jnp.ndarray:
    """x (N, 3) in [0,1]³, table (L, T, F) → features (N, L·F).

    jnp reference path. One fused gather over all levels+corners — XLA TPU
    gather has large per-call overhead, so 8 separate lookups cost ~4× more
    than a single batched one (measured on v5e). The Pallas fast path lives
    in kernels/hashgrid.py.
    """
    L = cfg.n_levels
    N = x.shape[0]
    idx8, w8 = corner_indices_and_weights(x, cfg)           # (L, N, 8)
    f8 = jnp.take_along_axis(table, idx8.reshape(L, N * 8)[..., None],
                             axis=1)                        # (L, 8N, F)
    f8 = f8.reshape(L, N, 8, cfg.n_features_per_level).astype(x.dtype)
    out = jnp.einsum("lnc,lncf->lnf", w8, f8)
    return out.transpose(1, 0, 2).reshape(N, cfg.out_dim)


# ---------------------------------------------------------------------------
# Spherical-harmonics direction encoding (torch-ngp `shencoder` equivalent).
# ---------------------------------------------------------------------------

def sh_encode(dirs: jnp.ndarray, degree: int = 4) -> jnp.ndarray:
    """Unit directions (N, 3) → real SH basis values (N, degree²)."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    result = [jnp.full_like(x, 0.28209479177387814)]
    if degree > 1:
        result += [-0.48860251190291987 * y,
                   0.48860251190291987 * z,
                   -0.48860251190291987 * x]
    if degree > 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        result += [1.0925484305920792 * xy,
                   -1.0925484305920792 * yz,
                   0.94617469575755997 * zz - 0.31539156525251999,
                   -1.0925484305920792 * xz,
                   0.54627421529603959 * (xx - yy)]
    if degree > 3:
        result += [0.59004358992664352 * y * (-3.0 * xx + yy),
                   2.8906114426405538 * xy * z,
                   0.45704579946446572 * y * (1.0 - 5.0 * zz),
                   0.3731763325901154 * z * (5.0 * zz - 3.0),
                   0.45704579946446572 * x * (1.0 - 5.0 * zz),
                   1.4453057213202769 * z * (xx - yy),
                   0.59004358992664352 * x * (-xx + 3.0 * yy)]
    return jnp.stack(result, axis=-1)


def frequency_encode(x: jnp.ndarray, n_freqs: int = 6) -> jnp.ndarray:
    """Classic NeRF positional encoding (fallback encoder,
    `backbone: vanilla`)."""
    freqs = 2.0 ** jnp.arange(n_freqs, dtype=x.dtype)
    xb = x[..., None, :] * freqs[:, None]
    enc = jnp.concatenate([jnp.sin(xb), jnp.cos(xb)], axis=-1)
    return jnp.concatenate([x, enc.reshape(*x.shape[:-1], -1)], axis=-1)
