"""Volumetric renderer: rays → occupancy-pruned marching → compositing.

The TPU-native equivalent of torch-ngp's CUDA `raymarching` extension
(SURVEY.md §2.5, reference README.md:155 "The CUDA ray marching modules"):

* rays from the same spherical-camera/NDC conventions as the rasterizer
  (core/camera.py), so mesh and volume apps share pose semantics;
* stratified fixed-S sampling inside the ray/AABB span — static shapes;
* occupancy-grid lookup (Pallas bit-packed VMEM kernel, kernels/occgrid.py)
  + **fixed-shape compaction** (fields/occupancy.py): the field MLP runs on
  K ≤ S depth-ordered occupied samples per ray;
* exclusive-cumsum transmittance compositing (pure XLA — it fuses into one
  pass; the Pallas work lives where XLA can't fuse: hash encode
  (kernels/hashgrid.py) and the occupancy gather).

Ray-local compositing means the `rays` mesh axis shards with zero cross-chip
traffic (SURVEY.md §5.7).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from tpunerf.core import camera as cam
from tpunerf.fields import occupancy as occ_lib
from tpunerf.kernels.rasterize import pixel_grid_ndc


@dataclasses.dataclass(frozen=True)
class MarchConfig:
    num_samples: int = 128      # S stratified candidates per ray
    num_compacted: int = 64     # K field evaluations per ray
    bound: float = 1.0
    density_scale: float = 1.0
    min_near: float = 0.05


class Rays(NamedTuple):
    origins: jnp.ndarray      # (B, P, 3)
    dirs: jnp.ndarray         # (B, P, 3) unit world directions
    near: jnp.ndarray         # (B, P)
    far: jnp.ndarray          # (B, P)


def generate_rays(theta, phi, radius, height: int, width: int,
                  fovy: float, look_at_height: float = 0.0,
                  bound: float = 1.0, min_near: float = 0.05) -> Rays:
    """Pinhole rays through every pixel center for a batch of spherical
    poses. Shares the NDC convention of kernels/rasterize.py (+y up)."""
    theta = jnp.atleast_1d(jnp.asarray(theta, jnp.float32))
    phi = jnp.atleast_1d(jnp.asarray(phi, jnp.float32))
    radius = jnp.broadcast_to(jnp.asarray(radius, jnp.float32), theta.shape)

    pos = cam.spherical_camera_position(theta, phi, radius)      # (B, 3)
    look_at = jnp.zeros_like(pos).at[..., 1].set(look_at_height)
    up = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), pos.shape)
    M = cam.look_at_transform(pos, look_at, up)                  # (B, 4, 3)
    R = M[..., :3, :]            # rows: world→cam; columns map cam→world

    pix = pixel_grid_ndc(height, width)                          # (P, 2)
    tanfov = jnp.tan(fovy / 2.0)
    # camera-space direction through pixel (x·tan, y·tan, −1)
    d_cam = jnp.stack([pix[:, 0] * tanfov, pix[:, 1] * tanfov,
                       -jnp.ones_like(pix[:, 0])], axis=-1)      # (P, 3)
    d_world = jnp.einsum("pc,bcw->bpw", d_cam,
                         jnp.swapaxes(R, -1, -2))                # (B, P, 3)
    d_world = d_world / jnp.linalg.norm(d_world, axis=-1, keepdims=True)
    origins = jnp.broadcast_to(pos[:, None, :], d_world.shape)

    near, far = aabb_intersect(origins, d_world, bound, min_near)
    return Rays(origins=origins, dirs=d_world, near=near, far=far)


def aabb_intersect(o: jnp.ndarray, d: jnp.ndarray, bound: float,
                   min_near: float = 0.05) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Slab test against [−bound, bound]³ → (near, far), far ≥ near."""
    inv_d = 1.0 / jnp.where(jnp.abs(d) > 1e-9, d, 1e-9)
    t0 = (-bound - o) * inv_d
    t1 = (bound - o) * inv_d
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    near = jnp.maximum(tmin, min_near)
    far = jnp.maximum(tmax, near + 1e-4)
    return near, far


class RenderResult(NamedTuple):
    image: jnp.ndarray        # (B, P, C) composited radiance/latent
    weights_sum: jnp.ndarray  # (B, P) accumulated opacity
    depth: jnp.ndarray        # (B, P)
    weights: jnp.ndarray      # (B, P, K) per-sample weights
    sigmas: jnp.ndarray       # (B, P, K)
    xyzs: jnp.ndarray         # (B, P, K, 3) evaluated sample positions
    valid: jnp.ndarray        # (B, P, K)


def composite(sigma: jnp.ndarray, color: jnp.ndarray, dt: jnp.ndarray,
              valid: jnp.ndarray, t: jnp.ndarray
              ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Transmittance compositing over the sample axis (last-but-feature).

    sigma/dt/valid/t: (..., K); color: (..., K, C).
    Returns (image (..., C), weights_sum, depth, weights)."""
    sig_dt = sigma * dt * valid
    tau = jnp.cumsum(sig_dt, axis=-1) - sig_dt      # exclusive prefix
    T = jnp.exp(-tau)
    alpha = 1.0 - jnp.exp(-sig_dt)
    w = T * alpha
    image = jnp.einsum("...k,...kc->...c", w, color)
    wsum = jnp.sum(w, axis=-1)
    depth = jnp.sum(w * t, axis=-1)
    return image, wsum, depth, w


def render_rays(sigma_color_fn: Callable, rays: Rays, key: jax.Array,
                cfg: MarchConfig,
                occ_grid: Optional[jnp.ndarray] = None,
                occ_cfg: Optional[occ_lib.OccupancyGridConfig] = None,
                perturb: bool = True, layout=None,
                occ_packed: Optional[jnp.ndarray] = None) -> RenderResult:
    """March a batch of rays.

    sigma_color_fn: (x (N,3), d (N,3)) → (sigma (N,), color (N,C)) — the
    field apply, vmapped/flattened here.

    layout: optional dist.mesh.MeshLayout. When set, every (B, P, …)
    intermediate is sharding-constrained to (data, rays) and the flattened
    field-MLP batch to the merged (data, rays) axis — marching and
    compositing are ray-local, so the `rays` axis moves ZERO bytes across
    chips; only the parameter-gradient psum communicates (SURVEY.md §5.7).
    """
    B, P, _ = rays.origins.shape
    S, K = cfg.num_samples, cfg.num_compacted
    c = layout.constrain_rays if layout is not None else (lambda x: x)
    cf = layout.constrain_flat if layout is not None else (lambda x: x)

    # stratified candidates over [near, far]
    u = (jnp.arange(S, dtype=jnp.float32) + 0.5) / S
    u = jnp.broadcast_to(u, (B, P, S))
    if perturb:
        u = u + (jax.random.uniform(key, (B, P, S)) - 0.5) / S
    t = c(rays.near[..., None]
          + (rays.far - rays.near)[..., None] * u)                 # (B,P,S)
    dt_full = (rays.far - rays.near) / S                               # (B,P)

    xyz = rays.origins[..., None, :] + rays.dirs[..., None, :] * \
        t[..., None]                                                   # (B,P,S,3)
    xyz = c(jnp.clip(xyz, -cfg.bound, cfg.bound))

    # occupancy mask + fixed-shape compaction
    if occ_grid is not None and occ_cfg is not None:
        occ = occ_lib.occupied(occ_grid, xyz, occ_cfg,
                               packed=occ_packed)                      # (B,P,S)
    else:
        occ = jnp.ones((B, P, S), bool)
    valid, t_k, xyz_k = occ_lib.compact_gather(c(occ), K, t, xyz)      # (B,P,K)
    valid, t_k, xyz_k = c(valid), c(t_k), c(xyz_k)

    flat_x = cf(xyz_k.reshape(-1, 3))
    flat_d = cf(jnp.broadcast_to(rays.dirs[..., None, :],
                                 xyz_k.shape).reshape(-1, 3))
    sigma, color = sigma_color_fn(flat_x, flat_d)
    C = color.shape[-1]
    sigma = c(sigma.reshape(B, P, K)) * cfg.density_scale
    color = c(color.reshape(B, P, K, C))

    image, wsum, depth, w = composite(sigma, color,
                                      dt_full[..., None], valid, t_k)
    return RenderResult(image=c(image), weights_sum=c(wsum), depth=c(depth),
                        weights=c(w), sigmas=sigma, xyzs=xyz_k, valid=valid)
