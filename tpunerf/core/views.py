"""View (camera pose) sampling — the framework's "data" layer.

The reference wraps synthetic pose RNG in a torch DataLoader
(src/latent_paint/training/views_dataset.py:9-80, including the
``loader._data`` back-pointer hack). TPU-native design: pose sampling is a
pure function of a PRNG key, so it jits, vmaps over batch, and shards across
hosts by folding the host id into the key (SURVEY.md §5.8) — no loader
processes, no host↔device data plumbing.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp

from tpunerf.core.camera import get_view_direction


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ViewBatch:
    """A batch of spherical camera poses (all shapes (B,))."""
    theta: jnp.ndarray    # polar angle from +Y, radians
    phi: jnp.ndarray      # azimuth, radians
    radius: jnp.ndarray
    dirs: jnp.ndarray     # int32 view-direction bucket (camera.get_view_direction)
    is_body: jnp.ndarray  # bool — body vs head camera (paint-mesh dual-camera)

    def tree_flatten(self):
        return ((self.theta, self.phi, self.radius, self.dirs, self.is_body), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def batch_size(self) -> int:
        return self.theta.shape[0]


@dataclasses.dataclass(frozen=True)
class ViewSamplerConfig:
    radius_range: Tuple[float, float] = (1.0, 1.5)
    theta_range: Tuple[float, float] = (0.0, 150.0)   # degrees
    phi_range: Tuple[float, float] = (0.0, 360.0)     # degrees
    angle_overhead: float = 30.0                      # degrees
    angle_front: float = 60.0                         # degrees
    body_prob: float = 1.0     # P(body camera); <1 only for dual-camera apps
    eval_theta: float = 60.0   # degrees — fixed polar angle of the eval orbit
    eval_radius_scale: float = 1.2  # eval radius = radius_range[1] * scale


def rand_poses(key: jax.Array, size: int, cfg: ViewSamplerConfig) -> ViewBatch:
    """Uniform random poses (reference `rand_poses`, views_dataset.py:9-22)."""
    k_r, k_t, k_p, k_b = jax.random.split(key, 4)
    lo_r, hi_r = cfg.radius_range
    lo_t, hi_t = (math.radians(v) for v in cfg.theta_range)
    lo_p, hi_p = (math.radians(v) for v in cfg.phi_range)
    radius = jax.random.uniform(k_r, (size,), minval=lo_r, maxval=hi_r)
    theta = jax.random.uniform(k_t, (size,), minval=lo_t, maxval=hi_t)
    phi = jax.random.uniform(k_p, (size,), minval=lo_p, maxval=hi_p)
    dirs = get_view_direction(theta, phi, math.radians(cfg.angle_overhead),
                              math.radians(cfg.angle_front))
    is_body = jax.random.uniform(k_b, (size,)) < cfg.body_prob
    return ViewBatch(theta=theta, phi=phi, radius=radius, dirs=dirs,
                     is_body=is_body)


def circle_poses(size: int, cfg: ViewSamplerConfig) -> ViewBatch:
    """Fixed orbit for eval (reference `circle_poses`, views_dataset.py:25-35,
    and the phi = i/size · 360° schedule at :60-61)."""
    theta = jnp.full((size,), math.radians(cfg.eval_theta), jnp.float32)
    phi = jnp.arange(size, dtype=jnp.float32) / size * (2 * math.pi)
    radius = jnp.full((size,), cfg.radius_range[1] * cfg.eval_radius_scale,
                      jnp.float32)
    dirs = get_view_direction(theta, phi, math.radians(cfg.angle_overhead),
                              math.radians(cfg.angle_front))
    return ViewBatch(theta=theta, phi=phi, radius=radius, dirs=dirs,
                     is_body=jnp.ones((size,), bool))


def train_view_stream(key: jax.Array, batch_size: int, cfg: ViewSamplerConfig,
                      host_id: Optional[int] = None) -> Iterator[ViewBatch]:
    """Infinite per-step pose stream; fold the host id into the key so each
    host draws disjoint views (the data-parallel axis of SURVEY.md §2.7)."""
    if host_id is not None:
        key = jax.random.fold_in(key, host_id)
    step = 0
    while True:
        yield rand_poses(jax.random.fold_in(key, step), batch_size, cfg)
        step += 1
