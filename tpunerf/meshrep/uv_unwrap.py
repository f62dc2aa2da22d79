"""Host-side UV atlas generation for meshes without UVs.

The reference shells out to xatlas (C++) and caches vt/ft to disk
(src/latent_paint/models/textured_mesh.py:81-109). xatlas is unavailable in
this environment, so this module provides a deterministic per-triangle grid
atlas: every face gets its own cell in a ⌈√F⌉×⌈√F⌉ grid, with the triangle
shape preserved (scaled projection onto its own plane). Charts never overlap
by construction; texel utilization is lower than xatlas but the optimization
target (a learnable texture) is agnostic to chart layout.

The same disk-cache protocol is kept (vt.npy / ft.npy under the experiment
dir) so re-runs skip the unwrap, and real xatlas output can be dropped in.
"""
from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import numpy as np


def _triangle_local_2d(tri: np.ndarray) -> np.ndarray:
    """(3, 3) world triangle → (3, 2) 2-D coords in its own plane."""
    e1 = tri[1] - tri[0]
    e2 = tri[2] - tri[0]
    n = np.cross(e1, e2)
    nn = np.linalg.norm(n)
    if nn < 1e-12:
        return np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]], np.float32)
    u = e1 / (np.linalg.norm(e1) + 1e-12)
    w = n / nn
    v = np.cross(w, u)
    p = np.stack([np.zeros(3), e1, e2])  # rel to v0
    return np.stack([p @ u, p @ v], axis=-1).astype(np.float32)


def grid_atlas(vertices: np.ndarray, faces: np.ndarray, margin: float = 0.1
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Per-face grid atlas → (vt (3F, 2), ft (F, 3))."""
    F = faces.shape[0]
    K = int(np.ceil(np.sqrt(F)))
    cell = 1.0 / K
    vt = np.zeros((3 * F, 2), np.float32)
    ft = np.arange(3 * F, dtype=np.int32).reshape(F, 3)
    for f in range(F):
        tri = vertices[faces[f]]
        local = _triangle_local_2d(tri)
        lo = local.min(axis=0)
        span = max(float((local - lo).max()), 1e-12)
        local = (local - lo) / span                     # in [0,1]²
        local = margin / 2 + local * (1.0 - margin)     # inset
        cy, cx = divmod(f, K)
        vt[3 * f:3 * f + 3] = (np.array([cx, cy]) + local) * cell
    return vt, ft


def get_or_build_uvs(vertices: np.ndarray, faces: np.ndarray,
                     cache_dir: Optional[Path] = None
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """UV source priority (reference textured_mesh.py:81-109): disk cache →
    fresh unwrap (cached)."""
    if cache_dir is not None:
        cache_dir = Path(cache_dir)
        vt_p, ft_p = cache_dir / "vt.npy", cache_dir / "ft.npy"
        if vt_p.exists() and ft_p.exists():
            return np.load(vt_p), np.load(ft_p)
    vt, ft = grid_atlas(vertices, faces)
    if cache_dir is not None:
        cache_dir.mkdir(parents=True, exist_ok=True)
        np.save(cache_dir / "vt.npy", vt)
        np.save(cache_dir / "ft.npy", ft)
    return vt, ft
