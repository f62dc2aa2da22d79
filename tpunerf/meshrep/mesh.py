"""Mesh asset: load, normalize, standardize.

Reference: src/latent_paint/models/mesh.py (kaolin-backed `Mesh`). Here the
mesh is a host-loaded numpy asset converted once to jnp; all downstream
geometry processing is functional jnp.
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional, Union

import jax.numpy as jnp
import numpy as np

from tpunerf.core import obj_io


@dataclasses.dataclass
class Mesh:
    vertices: jnp.ndarray                 # (V, 3) float32
    faces: jnp.ndarray                    # (F, 3) int32
    vt: Optional[jnp.ndarray] = None      # (T, 2) float32 UVs
    ft: Optional[jnp.ndarray] = None      # (F, 3) int32 face-UV indices

    @classmethod
    def load(cls, path: Union[str, Path]) -> "Mesh":
        data = obj_io.load_mesh(path)
        return cls(
            vertices=jnp.asarray(data.vertices),
            faces=jnp.asarray(data.faces),
            vt=None if data.uvs is None else jnp.asarray(data.uvs),
            ft=None if data.face_uvs_idx is None else jnp.asarray(data.face_uvs_idx),
        )

    def normalize(self, target_scale: float = 1.0, dy: float = 0.0) -> "Mesh":
        """Center at the vertex mean, scale so max |v| = target_scale, lift +Y
        by `dy` (reference mesh.py:37-48 `normalize_mesh`)."""
        verts = self.vertices - self.vertices.mean(axis=0)
        scale = jnp.max(jnp.linalg.norm(verts, axis=1))
        verts = verts / scale * target_scale
        verts = verts.at[:, 1].add(dy)
        return dataclasses.replace(self, vertices=verts)

    def standardize(self) -> "Mesh":
        """Center and scale by the std of vertex norms
        (reference mesh.py:26-35)."""
        verts = self.vertices - self.vertices.mean(axis=0)
        scale = jnp.std(jnp.linalg.norm(verts, axis=1))
        return dataclasses.replace(self, vertices=verts / scale)

    @property
    def num_vertices(self) -> int:
        return int(self.vertices.shape[0])

    @property
    def num_faces(self) -> int:
        return int(self.faces.shape[0])
