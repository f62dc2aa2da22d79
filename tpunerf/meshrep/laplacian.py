"""Uniform mesh Laplacian as precomputed COO edges + segment_sum matvec.

TPU-native replacement for kaolin's `uniform_laplacian` sparse matrix
(reference: src/latent_paint_mesh/models/textured_mesh.py:60-71, used for the
Laplacian regularization loss ‖L(v+d) − L(v₀)‖² at :314-317). The edge list
is built once on host; the in-jit matvec is a gather + segment_sum, which XLA
lowers to an efficient scatter-add.

L v = (Σ_{j∈N(i)} v_j) / deg(i) − v_i  (uniform weights, kaolin convention).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class UniformLaplacian:
    src: jnp.ndarray       # (E,) int32 — edge source (row of L)
    dst: jnp.ndarray       # (E,) int32 — edge dest (neighbor)
    inv_degree: jnp.ndarray  # (V,) float32
    num_vertices: int

    @classmethod
    def from_faces(cls, faces: np.ndarray, num_vertices: int
                   ) -> "UniformLaplacian":
        faces = np.asarray(faces)
        pairs = np.concatenate([faces[:, [0, 1]], faces[:, [1, 0]],
                                faces[:, [1, 2]], faces[:, [2, 1]],
                                faces[:, [2, 0]], faces[:, [0, 2]]], axis=0)
        pairs = np.unique(pairs, axis=0)         # dedupe shared edges
        deg = np.bincount(pairs[:, 0], minlength=num_vertices).astype(
            np.float32)
        inv_deg = np.where(deg > 0, 1.0 / np.maximum(deg, 1), 0.0)
        return cls(src=jnp.asarray(pairs[:, 0], jnp.int32),
                   dst=jnp.asarray(pairs[:, 1], jnp.int32),
                   inv_degree=jnp.asarray(inv_deg),
                   num_vertices=num_vertices)

    def matvec(self, v: jnp.ndarray) -> jnp.ndarray:
        """(V, C) → (V, C): neighbor mean minus self."""
        nbr_sum = jax.ops.segment_sum(v[self.dst], self.src,
                                      num_segments=self.num_vertices)
        return nbr_sum * self.inv_degree[:, None] - v

    def loss(self, verts: jnp.ndarray, verts0_lap: jnp.ndarray) -> jnp.ndarray:
        """Mean squared deviation of Laplacian coordinates from the cached
        initial ones (reference textured_mesh.py:314-317)."""
        return jnp.mean(jnp.sum((self.matvec(verts) - verts0_lap) ** 2,
                                axis=-1))
