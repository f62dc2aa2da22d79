"""Residual displacement MLP (reference src/latent_paint_mesh/models/
model.py:1-41): 5-layer, 128-wide, GroupNorm residual MLP predicting
per-vertex displacement from vertex position — the neural alternative to the
free per-vertex `displacement` parameter in TexturedMeshScene."""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class DisplacementMLP(nn.Module):
    width: int = 128
    depth: int = 5
    out_dim: int = 3
    norm_groups: int = 8
    scale: float = 1e-2     # keep initial displacements tiny

    @nn.compact
    def __call__(self, verts: jnp.ndarray) -> jnp.ndarray:
        """(V, 3) → (V, 3) displacement."""
        h = nn.Dense(self.width, name="in_proj")(verts)
        for i in range(self.depth):
            r = h
            h = nn.GroupNorm(num_groups=self.norm_groups,
                             name=f"norm_{i}")(h)
            h = nn.relu(h)
            h = nn.Dense(self.width, name=f"dense_{i}")(h)
            h = h + r
        out = nn.Dense(self.out_dim, name="out_proj",
                       kernel_init=nn.initializers.zeros)(h)
        return out * self.scale
