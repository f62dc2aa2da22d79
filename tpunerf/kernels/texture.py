"""UV texture sampling (nearest / bilinear / bicubic) in pure XLA.

TPU-native replacement for kaolin's CUDA `texture_mapping`
(reference: src/latent_paint/models/render.py:64, latent_paint_mesh/models/
render.py:243). Semantics match torch `grid_sample(align_corners=False,
padding_mode='zeros')` after kaolin's uv → grid conversion: uv ∈ [0,1]²,
v flipped (texture row 0 is v=1).

Gathers vectorize cleanly in XLA (SURVEY.md §2.6) — no Pallas needed; the
bicubic path uses Keys' cubic convolution with a = −0.75 (torch's kernel).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _gather_texel(texture: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray
                  ) -> jnp.ndarray:
    """texture (H, W, C); ix/iy integer (...,) — zero padding out of range."""
    H, W, _ = texture.shape
    inb = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
    ixc = jnp.clip(ix, 0, W - 1)
    iyc = jnp.clip(iy, 0, H - 1)
    vals = texture[iyc, ixc]
    return jnp.where(inb[..., None], vals, 0.0)


def _cubic_weights(t: jnp.ndarray, a: float = -0.75) -> Tuple[jnp.ndarray, ...]:
    """Keys cubic convolution weights for offsets (−1, 0, 1, 2)."""
    t2, t3 = t * t, t * t * t
    w0 = a * (t3 - 2 * t2 + t)                  # offset −1  (distance 1+t)
    w1 = (a + 2) * t3 - (a + 3) * t2 + 1        # offset 0   (distance t)
    w2 = -(a + 2) * t3 + (2 * a + 3) * t2 - a * t  # offset 1 (distance 1−t)
    w3 = a * (-t3 + t2)                         # offset 2   (distance 2−t)
    return w0, w1, w2, w3


def _sample_single(texture: jnp.ndarray, uv: jnp.ndarray, mode: str
                   ) -> jnp.ndarray:
    """texture (H, W, C), uv (..., 2) in [0, 1] → (..., C)."""
    H, W, _ = texture.shape
    # kaolin: grid = uv*2−1 with v negated; grid_sample(align_corners=False):
    # pix = ((g + 1) * size − 1) / 2. Composing: px = uv_x*W − .5,
    # py = (1 − uv_y)*H − .5.
    px = uv[..., 0] * W - 0.5
    py = (1.0 - uv[..., 1]) * H - 0.5

    if mode == "nearest":
        # grid_sample nearest rounds half away via round-to-nearest of pix
        ix = jnp.round(px).astype(jnp.int32)
        iy = jnp.round(py).astype(jnp.int32)
        return _gather_texel(texture, ix, iy)

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    tx = px - x0
    ty = py - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    if mode == "bilinear":
        c00 = _gather_texel(texture, x0i, y0i)
        c10 = _gather_texel(texture, x0i + 1, y0i)
        c01 = _gather_texel(texture, x0i, y0i + 1)
        c11 = _gather_texel(texture, x0i + 1, y0i + 1)
        wx = tx[..., None]
        wy = ty[..., None]
        top = c00 * (1 - wx) + c10 * wx
        bot = c01 * (1 - wx) + c11 * wx
        return top * (1 - wy) + bot * wy

    if mode == "bicubic":
        wx = _cubic_weights(tx)
        wy = _cubic_weights(ty)
        out = 0.0
        for j, wyj in enumerate(wy):
            row = 0.0
            for i, wxi in enumerate(wx):
                row = row + wxi[..., None] * _gather_texel(
                    texture, x0i + i - 1, y0i + j - 1)
            out = out + wyj[..., None] * row
        return out

    raise ValueError(f"no interpolation mode {mode}")


@functools.partial(jax.jit, static_argnames=("mode",))
def texture_mapping(texture_coordinates: jnp.ndarray,
                    texture_maps: jnp.ndarray,
                    mode: str = "nearest") -> jnp.ndarray:
    """Batched UV sampling.

    Args:
      texture_coordinates: (B, ..., 2) uv in [0, 1].
      texture_maps: (B, H, W, C) NHWC (the reference uses NCHW; this framework
        is NHWC throughout — TPU-friendly layout with C on the lane dim).
    Returns (B, ..., C).
    """
    return jax.vmap(lambda uv, tex: _sample_single(tex, uv, mode))(
        texture_coordinates, texture_maps)


def resize_bicubic(image: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """NHWC bicubic resize matching torch
    `F.interpolate(mode='bicubic', align_corners=False)` (reference
    textured_mesh.py:215-218).

    Implemented with the Keys a = −0.75 kernel via separable 1-D passes —
    `jax.image.resize('bicubic')` uses a = −0.5 and would not match the
    reference numerically.
    """
    B, H, W, C = image.shape

    def axis_weights(n_in: int, n_out: int):
        # output center i ← input coords (i+.5)·n_in/n_out − .5
        pos = (jnp.arange(n_out, dtype=jnp.float32) + 0.5) * n_in / n_out - 0.5
        i0 = jnp.floor(pos)
        t = pos - i0
        w = jnp.stack(_cubic_weights(t), axis=-1)        # (n_out, 4)
        idx = i0[:, None].astype(jnp.int32) + jnp.arange(-1, 3)[None, :]
        idx = jnp.clip(idx, 0, n_in - 1)                 # replicate edges
        return idx, w

    def resample(x, axis, n_out):
        n_in = x.shape[axis]
        idx, w = axis_weights(n_in, n_out)
        g = jnp.take(x, idx.reshape(-1), axis=axis)
        g = jnp.moveaxis(g, axis, 0).reshape(n_out, 4, *[
            s for i, s in enumerate(jnp.moveaxis(x, axis, 0).shape[1:])])
        out = jnp.einsum("ok,ok...->o...", w, g)
        return jnp.moveaxis(out, 0, axis)

    out = resample(image, 1, height)
    return resample(out, 2, width)


def resize_bilinear(image: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    B, _, _, C = image.shape
    return jax.image.resize(image, (B, height, width, C), method="bilinear")
