"""Differentiable triangle rasterization for TPU (XLA-native reference impl).

TPU-native replacement for kaolin's CUDA rasterizers
(reference: src/latent_paint/models/render.py:42-43 `kal.render.mesh.rasterize`
and src/latent_paint_mesh/models/render.py:231-239 `dibr_rasterization`).

Design (SURVEY.md §7 "hard parts" #1): per-pixel triangle assignment is
data-dependent, which XLA cannot express with dynamic shapes — so the
rasterizer is split into

1. a **selection pass** (non-differentiable): a chunked scan over faces
   computing, per pixel, the argmax-z visible face id — fixed shapes, pure
   max/argmax reductions, maps cleanly onto the VPU;
2. a **differentiable pass**: gather the winning face's vertices/attributes
   and recompute barycentrics with gradients — one gather + small einsum;
3. an optional **soft-silhouette pass** (DIB-R semantics): per-pixel
   probability 1 − ∏(1 − exp(−d²/σ)) accumulated in a differentiable scan,
   giving silhouette gradients to vertex positions.

Conventions: image coords are NDC in [−1,1], +y up; pixel (i, j) has center
(x, y) = ((j+.5)/W·2−1, 1−(i+.5)/H·2). Camera-space z is negative in front of
the camera; the *largest* interpolated z wins the depth test. Attributes are
interpolated in image space (matching kaolin's DIB-R interpolation).
`face_idx == −1` marks background.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-10


def pixel_grid_ndc(height: int, width: int) -> jnp.ndarray:
    """(H·W, 2) pixel-center NDC coordinates, row-major, +y up."""
    ys = 1.0 - (jnp.arange(height, dtype=jnp.float32) + 0.5) / height * 2.0
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width * 2.0 - 1.0
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([gx.ravel(), gy.ravel()], axis=-1)


def _edge_weights(pix: jnp.ndarray, tri: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Unnormalized barycentric edge functions.

    pix: (P, 2); tri: (..., 3, 2) → weights (..., P, 3) and denom (..., 1).
    bary = w / denom; inside iff all(w · sign(denom) ≥ 0).
    """
    v0, v1, v2 = tri[..., 0, :], tri[..., 1, :], tri[..., 2, :]

    def cross2(ax, ay, bx, by):
        return ax * by - ay * bx

    # pix broadcast: (..., P)
    px, py = pix[..., 0], pix[..., 1]

    def w(a, b):
        # cross(b - a, p - a) for each pixel
        abx, aby = b[..., 0] - a[..., 0], b[..., 1] - a[..., 1]
        apx = px[None, :] - a[..., 0:1]
        apy = py[None, :] - a[..., 1:2]
        return abx[..., None] * apy - aby[..., None] * apx

    w0 = w(v1, v2)  # opposite v0
    w1 = w(v2, v0)
    w2 = w(v0, v1)
    denom = cross2(v1[..., 0] - v0[..., 0], v1[..., 1] - v0[..., 1],
                   v2[..., 0] - v0[..., 0], v2[..., 1] - v0[..., 1])
    return jnp.stack([w0, w1, w2], axis=-1), denom[..., None]


def _select_faces(pix: jnp.ndarray, fv_img: jnp.ndarray, fv_z: jnp.ndarray,
                  valid: jnp.ndarray, face_chunk: int) -> jnp.ndarray:
    """Per-pixel winning face id (P,), −1 = background. Non-differentiable."""
    P = pix.shape[0]
    F = fv_img.shape[0]
    pad = (-F) % face_chunk
    fv_img = jnp.pad(fv_img, ((0, pad), (0, 0), (0, 0)))
    fv_z = jnp.pad(fv_z, ((0, pad), (0, 0)))
    valid = jnp.pad(valid, (0, pad))
    n_chunks = (F + pad) // face_chunk

    fv_img_c = fv_img.reshape(n_chunks, face_chunk, 3, 2)
    fv_z_c = fv_z.reshape(n_chunks, face_chunk, 3)
    valid_c = valid.reshape(n_chunks, face_chunk)
    base_ids = jnp.arange(face_chunk, dtype=jnp.int32)

    def body(carry, chunk):
        best_z, best_idx = carry
        tri, z3, ok, chunk_id = chunk
        w, denom = _edge_weights(pix, tri)            # (Fc, P, 3), (Fc, 1)
        sgn = jnp.sign(denom)
        inside = jnp.all(w * sgn[..., None] >= 0.0, axis=-1)   # (Fc, P)
        nondegen = jnp.abs(denom[..., 0]) > _EPS
        bary = w / jnp.where(jnp.abs(denom) > _EPS, denom, 1.0)[..., None]
        zi = jnp.einsum("fpk,fk->fp", bary, z3)       # (Fc, P)
        hit = inside & nondegen[..., None] & ok[:, None]
        zi = jnp.where(hit, zi, -jnp.inf)
        # best within chunk
        arg = jnp.argmax(zi, axis=0)                  # (P,)
        zbest = jnp.take_along_axis(zi, arg[None], axis=0)[0]
        idx = chunk_id * face_chunk + base_ids[arg]
        take = zbest > best_z
        return (jnp.where(take, zbest, best_z),
                jnp.where(take, idx, best_idx)), None

    init = (jnp.full((P,), -jnp.inf, jnp.float32),
            jnp.full((P,), -1, jnp.int32))
    chunk_ids = jnp.arange(n_chunks, dtype=jnp.int32)
    (best_z, best_idx), _ = jax.lax.scan(
        body, init, (fv_img_c, fv_z_c, valid_c, chunk_ids))
    return best_idx


# --------------------------------------------------------------------------
# Pallas selection kernel (TPU): the XLA chunked scan above materializes
# (face_chunk, P)-shaped intermediates through HBM each chunk; this kernel
# keeps the whole z-test in VMEM. Faces are pre-reduced to affine
# coefficients (edge functions and interpolated z are affine in pixel xy),
# sign-normalized so inside ⇔ all w ≥ 0; the kernel sweeps face blocks as
# scalar broadcasts against (8, 128)-pixel vregs. Measured v5e (sphere,
# 3968 faces): 1.9 → 0.76 ms at 64², 210 → 28 ms at 512² vs the XLA scan.
# --------------------------------------------------------------------------

_FB = 8            # faces per table row (sublanes)
_PSUB = 8          # pixel sublanes per block → (8, 128) = 1024 px
_PLANE = 128
_SEL_UNROLL = 8


def _face_rows(fv_img: jnp.ndarray, fv_z: jnp.ndarray,
               valid: jnp.ndarray) -> jnp.ndarray:
    """(F,3,2),(F,3),(F,) → (F, 12) affine coeffs
    [e0x,e0y,e0c, e1…, e2…, zx,zy,zc]; invalid/degenerate faces get
    edge0 ≡ −1 so they can never win a pixel."""
    v0, v1, v2 = fv_img[:, 0], fv_img[:, 1], fv_img[:, 2]

    def edge(a, b):
        ex = -(b[:, 1] - a[:, 1])
        ey = (b[:, 0] - a[:, 0])
        ec = (b[:, 1] - a[:, 1]) * a[:, 0] - (b[:, 0] - a[:, 0]) * a[:, 1]
        return jnp.stack([ex, ey, ec], -1)

    e0 = edge(v1, v2)
    e1 = edge(v2, v0)
    e2 = edge(v0, v1)
    denom = ((v1[:, 0] - v0[:, 0]) * (v2[:, 1] - v0[:, 1])
             - (v1[:, 1] - v0[:, 1]) * (v2[:, 0] - v0[:, 0]))
    s = jnp.sign(denom)
    ok = valid & (jnp.abs(denom) > _EPS)
    e0, e1, e2 = e0 * s[:, None], e1 * s[:, None], e2 * s[:, None]
    ad = jnp.where(ok, jnp.abs(denom), 1.0)
    z = (e0 * fv_z[:, 0:1] + e1 * fv_z[:, 1:2]
         + e2 * fv_z[:, 2:3]) / ad[:, None]
    e0 = jnp.where(ok[:, None], e0, jnp.array([0.0, 0.0, -1.0]))
    e1 = jnp.where(ok[:, None], e1, 0.0)
    e2 = jnp.where(ok[:, None], e2, 0.0)
    z = jnp.where(ok[:, None], z, 0.0)
    return jnp.concatenate([e0, e1, e2, z], axis=-1)         # (F, 12)


# Plain numpy on purpose: a module-level `jnp.array` would become a leaked
# tracer if this module is first imported inside an active jit/scan trace
# (the bench.py mesh_metrics crash in round 3 — see tests/test_import_in_trace.py).
_SEL_FILLER = np.array([0.0, 0.0, -1.0] + [0.0] * 9, np.float32)


def _face_tables(fv_img: jnp.ndarray, fv_z: jnp.ndarray,
                 valid: jnp.ndarray) -> jnp.ndarray:
    """(F,3,2),(F,3),(F,) → (ceil(F/8·u), 8, 12) blocked affine coeffs;
    padded faces get the never-wins filler row."""
    tab = _face_rows(fv_img, fv_z, valid)
    F = tab.shape[0]
    pad = (-F) % (_FB * _SEL_UNROLL)
    if pad:
        tab = jnp.concatenate(
            [tab, jnp.broadcast_to(_SEL_FILLER, (pad, 12))], axis=0)
    return tab.reshape(-1, _FB, 12)


def _sel_kernel(tab_ref, px_ref, py_ref, out_ref, *, n_fb: int):
    px = px_ref[:]                        # (PSUB, 128)
    py = py_ref[:]
    minus_inf = jnp.float32(-jnp.inf)

    def one_block(fb, bz, bi):
        t = tab_ref[fb]                   # (8, 12)
        for f in range(_FB):
            # per-face scalars broadcast against the pixel vreg
            w0 = t[f, 0] * px + t[f, 1] * py + t[f, 2]
            w1 = t[f, 3] * px + t[f, 4] * py + t[f, 5]
            w2 = t[f, 6] * px + t[f, 7] * py + t[f, 8]
            z = t[f, 9] * px + t[f, 10] * py + t[f, 11]
            hit = (w0 >= 0.0) & (w1 >= 0.0) & (w2 >= 0.0)
            z = jnp.where(hit, z, minus_inf)
            take = z > bz
            bz = jnp.where(take, z, bz)
            bi = jnp.where(take, fb * _FB + f, bi)
        return bz, bi

    def body(i, carry):
        bz, bi = carry
        for u in range(_SEL_UNROLL):
            bz, bi = one_block(i * _SEL_UNROLL + u, bz, bi)
        return bz, bi

    bz = jnp.full(px.shape, minus_inf, jnp.float32)
    bi = jnp.full(px.shape, -1, jnp.int32)
    bz, bi = jax.lax.fori_loop(0, n_fb // _SEL_UNROLL, body, (bz, bi))
    out_ref[:] = bi


def _select_faces_pallas(pix: jnp.ndarray, fv_img: jnp.ndarray,
                         fv_z: jnp.ndarray, valid: jnp.ndarray,
                         interpret: bool = False) -> jnp.ndarray:
    """Per-pixel winning face id (P,) on TPU; same tie-breaking as
    `_select_faces` (lowest face id wins exact z ties)."""
    P = pix.shape[0]
    tab = _face_tables(fv_img, fv_z, valid)
    n_fb = tab.shape[0]
    blk = _PSUB * _PLANE
    pad = (-P) % blk
    # padded pixels land outside NDC so they hit nothing
    pixp = jnp.pad(pix, ((0, pad), (0, 0)), constant_values=2.0)
    nb = (P + pad) // blk
    xs = pixp[:, 0].reshape(nb, _PSUB, _PLANE)
    ys = pixp[:, 1].reshape(nb, _PSUB, _PLANE)
    kern = functools.partial(_sel_kernel, n_fb=n_fb)
    out = pl.pallas_call(
        kern, grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((None, _PSUB, _PLANE), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((None, _PSUB, _PLANE), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((None, _PSUB, _PLANE), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, _PSUB, _PLANE), jnp.int32),
        interpret=interpret,
    )(tab, xs, ys)
    return out.reshape(-1)[:P]


def _use_pallas_select() -> bool:
    return jax.default_backend() == "tpu"


# --------------------------------------------------------------------------
# Band-binned kernels (VERDICT r1 task 1). The dense kernels above sweep
# every face block against every pixel block (F×P). But a pixel block is a
# *horizontal band* of the image (1024 contiguous row-major pixels), so a
# face can only touch the bands its bbox-y overlaps. We bin faces per band
# with fixed-K compaction (lax.top_k on a descending-id key keeps the
# dense kernels' lowest-id tie-breaking), gather only each band's K face
# tables, and sweep K instead of F. A band whose bin overflows K would be
# silently wrong, so the caller lax.cond-falls back to the dense sweep when
# max(count) > K. Measured v5e (sphere 3968 faces): selection at 512²
# 28 → 1.3 ms; soft silhouette 512² fwd+bwd 410 → 28 ms (see BASELINE.md).
# --------------------------------------------------------------------------

_BIN_K = 256                # faces per band bin (multiple of _FB·_SEL_UNROLL)
# the soft silhouette needs bigger bins: its bbox test is widened by the
# √(27.7·σ) tail margin (≈ 0.053 NDC at σ=1e-4), which adds ~F·2δ/extent
# faces to every band regardless of band height
_SOFT_BIN_K = 768
_BIN_MIN_PIXELS = 128 * 128  # binning engages at ≥128² renders


def _band_ranges(height: int, width: int, nb: int):
    """Static per-band pixel-center y-ranges (ylo, yhi) for nb blocks of
    1024 row-major pixels.

    The boundary rows are evaluated with the SAME f32 op sequence as
    pixel_grid_ndc (index into the per-row ys array) so a face whose bbox-y
    extreme lands exactly on a band-boundary pixel-center cannot be dropped
    by a 1-ulp f64→f32 rounding difference — the binned selection must agree
    with the dense path bit-for-bit at margin 0 (ADVICE r2)."""
    import numpy as np
    blk = _PSUB * _PLANE
    b = np.arange(nb)
    r0 = (b * blk) // width
    r1 = np.minimum(((b + 1) * blk - 1) // width, height - 1)
    ys = 1.0 - (jnp.arange(height, dtype=jnp.float32) + 0.5) / height * 2.0
    return ys[jnp.asarray(r1)], ys[jnp.asarray(r0)]


def _bin_faces(fv_img: jnp.ndarray, valid: jnp.ndarray, ylo: jnp.ndarray,
               yhi: jnp.ndarray, K: int, margin: float
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-band first-K face ids. Returns (ids (nb, K) int32 — slot-padded
    with the filler id F, ascending within a band), max per-band count."""
    F = fv_img.shape[0]
    fy = fv_img[:, :, 1]
    fymin = jnp.min(fy, axis=-1) - margin
    fymax = jnp.max(fy, axis=-1) + margin
    mask = ((fymax[None, :] >= ylo[:, None])
            & (fymin[None, :] <= yhi[:, None]) & valid[None, :])   # (nb, F)
    key = jnp.where(mask, F - jnp.arange(F, dtype=jnp.int32)[None, :], 0)
    vals, idx = jax.lax.top_k(key, K)                  # ascending face ids
    ids = jnp.where(vals > 0, idx, F)                  # F = filler row
    return ids, jnp.max(jnp.sum(mask, axis=-1))


def _gather_tabs(rows: jnp.ndarray, ids: jnp.ndarray, width: int
                 ) -> jnp.ndarray:
    """rows (B, F+1, width) gathered by ids (B, nb, K) →
    (B, nb, K/8, 8, width) blocked per-band tables."""
    B, nb, K = ids.shape
    flat = jax.vmap(lambda r, i: r[i])(rows, ids.reshape(B, nb * K))
    return flat.reshape(B, nb, K // _FB, _FB, width)


def _select_binned_pallas(xs, ys, tabs, interpret: bool = False):
    """Binned selection. xs/ys (nb, 8, 128); tabs (B, nb, K/8, 8, 12).
    Returns per-pixel bin *slot* (B, nb, 8, 128), −1 = background."""
    B, nb, n_kb = tabs.shape[:3]
    assert n_kb % _SEL_UNROLL == 0, "bin K must be a multiple of 64"
    kern = functools.partial(_sel_kernel, n_fb=n_kb)
    pspec = pl.BlockSpec((None, _PSUB, _PLANE), lambda b, i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, grid=(B, nb),
        in_specs=[pl.BlockSpec((None, None, n_kb, _FB, 12),
                               lambda b, i: (b, i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pspec, pspec],
        out_specs=pl.BlockSpec((None, None, _PSUB, _PLANE),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nb, _PSUB, _PLANE), jnp.int32),
        interpret=interpret,
    )(tabs, xs, ys)


def _select_faces_batched(pix: jnp.ndarray, fv_img: jnp.ndarray,
                          fv_z: jnp.ndarray, valid: jnp.ndarray,
                          height: int, width: int, K: int = _BIN_K,
                          interpret: bool = False) -> jnp.ndarray:
    """Batched per-pixel winning face ids (B, P) with band binning and
    dense fallback on bin overflow."""
    B, F = fv_img.shape[:2]
    P = pix.shape[0]
    dense = lambda: jax.vmap(lambda fi, fz, v: _select_faces_pallas(
        pix, fi, fz, v, interpret=interpret))(fv_img, fv_z, valid)
    if not (height * width >= _BIN_MIN_PIXELS and F > 2 * K):
        return dense()

    rows = jax.vmap(_face_rows)(fv_img, fv_z, valid)          # (B, F, 12)
    rows = jnp.concatenate(
        [rows, jnp.broadcast_to(_SEL_FILLER, (B, 1, 12))], axis=1)
    nb, xs, ys, _ = _soft_pix_blocks(pix, pad_value=2.0)
    ylo, yhi = _band_ranges(height, width, nb)
    ids, maxc = jax.vmap(
        lambda fi, v: _bin_faces(fi, v, ylo, yhi, K, 0.0))(fv_img, valid)
    overflow = jnp.max(maxc) > K

    def binned():
        tabs = _gather_tabs(rows, ids, 12)
        slots = _select_binned_pallas(xs, ys, tabs, interpret=interpret)
        slots = slots.reshape(B, nb, _PSUB * _PLANE)
        fid = jnp.take_along_axis(ids, jnp.maximum(slots, 0), axis=2)
        fid = jnp.where((slots >= 0) & (fid < F), fid, -1)
        return fid.reshape(B, -1)[:, :P]

    return jax.lax.cond(overflow, dense, binned)


def _interp_selected(pix: jnp.ndarray, face_idx: jnp.ndarray,
                     fv_img: jnp.ndarray, face_features: jnp.ndarray
                     ) -> jnp.ndarray:
    """Differentiable barycentric interpolation for the selected faces."""
    safe_idx = jnp.maximum(face_idx, 0)
    tri = fv_img[safe_idx]                 # (P, 3, 2)
    feat = face_features[safe_idx]         # (P, 3, C)
    v0, v1, v2 = tri[:, 0], tri[:, 1], tri[:, 2]

    def cross2(a, b):
        return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]

    w0 = cross2(v2 - v1, pix - v1)
    w1 = cross2(v0 - v2, pix - v2)
    w2 = cross2(v1 - v0, pix - v0)
    denom = w0 + w1 + w2
    denom = jnp.where(jnp.abs(denom) > _EPS, denom, 1.0)
    bary = jnp.stack([w0, w1, w2], axis=-1) / denom[..., None]
    out = jnp.einsum("pk,pkc->pc", bary, feat)
    return jnp.where((face_idx >= 0)[:, None], out, 0.0)


@functools.partial(jax.jit, static_argnums=(0, 1, 5, 6))
def _rasterize_batched(height: int, width: int, fv_z: jnp.ndarray,
                       fv_img: jnp.ndarray, face_features: jnp.ndarray,
                       face_chunk: int, pixel_tile: int
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    pix = pixel_grid_ndc(height, width)
    P = pix.shape[0]
    B = fv_img.shape[0]
    valid = jnp.ones((B, fv_img.shape[1]), bool)

    # ---- selection pass (no grad) ----
    if _use_pallas_select():
        face_idx = _select_faces_batched(
            pix, jax.lax.stop_gradient(fv_img),
            jax.lax.stop_gradient(fv_z), valid, height, width)  # (B, P)
    else:
        # XLA fallback, tiled over pixels to bound memory
        pad = (-P) % pixel_tile
        pix_p = jnp.pad(pix, ((0, pad), (0, 0)))
        tiles = pix_p.reshape(-1, pixel_tile, 2)

        def one(fi, fz, v):
            sel = jax.lax.map(
                lambda t: _select_faces(t, jax.lax.stop_gradient(fi),
                                        jax.lax.stop_gradient(fz), v,
                                        face_chunk),
                tiles)
            return sel.reshape(-1)[:P]

        face_idx = jax.vmap(one)(fv_img, fv_z, valid)

    # ---- differentiable pass ----
    feats = jax.vmap(
        lambda fid, fi, ff: _interp_selected(pix, fid, fi, ff))(
        face_idx, fv_img, face_features)
    C = face_features.shape[-1]
    return (feats.reshape(B, height, width, C),
            face_idx.reshape(B, height, width))


def rasterize(height: int, width: int, face_vertices_z: jnp.ndarray,
              face_vertices_image: jnp.ndarray, face_features: jnp.ndarray,
              face_chunk: int = 256, pixel_tile: int = 8192
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Hard z-buffer rasterization (kaolin `rasterize` surface,
    reference render.py:42-43).

    Args:
      face_vertices_z: (B, F, 3) camera-space z per face vertex.
      face_vertices_image: (B, F, 3, 2) NDC xy per face vertex.
      face_features: (B, F, 3, C) per-face-vertex attributes.
    Returns:
      image_features (B, H, W, C), face_idx (B, H, W) int32 (−1 background).
    """
    return _rasterize_batched(height, width, face_vertices_z,
                              face_vertices_image, face_features,
                              face_chunk, pixel_tile)


def _point_segment_dist2(p: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray
                         ) -> jnp.ndarray:
    """Squared distance point (P,2) ↔ segments (..., 2). Broadcast over faces."""
    ab = b - a                                     # (F, 2)
    ap = p[None, :, :] - a[:, None, :]             # (F, P, 2)
    denom = jnp.maximum(jnp.sum(ab * ab, axis=-1), _EPS)  # (F,)
    t = jnp.clip(jnp.einsum("fpd,fd->fp", ap, ab) / denom[:, None], 0.0, 1.0)
    closest = a[:, None, :] + t[..., None] * ab[:, None, :]
    d = p[None] - closest
    return jnp.sum(d * d, axis=-1)                 # (F, P)


def _soft_tile(pix: jnp.ndarray, fv_img: jnp.ndarray, sigma: float,
               face_chunk: int) -> jnp.ndarray:
    """1 − ∏(1 − p_f) for one pixel tile; differentiable in fv_img."""
    F = fv_img.shape[0]
    pad = (-F) % face_chunk
    fv = jnp.pad(fv_img, ((0, pad), (0, 0), (0, 0)))
    ok = jnp.pad(jnp.ones((F,), bool), (0, pad))
    fv_c = fv.reshape(-1, face_chunk, 3, 2)
    ok_c = ok.reshape(-1, face_chunk)

    def body(carry, chunk):
        tri, valid = chunk
        w, denom = _edge_weights(pix, tri)
        sgn = jnp.sign(denom)
        # degenerate faces (denom == 0 → sgn == 0 → w·0 ≥ 0 everywhere) must
        # not count as interior; they keep their boundary distance — matches
        # the Pallas path's zero_in handling in _soft_tables
        inside = (jnp.all(w * sgn[..., None] >= 0.0, axis=-1)
                  & (jnp.abs(denom) > _EPS))                     # (Fc, P)
        d2 = jnp.minimum(
            _point_segment_dist2(pix, tri[:, 0], tri[:, 1]),
            jnp.minimum(_point_segment_dist2(pix, tri[:, 1], tri[:, 2]),
                        _point_segment_dist2(pix, tri[:, 2], tri[:, 0])))
        prob = jnp.where(inside, 1.0, jnp.exp(-d2 / sigma))      # (Fc, P)
        prob = jnp.where(valid[:, None], prob, 0.0)
        return carry * jnp.prod(1.0 - prob, axis=0), None

    init = jnp.ones((pix.shape[0],), jnp.float32)
    prod, _ = jax.lax.scan(body, init, (fv_c, ok_c))
    return 1.0 - prod


# --------------------------------------------------------------------------
# Pallas soft-silhouette (TPU): the XLA scan's point-segment distances
# materialize (face_chunk, P, 2) intermediates through HBM in both passes.
# Forward sweeps per-face scalars against (8, 128)-pixel vregs in VMEM
# (same scheme as _sel_kernel); backward is a second kernel with the
# closed-form segment-distance gradient — with s = clip((p−a)·w/|w|², 0, 1)
# and r = (p−a) − s·w: ∂d²/∂a = −2(1−s)r, ∂d²/∂b = −2s·r (envelope theorem;
# the clamp endpoints coincide with the unclamped cases). dL/dp_f routes
# through prod/(1−p_f); inside pixels contribute zero (p ≡ 1 is flat).
# Measured v5e (sphere 3968 faces, 64²): fwd+bwd 22.3 → 8.6 ms vs XLA.
# Verified vs jax.grad of the XLA path to ~5e-6 rel (tests/test_rasterize).
# --------------------------------------------------------------------------


def _soft_rows(fv_img: jnp.ndarray) -> jnp.ndarray:
    """(F,3,2) → (F, 16): [edges·sign(9), v0,v1,v2 xy(6), valid(1)];
    degenerate faces keep their boundary distance but never test inside."""
    v0, v1, v2 = fv_img[:, 0], fv_img[:, 1], fv_img[:, 2]

    def edge(a, b):
        ex = -(b[:, 1] - a[:, 1])
        ey = (b[:, 0] - a[:, 0])
        ec = (b[:, 1] - a[:, 1]) * a[:, 0] - (b[:, 0] - a[:, 0]) * a[:, 1]
        return jnp.stack([ex, ey, ec], -1)

    e0, e1, e2 = edge(v1, v2), edge(v2, v0), edge(v0, v1)
    denom = ((v1[:, 0] - v0[:, 0]) * (v2[:, 1] - v0[:, 1])
             - (v1[:, 1] - v0[:, 1]) * (v2[:, 0] - v0[:, 0]))
    s = jnp.sign(denom)
    e0, e1, e2 = e0 * s[:, None], e1 * s[:, None], e2 * s[:, None]
    zero_in = jnp.abs(denom) <= _EPS
    e0 = jnp.where(zero_in[:, None], jnp.array([0.0, 0.0, -1.0]), e0)
    e1 = jnp.where(zero_in[:, None], 0.0, e1)
    e2 = jnp.where(zero_in[:, None], 0.0, e2)
    okf = jnp.ones((fv_img.shape[0], 1), jnp.float32)
    return jnp.concatenate([e0, e1, e2, v0, v1, v2, okf], axis=-1)


def _soft_tables(fv_img: jnp.ndarray) -> jnp.ndarray:
    """Blocked (Fp/8, 8, 16) tables; padded faces contribute probability 0."""
    tab = _soft_rows(fv_img)
    pad = (-tab.shape[0]) % _FB
    if pad:
        tab = jnp.pad(tab, ((0, pad), (0, 0)))
    return tab.reshape(-1, _FB, 16)


def _seg_d2(px, py, ax, ay, bx, by):
    wx, wy = bx - ax, by - ay
    ux, uy = px - ax, py - ay
    inv = 1.0 / jnp.maximum(wx * wx + wy * wy, _EPS)
    s = jnp.clip((ux * wx + uy * wy) * inv, 0.0, 1.0)
    rx, ry = ux - s * wx, uy - s * wy
    return rx * rx + ry * ry, s, rx, ry


def _face_prob(t, f, px, py, sigma):
    w0 = t[f, 0] * px + t[f, 1] * py + t[f, 2]
    w1 = t[f, 3] * px + t[f, 4] * py + t[f, 5]
    w2 = t[f, 6] * px + t[f, 7] * py + t[f, 8]
    inside = (w0 >= 0.0) & (w1 >= 0.0) & (w2 >= 0.0)
    d0, _, _, _ = _seg_d2(px, py, t[f, 9], t[f, 10], t[f, 11], t[f, 12])
    d1, _, _, _ = _seg_d2(px, py, t[f, 11], t[f, 12], t[f, 13], t[f, 14])
    d2_, _, _, _ = _seg_d2(px, py, t[f, 13], t[f, 14], t[f, 9], t[f, 10])
    d = jnp.minimum(d0, jnp.minimum(d1, d2_))
    p = jnp.where(inside, 1.0, jnp.exp(-d / sigma))
    return p * t[f, 15], d, inside


def _soft_fwd_kernel(tab_ref, px_ref, py_ref, out_ref, *, n_fb, sigma):
    px, py = px_ref[:], py_ref[:]

    def body(fb, prod):
        t = tab_ref[fb]
        for f in range(_FB):
            p, _, _ = _face_prob(t, f, px, py, sigma)
            prod = prod * (1.0 - p)
        return prod

    out_ref[:] = jax.lax.fori_loop(0, n_fb, body,
                                   jnp.ones(px.shape, jnp.float32))


def _soft_grad_rows(t, px, py, sigma, g, prod):
    """(8, 6) vertex-xy gradient rows for one 8-face block against one
    pixel block. Each segment distance is computed once and reused for both
    the min-distance probability and its gradient (the r1 kernel computed
    every _seg_d2 twice)."""
    rows = []
    for f in range(_FB):
        w0 = t[f, 0] * px + t[f, 1] * py + t[f, 2]
        w1 = t[f, 3] * px + t[f, 4] * py + t[f, 5]
        w2 = t[f, 6] * px + t[f, 7] * py + t[f, 8]
        inside = (w0 >= 0.0) & (w1 >= 0.0) & (w2 >= 0.0)
        verts = ((t[f, 9], t[f, 10], t[f, 11], t[f, 12]),
                 (t[f, 11], t[f, 12], t[f, 13], t[f, 14]),
                 (t[f, 13], t[f, 14], t[f, 9], t[f, 10]))
        segs = [_seg_d2(px, py, ax, ay, bx, by) for ax, ay, bx, by in verts]
        d = jnp.minimum(segs[0][0], jnp.minimum(segs[1][0], segs[2][0]))
        p = jnp.where(inside, 1.0, jnp.exp(-d / sigma)) * t[f, 15]
        dLdp = g * prod / jnp.maximum(1.0 - p, 1e-12)
        dLdd = jnp.where(inside, 0.0, dLdp * (-p / sigma)) * t[f, 15]
        vg = [jnp.zeros(px.shape, jnp.float32) for _ in range(6)]
        first = jnp.ones(px.shape, bool)
        for k, (dk, s, rx, ry) in enumerate(segs):
            is_min = (dk == d) & first
            first = first & ~is_min
            coef = jnp.where(is_min, dLdd, 0.0)
            ia, ib = k, (k + 1) % 3
            vg[2 * ia] += coef * (-2.0 * (1.0 - s) * rx)
            vg[2 * ia + 1] += coef * (-2.0 * (1.0 - s) * ry)
            vg[2 * ib] += coef * (-2.0 * s * rx)
            vg[2 * ib + 1] += coef * (-2.0 * s * ry)
        rows.append([jnp.sum(v) for v in vg])
    return jnp.array(rows)                      # (8, 6)


def _soft_bwd_kernel(tab_ref, px_ref, py_ref, g_ref, prod_ref, out_ref, *,
                     sigma, pb_axis=1):
    """Grid (..., face_blocks, pixel_blocks); out (8, 6) per face block,
    accumulated over pixel blocks (grid axis `pb_axis`)."""
    pb = pl.program_id(pb_axis)
    acc = _soft_grad_rows(tab_ref[:], px_ref[:], py_ref[:], sigma,
                          g_ref[:], prod_ref[:])

    @pl.when(pb == 0)
    def _():
        out_ref[:] = acc

    @pl.when(pb > 0)
    def _():
        out_ref[:] = out_ref[:] + acc


_SOFT_INTERPRET = False      # tests flip this to run the kernels on CPU


def _soft_pix_blocks(pix, *flat, pad_value: float = 5.0):
    P = pix.shape[0]
    pad = (-P) % (_PSUB * _PLANE)
    # padded pixels sit far outside NDC: exp(−d²/σ) underflows to exactly 0
    pixp = jnp.pad(pix, ((0, pad), (0, 0)), constant_values=pad_value)
    nb = (P + pad) // (_PSUB * _PLANE)
    xs = pixp[:, 0].reshape(nb, _PSUB, _PLANE)
    ys = pixp[:, 1].reshape(nb, _PSUB, _PLANE)
    extra = [jnp.pad(a, (0, pad)).reshape(nb, _PSUB, _PLANE) for a in flat]
    return nb, xs, ys, extra


# ---- batched soft silhouette with band binning (VERDICT r1 task 1) ----

# faces with boundary distance d to a band satisfy exp(−d²/σ) < 1e-12 when
# d > √(27.7·σ); beyond that margin a face cannot contribute to the band's
# probability or gradient above fp32 noise, so the bin can drop it.
# Gradient bound: |∂p/∂d| = (2d/σ)·exp(−d²/σ), so at the margin the dropped
# gradient tail is ≤ 2√(27.7/σ)·1e-12 ≈ 1e-9·σ^(−1/2) (~1e-7 at σ=1e-4) —
# the binned VJP approximates the dense VJP to that bound. If σ shrinks, the
# margin shrinks as √σ while the tail grows as σ^(−1/2): at σ=1e-6 the tail
# is ~1e-6, still below the test tolerances, but re-derive before going
# lower (ADVICE r2).
_SOFT_TAIL = 27.7


def _pix_block_batch(a: jnp.ndarray, nb: int) -> jnp.ndarray:
    """(B, P) → (B, nb, 8, 128) zero-padded pixel blocks."""
    B, P = a.shape
    pad = nb * _PSUB * _PLANE - P
    return jnp.pad(a, ((0, 0), (0, pad))).reshape(B, nb, _PSUB, _PLANE)


def _soft_fwd_dense_batched(xs, ys, tabs, sigma, interpret):
    """tabs (B, n_fb, 8, 16) → prod (B, nb, 8, 128)."""
    B, n_fb = tabs.shape[:2]
    nb = xs.shape[0]
    kern = functools.partial(_soft_fwd_kernel, n_fb=n_fb, sigma=sigma)
    pspec = pl.BlockSpec((None, _PSUB, _PLANE), lambda b, i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, grid=(B, nb),
        in_specs=[pl.BlockSpec((None, n_fb, _FB, 16),
                               lambda b, i: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM), pspec, pspec],
        out_specs=pl.BlockSpec((None, None, _PSUB, _PLANE),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nb, _PSUB, _PLANE), jnp.float32),
        interpret=interpret,
    )(tabs, xs, ys)


def _soft_fwd_binned(xs, ys, tabs, sigma, interpret):
    """tabs (B, nb, K/8, 8, 16) per-band bins → prod (B, nb, 8, 128)."""
    B, nb, n_kb = tabs.shape[:3]
    kern = functools.partial(_soft_fwd_kernel, n_fb=n_kb, sigma=sigma)
    pspec = pl.BlockSpec((None, _PSUB, _PLANE), lambda b, i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, grid=(B, nb),
        in_specs=[pl.BlockSpec((None, None, n_kb, _FB, 16),
                               lambda b, i: (b, i, 0, 0, 0),
                               memory_space=pltpu.VMEM), pspec, pspec],
        out_specs=pl.BlockSpec((None, None, _PSUB, _PLANE),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nb, _PSUB, _PLANE), jnp.float32),
        interpret=interpret,
    )(tabs, xs, ys)


def _soft_bwd_binned_kernel(tab_ref, px_ref, py_ref, g_ref, prod_ref,
                            out_ref, *, sigma):
    """Grid (B, nb, K/8); each (band, slot-block) pair is visited once —
    no cross-block accumulation (bands partition the pixels)."""
    out_ref[:] = _soft_grad_rows(tab_ref[:], px_ref[:], py_ref[:], sigma,
                                 g_ref[:], prod_ref[:])


def _soft_bwd_dense_batched(tabs, xs, ys, gs, ps, sigma, interpret):
    """tabs (B, n_fb, 8, 16) → per-face-block grads (B, n_fb, 8, 6)."""
    B, n_fb = tabs.shape[:2]
    nb = xs.shape[0]
    kern = functools.partial(_soft_bwd_kernel, sigma=sigma, pb_axis=2)
    xspec = pl.BlockSpec((None, _PSUB, _PLANE), lambda b, f, i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    gspec = pl.BlockSpec((None, None, _PSUB, _PLANE),
                         lambda b, f, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, grid=(B, n_fb, nb),
        in_specs=[pl.BlockSpec((None, None, _FB, 16),
                               lambda b, f, i: (b, f, 0, 0),
                               memory_space=pltpu.VMEM),
                  xspec, xspec, gspec, gspec],
        out_specs=pl.BlockSpec((None, None, _FB, 6),
                               lambda b, f, i: (b, f, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_fb, _FB, 6), jnp.float32),
        interpret=interpret,
    )(tabs, xs, ys, gs, ps)


def _soft_bwd_binned(tabs, xs, ys, gs, ps, sigma, interpret):
    """tabs (B, nb, K/8, 8, 16) → per-slot grads (B, nb, K/8, 8, 6)."""
    B, nb, n_kb = tabs.shape[:3]
    kern = functools.partial(_soft_bwd_binned_kernel, sigma=sigma)
    xspec = pl.BlockSpec((None, _PSUB, _PLANE), lambda b, i, k: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    gspec = pl.BlockSpec((None, None, _PSUB, _PLANE),
                         lambda b, i, k: (b, i, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, grid=(B, nb, n_kb),
        in_specs=[pl.BlockSpec((None, None, None, _FB, 16),
                               lambda b, i, k: (b, i, k, 0, 0),
                               memory_space=pltpu.VMEM),
                  xspec, xspec, gspec, gspec],
        out_specs=pl.BlockSpec((None, None, None, _FB, 6),
                               lambda b, i, k: (b, i, k, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nb, n_kb, _FB, 6), jnp.float32),
        interpret=interpret,
    )(tabs, xs, ys, gs, ps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _soft_batched_pallas(fv_img: jnp.ndarray, height: int, width: int,
                         sigma: float, K: int) -> jnp.ndarray:
    mask, _, _, _ = _soft_batched_fwd_impl(fv_img, height, width, sigma, K)
    return mask


def _soft_batched_bins(fv_img, height, width, sigma, K, nb):
    B, F = fv_img.shape[:2]
    margin = float((_SOFT_TAIL * sigma) ** 0.5)
    ylo, yhi = _band_ranges(height, width, nb)
    valid = jnp.ones((F,), bool)
    ids, maxc = jax.vmap(
        lambda fi: _bin_faces(fi, valid, ylo, yhi, K, margin))(fv_img)
    return ids, jnp.max(maxc) > K


def _soft_bins_engage(height: int, width: int, F: int, K: int) -> bool:
    """Static gate: binning only pays off above ~128² and when the bin is
    meaningfully smaller than the face count."""
    return height * width >= _BIN_MIN_PIXELS and F > 2 * K


def _soft_batched_fwd_impl(fv_img, height, width, sigma, K):
    B, F = fv_img.shape[:2]
    pix = pixel_grid_ndc(height, width)
    P = pix.shape[0]
    nb, xs, ys, _ = _soft_pix_blocks(pix)

    def dense():
        tabs = jax.vmap(_soft_tables)(fv_img)
        return _soft_fwd_dense_batched(xs, ys, tabs, sigma, _SOFT_INTERPRET)

    if _soft_bins_engage(height, width, F, K):
        ids, overflow = _soft_batched_bins(fv_img, height, width, sigma,
                                           K, nb)

        def binned():
            rows = jax.vmap(_soft_rows)(fv_img)
            rows = jnp.concatenate([rows, jnp.zeros((B, 1, 16))], axis=1)
            tabs = _gather_tabs(rows, ids, 16)
            return _soft_fwd_binned(xs, ys, tabs, sigma, _SOFT_INTERPRET)

        prod = jax.lax.cond(overflow, dense, binned)
    else:
        ids = jnp.zeros((B, 0, 0), jnp.int32)
        overflow = jnp.array(True)
        prod = dense()
    prodf = prod.reshape(B, -1)[:, :P]
    mask = (1.0 - prodf).reshape(B, height, width)
    return mask, prodf, ids, overflow


def _soft_batched_vjp_fwd(fv_img, height, width, sigma, K):
    mask, prodf, ids, overflow = _soft_batched_fwd_impl(
        fv_img, height, width, sigma, K)
    return mask, (fv_img, prodf, ids, overflow)


def _soft_batched_vjp_bwd(height, width, sigma, K, res, g):
    fv_img, prodf, ids, overflow = res
    B, F = fv_img.shape[:2]
    pix = pixel_grid_ndc(height, width)
    nb, xs, ys, _ = _soft_pix_blocks(pix)
    gs = _pix_block_batch(g.reshape(B, -1), nb)
    ps = _pix_block_batch(prodf, nb)

    def dense():
        tabs = jax.vmap(_soft_tables)(fv_img)
        out = _soft_bwd_dense_batched(tabs, xs, ys, gs, ps, sigma,
                                      _SOFT_INTERPRET)
        return out.reshape(B, -1, 6)[:, :F].reshape(B, F, 3, 2)

    if not _soft_bins_engage(height, width, F, K):
        return (dense(),)

    def binned():
        rows = jax.vmap(_soft_rows)(fv_img)
        rows = jnp.concatenate([rows, jnp.zeros((B, 1, 16))], axis=1)
        tabs = _gather_tabs(rows, ids, 16)
        out = _soft_bwd_binned(tabs, xs, ys, gs, ps, sigma, _SOFT_INTERPRET)
        K_ = ids.shape[-1]
        flat = out.reshape(B, nb * K_, 6)
        grads = jax.vmap(
            lambda o, i: jax.ops.segment_sum(o, i, num_segments=F + 1))(
            flat, ids.reshape(B, nb * K_))
        return grads[:, :F].reshape(B, F, 3, 2)

    return (jax.lax.cond(overflow, dense, binned),)


_soft_batched_pallas.defvjp(_soft_batched_vjp_fwd, _soft_batched_vjp_bwd)


@functools.partial(jax.jit, static_argnums=(0, 1, 3, 4, 5))
def _soft_single(height: int, width: int, fv_img: jnp.ndarray, sigma: float,
                 face_chunk: int, pixel_tile: int) -> jnp.ndarray:
    pix = pixel_grid_ndc(height, width)
    P = pix.shape[0]
    pad = (-P) % pixel_tile
    tiles = jnp.pad(pix, ((0, pad), (0, 0))).reshape(-1, pixel_tile, 2)
    out = jax.lax.map(
        lambda t: _soft_tile(t, fv_img, sigma, face_chunk), tiles)
    return out.reshape(-1)[:P].reshape(height, width)


def soft_silhouette(height: int, width: int, face_vertices_image: jnp.ndarray,
                    sigma: float = 1e-4, face_chunk: int = 256,
                    pixel_tile: int = 8192, bin_k: int = _SOFT_BIN_K
                    ) -> jnp.ndarray:
    """DIB-R soft silhouette (B, H, W), differentiable to vertex positions
    (reference: dibr_rasterization's soft mask, latent_paint_mesh/models/
    render.py:231-239)."""
    if _use_pallas_select():
        return _soft_batched_pallas(face_vertices_image, height, width,
                                    sigma, bin_k)
    fn = functools.partial(_soft_single, height, width, sigma=sigma,
                           face_chunk=face_chunk, pixel_tile=pixel_tile)
    return jax.vmap(lambda fv: fn(fv))(face_vertices_image)


def dibr_rasterization(height: int, width: int, face_vertices_z: jnp.ndarray,
                       face_vertices_image: jnp.ndarray,
                       face_features: jnp.ndarray,
                       face_normals_z: Optional[jnp.ndarray] = None,
                       sigma: float = 1e-4
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """DIB-R: hard interior attributes + soft silhouette
    (kaolin `dibr_rasterization` surface, reference render.py:231-239).

    Returns (image_features, soft_mask, face_idx). `face_normals_z` is
    accepted for surface parity (backface information) but, like the
    reference's usage with `abs(normals)` (render.py:237 — double-sided
    faces), it does not cull.
    """
    feats, face_idx = rasterize(height, width, face_vertices_z,
                                face_vertices_image, face_features)
    soft = soft_silhouette(height, width, face_vertices_image, sigma=sigma)
    return feats, soft, face_idx
