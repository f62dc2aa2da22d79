"""Oracle tests: hand-computed expectations through camera→NDC→rasterize→
texture (VERDICT r2 task 6 / PARITY.md "proved vs assumed" ledger).

Every expected value below is derived BY HAND in the comments — never from
the code under test — so these pin the conventions the reference inherits
from kaolin (z-sign, NDC y-flip, inclusive edges, lowest-id ties, the
grid_sample texture convention; reference
src/latent_paint/models/render.py:11,20-31,42-69).
"""
import math

import jax
import jax.numpy as jnp
import numpy as np

from tpunerf.core import camera as cam
from tpunerf.kernels import rasterize as rast
from tpunerf.kernels import texture as texk


def _pix_axes(n=8):
    """Pixel-center NDC axes (hand formula, matches kaolin's grid):
    xs = (c+0.5)/n·2−1 (x right), ys = 1−(r+0.5)/n·2 (row 0 = +y = top)."""
    xs = (np.arange(n) + 0.5) / n * 2.0 - 1.0
    ys = 1.0 - (np.arange(n) + 0.5) / n * 2.0
    return xs, ys


def test_camera_projection_oracle():
    """theta=π/2, phi=0, r=2 puts the camera at (0,0,2) looking at the
    origin, up +Y. Hand derivation: z_axis=(0,0,1), x_axis=up×z=(1,0,0),
    y_axis=z×x=(0,1,0) → rotation = identity, translation = (0,0,−2), so
    cam(p) = p − (0,0,2). With fovy=π/2 (tan=1) the projection coeffs are
    (1,1,−1): NDC = (x/−z_cam·(−1)·…) = (x/2, y/2) for world z=0 points."""
    tr = cam.camera_transform_from_view(math.pi / 2, 0.0, 2.0)
    verts = jnp.array([[0.4, -0.6, 0.0], [0.0, 0.0, 0.0], [-1.0, 1.0, 0.5]])
    vc = np.asarray(cam.transform_vertices(verts, tr))
    np.testing.assert_allclose(
        vc, [[0.4, -0.6, -2.0], [0.0, 0.0, -2.0], [-1.0, 1.0, -1.5]],
        atol=1e-6)
    ndc = np.asarray(cam.perspective_project(
        jnp.asarray(vc), cam.perspective_projection(math.pi / 2)))
    # world (x, y, z) → NDC (x/(2−z), y/(2−z)); third vertex: /1.5
    np.testing.assert_allclose(
        ndc, [[0.2, -0.3], [0.0, 0.0], [-1 / 1.5, 1 / 1.5]], atol=1e-6)


def test_rasterize_halfplane_and_inclusive_boundary_oracle():
    """NDC triangle (−1,−1),(1,−1),(−1,1) on an 8×8 grid: a pixel center
    (x, y) is inside iff x + y ≤ 0 (hypotenuse x+y=0; edges are INCLUSIVE —
    w·sign(denom) ≥ 0). The 8 pixel centers exactly on the hypotenuse
    (x = −y, exactly representable in f32, edge function exactly 0) must be
    covered."""
    fv_img = jnp.array([[[[-1.0, -1.0], [1.0, -1.0], [-1.0, 1.0]]]])
    fv_z = jnp.full((1, 1, 3), -2.0)
    feats = jnp.ones((1, 1, 3, 1))
    _, fid = rast.rasterize(8, 8, fv_z, fv_img, feats)
    xs, ys = _pix_axes(8)
    inside = (xs[None, :] + ys[:, None]) <= 0.0
    # sanity of the hand-derivation itself: exactly 8 boundary pixels
    assert int(np.sum(np.isclose(xs[None, :] + ys[:, None], 0.0))) == 8
    np.testing.assert_array_equal(np.asarray(fid[0]),
                                  np.where(inside, 0, -1))


def test_zbuffer_near_face_wins_oracle():
    """Camera space looks down −z, so z = −2 is NEARER than z = −3. Two
    identical full-screen triangles, the far one listed first (id 0): every
    covered pixel must select id 1."""
    tri = [[-3.0, -3.0], [3.0, -3.0], [0.0, 3.0]]
    fv_img = jnp.array([[tri, tri]])
    fv_z = jnp.array([[[-3.0] * 3, [-2.0] * 3]])
    feats = jnp.ones((1, 2, 3, 1))
    _, fid = rast.rasterize(8, 8, fv_z, fv_img, feats)
    assert (np.asarray(fid) == 1).all()


def test_equal_depth_lowest_face_id_tie_oracle():
    """Two byte-identical faces at identical depth: the winner everywhere
    must be the LOWER id (kaolin tie convention the selection kernels
    implement)."""
    tri = [[-3.0, -3.0], [3.0, -3.0], [0.0, 3.0]]
    fv_img = jnp.array([[tri, tri]])
    fv_z = jnp.full((1, 2, 3), -2.0)
    feats = jnp.ones((1, 2, 3, 1))
    _, fid = rast.rasterize(8, 8, fv_z, fv_img, feats)
    assert (np.asarray(fid) == 0).all()


def test_ndc_y_flip_oracle():
    """World +y maps to the TOP image rows. A triangle living entirely in
    NDC y > 0 must cover only rows 0..3 of an 8-row image (row 0 = y≈0.875)
    and no pixels in the bottom half."""
    fv_img = jnp.array([[[[-0.9, 0.05], [0.9, 0.05], [0.0, 0.95]]]])
    fv_z = jnp.full((1, 1, 3), -2.0)
    feats = jnp.ones((1, 1, 3, 1))
    _, fid = rast.rasterize(8, 8, fv_z, fv_img, feats)
    fid = np.asarray(fid[0])
    assert (fid[4:] == -1).all()          # bottom half empty
    assert (fid[:4] == 0).any()           # top half covered


def test_barycentric_affine_exactness_oracle():
    """Barycentric interpolation reproduces any affine function of NDC
    exactly: with per-vertex features f(v) = 0.3 + 0.5·x − 0.25·y, every
    covered pixel must read f(pixel center)."""
    tri = np.array([[-1.0, -1.0], [1.0, -1.0], [-1.0, 1.0]])
    f = lambda p: 0.3 + 0.5 * p[..., 0] - 0.25 * p[..., 1]  # noqa: E731
    fv_img = jnp.asarray(tri)[None, None]
    fv_z = jnp.full((1, 1, 3), -2.0)
    feats = jnp.asarray(f(tri))[None, None, :, None]
    img, fid = rast.rasterize(8, 8, fv_z, fv_img, feats)
    xs, ys = _pix_axes(8)
    px = np.stack(np.meshgrid(xs, ys, indexing="xy"), axis=-1)  # (8, 8, 2)
    expected = f(px)
    covered = np.asarray(fid[0]) >= 0
    np.testing.assert_allclose(np.asarray(img[0, ..., 0])[covered],
                               expected[covered], atol=1e-5)


def test_full_chain_quadrant_texture_oracle():
    """Full camera→NDC→rasterize→UV→texture chain with hand-computed pixels.

    Camera (0,0,2) (θ=π/2, φ=0, r=2), fovy=π/2 → world (x,y,0) lands at NDC
    (x/2, y/2). A [−2,2]² quad with uv = (world+2)/4 therefore gives pixel
    (r,c) the uv ((x_c+1)/2, (y_r+1)/2). Nearest sampling of a 2×2 texture
    (grid_sample convention: px = u·2−0.5, py = (1−v)·2−0.5, texture row 0
    is v=1): left cols → texel x 0, right → 1; TOP rows (y>0 ⇒ v>0.5) →
    texel row 0, bottom → row 1. Expected image = 4 exact quadrants."""
    from tpunerf.meshrep.render import CameraSpec, render_single_view_texture

    verts = jnp.array([[-2.0, -2.0, 0.0], [2.0, -2.0, 0.0],
                       [2.0, 2.0, 0.0], [-2.0, 2.0, 0.0]])
    faces = jnp.array([[0, 1, 2], [0, 2, 3]])
    uvs = (verts[:, :2] + 2.0) / 4.0
    uv_face_attr = cam.index_vertices_by_faces(uvs, faces)[None]
    tex = jnp.array([[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]],
                     [[0.0, 0.0, 1.0], [1.0, 1.0, 0.0]]])
    out = render_single_view_texture(
        verts, faces, uv_face_attr, tex[None], math.pi / 2, 0.0, 2.0,
        spec=CameraSpec(fovy=math.pi / 2), dims=(8, 8),
        interpolation_mode="nearest")
    img = np.asarray(out.image[0])
    expected = np.zeros((8, 8, 3), np.float32)
    expected[:4, :4] = [1, 0, 0]     # top-left: texel (0,0)
    expected[:4, 4:] = [0, 1, 0]     # top-right: texel (0,1)
    expected[4:, :4] = [0, 0, 1]     # bottom-left: texel (1,0)
    expected[4:, 4:] = [1, 1, 0]     # bottom-right: texel (1,1)
    np.testing.assert_allclose(img, expected, atol=1e-6)
    assert (np.asarray(out.mask[0]) == 1.0).all()   # quad covers the frame
    # depth channel: every covered pixel sits on the world z=0 plane, 2 in
    # front of the camera → depth (−z_cam) = 2 exactly
    np.testing.assert_allclose(np.asarray(out.depth[0]), 2.0, atol=1e-5)
