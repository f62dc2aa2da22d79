import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpunerf.kernels import rasterize as rast


def _single_tri(z=-1.0):
    # big triangle covering the NDC center
    fv_img = jnp.array([[[[-0.9, -0.9], [0.9, -0.9], [0.0, 0.9]]]])
    fv_z = jnp.full((1, 1, 3), z)
    return fv_z, fv_img


def test_single_triangle_coverage_and_background():
    fv_z, fv_img = _single_tri()
    feats = jnp.ones((1, 1, 3, 1))
    img, fid = rast.rasterize(16, 16, fv_z, fv_img, feats)
    assert img.shape == (1, 16, 16, 1)
    fid = np.asarray(fid[0])
    # center pixel covered, corner not
    assert fid[8, 8] == 0
    assert fid[0, 0] == -1
    assert np.asarray(img)[0, 8, 8, 0] == pytest.approx(1.0)
    assert np.asarray(img)[0, 0, 0, 0] == 0.0


def test_zbuffer_picks_closer_face():
    # two stacked triangles; z = −1 is closer than z = −2
    tri = jnp.array([[[-0.9, -0.9], [0.9, -0.9], [0.0, 0.9]]])
    fv_img = jnp.stack([tri, tri], axis=1)  # (1, 2, 3, 2)
    fv_z = jnp.stack([jnp.full((1, 3), -2.0), jnp.full((1, 3), -1.0)],
                     axis=1)
    feats = jnp.stack([jnp.full((1, 3, 1), 5.0), jnp.full((1, 3, 1), 7.0)],
                      axis=1)
    img, fid = rast.rasterize(8, 8, fv_z, fv_img, feats)
    assert np.asarray(fid)[0, 4, 4] == 1
    assert np.asarray(img)[0, 4, 4, 0] == pytest.approx(7.0)


def test_barycentric_interpolation_linear_function():
    # attribute equal to x+y must be reproduced exactly inside the face
    fv_img = jnp.array([[[[-1.0, -1.0], [1.0, -1.0], [0.0, 1.0]]]])
    fv_z = jnp.full((1, 1, 3), -1.0)
    feats = jnp.array([[[[-2.0], [0.0], [1.0]]]])  # x+y at each vertex
    H = W = 32
    img, fid = rast.rasterize(H, W, fv_z, fv_img, feats)
    pix = np.asarray(rast.pixel_grid_ndc(H, W)).reshape(H, W, 2)
    covered = np.asarray(fid[0]) >= 0
    expect = pix[..., 0] + pix[..., 1]
    got = np.asarray(img)[0, ..., 0]
    np.testing.assert_allclose(got[covered], expect[covered], atol=1e-5)


def test_winding_order_insensitive():
    fv_img_ccw = jnp.array([[[[-0.9, -0.9], [0.9, -0.9], [0.0, 0.9]]]])
    fv_img_cw = fv_img_ccw[:, :, ::-1, :]
    fv_z = jnp.full((1, 1, 3), -1.0)
    feats = jnp.ones((1, 1, 3, 1))
    _, fid1 = rast.rasterize(16, 16, fv_z, fv_img_ccw, feats)
    _, fid2 = rast.rasterize(16, 16, fv_z, fv_img_cw, feats)
    np.testing.assert_array_equal(np.asarray(fid1) >= 0,
                                  np.asarray(fid2) >= 0)


def test_many_faces_chunking():
    # 300 faces (crosses the 256 face-chunk boundary); last face on top
    F = 300
    tri = jnp.array([[-0.5, -0.5], [0.5, -0.5], [0.0, 0.5]])
    fv_img = jnp.broadcast_to(tri, (1, F, 3, 2))
    zvals = -2.0 + 0.001 * jnp.arange(F)  # later faces closer
    fv_z = jnp.broadcast_to(zvals[None, :, None], (1, F, 3))
    feats = jnp.broadcast_to(zvals[None, :, None, None], (1, F, 3, 1))
    img, fid = rast.rasterize(8, 8, fv_z, fv_img, feats)
    assert np.asarray(fid)[0, 4, 4] == F - 1


def test_soft_silhouette_inside_outside():
    fv_img = jnp.array([[[[-0.8, -0.8], [0.8, -0.8], [0.0, 0.8]]]])
    soft = rast.soft_silhouette(16, 16, fv_img, sigma=1e-3)
    s = np.asarray(soft[0])
    assert s[8, 8] == pytest.approx(1.0, abs=1e-5)   # inside
    assert s[0, 15] < 0.1                            # far corner


def test_soft_silhouette_gradient_flows_to_vertices():
    def loss(fv_img):
        return jnp.sum(rast.soft_silhouette(16, 16, fv_img, sigma=1e-2))

    fv_img = jnp.array([[[[-0.5, -0.5], [0.5, -0.5], [0.0, 0.5]]]])
    g = jax.grad(loss)(fv_img)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_hard_raster_gradient_flows_to_attributes():
    fv_z, fv_img = _single_tri()

    def loss(feats):
        img, _ = rast.rasterize(8, 8, fv_z, fv_img, feats)
        return jnp.sum(img ** 2)

    g = jax.grad(loss)(jnp.ones((1, 1, 3, 1)))
    assert np.abs(np.asarray(g)).sum() > 0


def test_dibr_rasterization_api():
    fv_z, fv_img = _single_tri()
    feats = jnp.ones((1, 1, 3, 4))
    img, soft, fid = rast.dibr_rasterization(8, 8, fv_z, fv_img, feats)
    assert img.shape == (1, 8, 8, 4)
    assert soft.shape == (1, 8, 8)
    assert fid.shape == (1, 8, 8)


def test_pallas_selection_matches_xla_scan():
    """The TPU Pallas selection kernel (interpret mode on CPU) must agree
    with the XLA chunked-scan selection exactly, including tie-breaking
    (lowest face id) and background pixels."""
    from tpunerf.core import camera as cam
    from tpunerf.kernels.rasterize import (_select_faces,
                                           _select_faces_pallas,
                                           pixel_grid_ndc)
    from tpunerf.meshrep.shapes import uv_sphere

    mesh = uv_sphere()
    verts = mesh.vertices * 0.6
    faces = mesh.faces
    tr = cam.camera_transform_from_view(1.0, 0.7, 1.3)
    fv_cam, fv_img, _ = cam.prepare_vertices(
        verts, faces, cam.perspective_projection(), tr)
    fv_z = fv_cam[..., 2]
    valid = jnp.ones((faces.shape[0],), bool)
    pix = pixel_grid_ndc(48, 48)
    ref = _select_faces(pix, fv_img, fv_z, valid, 256)
    got = _select_faces_pallas(pix, fv_img, fv_z, valid, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_pallas_soft_silhouette_matches_xla(monkeypatch):
    """Pallas soft-silhouette fwd + custom-VJP bwd (interpret mode on CPU)
    vs the XLA scan and its jax.grad."""
    import tpunerf.kernels.rasterize as R
    from tpunerf.core import camera as cam
    from tpunerf.meshrep.shapes import uv_sphere

    monkeypatch.setattr(R, "_SOFT_INTERPRET", True)
    mesh = uv_sphere(12, 16)
    verts = mesh.vertices * 0.6
    faces = mesh.faces
    tr = cam.camera_transform_from_view(1.0, 0.7, 1.3)
    _, fv_img, _ = cam.prepare_vertices(
        verts, faces, cam.perspective_projection(), tr)
    sigma = 1e-4
    H = W = 32
    pix = R.pixel_grid_ndc(H, W)

    ref = R._soft_tile(pix, fv_img, sigma, 256).reshape(H, W)
    got = R._soft_single_pallas(fv_img, H, W, sigma)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-6)

    g = jax.random.normal(jax.random.key(0), (H, W))
    ref_grad = jax.grad(lambda fv: jnp.sum(
        R._soft_tile(pix, fv, sigma, 256).reshape(H, W) * g))(fv_img)
    got_grad = jax.grad(lambda fv: jnp.sum(
        R._soft_single_pallas(fv, H, W, sigma) * g))(fv_img)
    scale = float(jnp.abs(ref_grad).max())
    np.testing.assert_allclose(np.asarray(got_grad), np.asarray(ref_grad),
                               atol=5e-6 * max(scale, 1.0))


def test_degenerate_face_xla_matches_pallas_soft(monkeypatch):
    """Exactly-degenerate faces (zero-area) must not read as 'interior
    everywhere' in the XLA fallback — both backends exclude them from the
    inside test and keep only boundary distance (ADVICE.md r1)."""
    import tpunerf.kernels.rasterize as R

    monkeypatch.setattr(R, "_SOFT_INTERPRET", True)
    # one healthy face + one zero-area face (all three verts collinear)
    fv = jnp.array([[[-0.5, -0.5], [0.5, -0.5], [0.0, 0.5]],
                    [[0.2, 0.2], [0.2, 0.2], [0.2, 0.2]]])
    sigma = 1e-3
    H = W = 16
    pix = R.pixel_grid_ndc(H, W)
    ref = R._soft_tile(pix, fv, sigma, 256).reshape(H, W)
    got = R._soft_single_pallas(fv, H, W, sigma)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-6)
    # far corner must NOT be driven to 1 by the degenerate face
    assert np.asarray(ref)[0, 15] < 0.5
