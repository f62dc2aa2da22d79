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
    got = R._soft_batched_pallas(fv_img[None], H, W, sigma, 768)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref),
                               atol=5e-6)

    g = jax.random.normal(jax.random.key(0), (H, W))
    ref_grad = jax.grad(lambda fv: jnp.sum(
        R._soft_tile(pix, fv, sigma, 256).reshape(H, W) * g))(fv_img)
    got_grad = jax.grad(lambda fv: jnp.sum(
        R._soft_batched_pallas(fv[None], H, W, sigma, 768)[0] * g))(fv_img)
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
    got = R._soft_batched_pallas(fv[None], H, W, sigma, 768)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref),
                               atol=5e-6)
    # far corner must NOT be driven to 1 by the degenerate face
    assert np.asarray(ref)[0, 15] < 0.5


def _sphere_proj(n_lat=24, n_lon=32, scale=0.6, theta=1.0, phi=0.7, r=1.3):
    from tpunerf.core import camera as cam
    from tpunerf.meshrep.shapes import uv_sphere

    mesh = uv_sphere(n_lat, n_lon)
    verts = mesh.vertices * scale
    tr = cam.camera_transform_from_view(theta, phi, r)
    fv_cam, fv_img, _ = cam.prepare_vertices(
        verts, mesh.faces, cam.perspective_projection(), tr)
    return fv_img, fv_cam[..., 2]


def test_binned_selection_matches_xla():
    """Band-binned Pallas selection (interpret mode) vs the XLA scan at a
    resolution where binning engages, including tie-breaking."""
    import tpunerf.kernels.rasterize as R

    fv_img, fv_z = _sphere_proj()
    F = fv_img.shape[0]
    K = 512
    assert F > 2 * K, "test must engage the binned branch"
    H = W = 128
    pix = R.pixel_grid_ndc(H, W)
    # confirm the bins don't overflow so the binned branch truly runs
    nb = (H * W) // (R._PSUB * R._PLANE)
    ylo, yhi = R._band_ranges(H, W, nb)
    _, maxc = R._bin_faces(fv_img, jnp.ones((F,), bool), ylo, yhi, K, 0.0)
    assert int(maxc) <= K, int(maxc)

    valid = jnp.ones((F,), bool)
    ref = R._select_faces(pix, fv_img, fv_z, valid, 256)
    got = R._select_faces_batched(pix, fv_img[None], fv_z[None],
                                  valid[None], H, W, K=K, interpret=True)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref))


def test_binned_selection_overflow_falls_back():
    """Bins that overflow K must route through the dense kernel and still
    match the XLA scan (a dropped face would be silently wrong)."""
    import tpunerf.kernels.rasterize as R

    F = 200
    tri = jnp.array([[-0.9, -0.9], [0.9, -0.9], [0.0, 0.9]])
    fv_img = jnp.broadcast_to(tri, (F, 3, 2))
    fv_z = jnp.broadcast_to((-2.0 + 0.001 * jnp.arange(F))[:, None], (F, 3))
    K = 64
    assert F > 2 * K
    H = W = 128
    pix = R.pixel_grid_ndc(H, W)
    valid = jnp.ones((F,), bool)
    ref = R._select_faces(pix, fv_img, fv_z, valid, 256)
    got = R._select_faces_batched(pix, fv_img[None], fv_z[None],
                                  valid[None], H, W, K=K, interpret=True)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref))


def test_binned_soft_matches_xla(monkeypatch):
    """Binned batched soft silhouette fwd + custom-VJP bwd vs the XLA scan
    and its jax.grad, at a binning-engaged resolution, batch of 2 poses.

    The bwd comparison tolerates a tiny outlier fraction: at exact
    min-segment-distance ties the closed-form VJP routes the full gradient
    to the first minimal segment while XLA autodiff splits subgradients
    50/50 — both valid; measured on TPU the binned and dense Pallas paths
    agree to 4e-10 while one face in ~350 differs from autodiff by ~1e-4
    relative (bin-independent, pre-existing kernel semantics)."""
    import tpunerf.kernels.rasterize as R

    monkeypatch.setattr(R, "_SOFT_INTERPRET", True)
    fv_a, _ = _sphere_proj(12, 16, theta=1.0, phi=0.7)
    fv_b, _ = _sphere_proj(12, 16, theta=0.6, phi=2.1)
    fv = jnp.stack([fv_a, fv_b])
    F = fv.shape[1]
    sigma = 1e-4
    K = 128
    assert F > 2 * K
    H = W = 128
    _, overflow = R._soft_batched_bins(fv, H, W, sigma, K,
                                       (H * W) // (R._PSUB * R._PLANE))
    assert not bool(overflow), "test must engage the binned branch"

    pix = R.pixel_grid_ndc(H, W)
    got = R._soft_batched_pallas(fv, H, W, sigma, K)
    for b in range(2):
        ref = R._soft_tile(pix, fv[b], sigma, 256).reshape(H, W)
        np.testing.assert_allclose(np.asarray(got[b]), np.asarray(ref),
                                   atol=5e-6)

    g = jax.random.normal(jax.random.key(0), (2, H, W))
    got_grad = jax.grad(lambda v: jnp.sum(
        R._soft_batched_pallas(v, H, W, sigma, K) * g))(fv)
    for b in range(2):
        ref_grad = jax.grad(lambda v: jnp.sum(
            R._soft_tile(pix, v, sigma, 256).reshape(H, W) * g[b]))(fv[b])
        scale = max(float(jnp.abs(ref_grad).max()), 1.0)
        diff = np.abs(np.asarray(got_grad[b]) - np.asarray(ref_grad))
        strict = diff > 5e-6 * scale
        assert strict.mean() < 2e-3, (b, strict.sum(), diff.max())
        assert diff.max() < 5e-4 * scale, (b, diff.max())


def test_binned_soft_overflow_falls_back(monkeypatch):
    """Soft-silhouette bin overflow must fall back to the dense batched
    kernels and still match the XLA scan (fwd and bwd)."""
    import tpunerf.kernels.rasterize as R

    monkeypatch.setattr(R, "_SOFT_INTERPRET", True)
    F = 160
    tri = jnp.array([[-0.8, -0.8], [0.8, -0.8], [0.0, 0.8]])
    fv = (jnp.broadcast_to(tri, (F, 3, 2))
          + 0.001 * jnp.arange(F, dtype=jnp.float32)[:, None, None])[None]
    sigma = 1e-3
    K = 64
    H = W = 128
    _, overflow = R._soft_batched_bins(fv, H, W, sigma, K,
                                       (H * W) // (R._PSUB * R._PLANE))
    assert bool(overflow), "test must exercise the overflow fallback"

    pix = R.pixel_grid_ndc(H, W)
    got = R._soft_batched_pallas(fv, H, W, sigma, K)
    ref = R._soft_tile(pix, fv[0], sigma, 256).reshape(H, W)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref),
                               atol=5e-6)
    g = jax.random.normal(jax.random.key(1), (1, H, W))
    got_grad = jax.grad(lambda v: jnp.sum(
        R._soft_batched_pallas(v, H, W, sigma, K) * g))(fv)
    ref_grad = jax.grad(lambda v: jnp.sum(
        R._soft_tile(pix, v, sigma, 256).reshape(H, W) * g[0]))(fv[0])
    scale = float(jnp.abs(ref_grad).max())
    np.testing.assert_allclose(np.asarray(got_grad[0]), np.asarray(ref_grad),
                               atol=5e-6 * max(scale, 1.0))
