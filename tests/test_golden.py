"""Golden regression tests: fixed scenes → committed expected values.

Numerics guards for the render stack (the role the reference fills with
visual inspection of vis/train dumps — SURVEY.md §4). Any change to camera
conventions, barycentric interpolation, texture sampling, or compositing
math shows up here before it shows up as a silently wrong render.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpunerf.core import camera as cam
from tpunerf.fields import volume_render as vr
from tpunerf.meshrep import shapes
from tpunerf.meshrep.render import CameraSpec, render_single_view_texture


def test_golden_mesh_render():
    mesh = shapes.uv_sphere(n_lat=8, n_lon=16).normalize(target_scale=0.6)
    fuv = cam.index_vertices_by_faces(mesh.vt, mesh.ft)[None]
    R = 16
    u = jnp.linspace(0, 1, R)
    tex = jnp.stack(jnp.meshgrid(u, u, indexing="ij") +
                    [jnp.ones((R, R))], axis=-1)[None]
    out = render_single_view_texture(
        mesh.vertices, mesh.faces, fuv, tex, theta=1.2, phi=0.7, radius=1.8,
        spec=CameraSpec(), dims=(32, 32))
    img = np.asarray(out.image[0])
    mask = np.asarray(out.mask[0, ..., 0])

    assert float(mask.sum()) == pytest.approx(267.0, abs=3)  # coverage
    np.testing.assert_allclose(img[16, 16], [0.393139, 0.088808, 1.0],
                               atol=1e-3)
    np.testing.assert_allclose(img[10, 14], [0.222003, 0.051357, 1.0],
                               atol=1e-3)
    np.testing.assert_allclose(img[20, 18], [0.508944, 0.117426, 1.0],
                               atol=1e-3)
    np.testing.assert_allclose(img[8, 8], 0.0, atol=1e-6)    # background
    assert float(out.depth[0, 16, 16, 0]) == pytest.approx(1.246425,
                                                           abs=1e-3)


def test_golden_volume_render():
    rays = vr.generate_rays(jnp.array([1.2]), jnp.array([0.7]),
                            jnp.array([2.0]), 8, 8, fovy=jnp.pi / 3)

    def sc(x, d):
        s = 25.0 * (jnp.linalg.norm(x, axis=-1) < 0.45)
        return s, jnp.broadcast_to(jnp.array([0.2, 0.4, 0.6, 0.8]),
                                   (*s.shape, 4))

    res = vr.render_rays(sc, rays, jax.random.key(0),
                         vr.MarchConfig(num_samples=64, num_compacted=64),
                         perturb=False)
    ws = np.asarray(res.weights_sum[0, [0, 27, 36, 63]])
    np.testing.assert_allclose(ws, [0.0, 1.0, 1.0, 0.0], atol=1e-4)
    assert float(res.depth[0, 36]) == pytest.approx(1.642159, abs=2e-2)
    np.testing.assert_allclose(np.asarray(res.image[0, 36]),
                               [0.2, 0.4, 0.6, 0.8], atol=1e-3)


def test_golden_train_composite():
    """Pins the EXACT image the SDS loss consumes on the paint path
    (VERDICT r2 task 9): textured fg + env-sphere bg composited through the
    detached mask (reference latent_paint render.py:34-47,
    textured_mesh.py:187-220), bicubic-resized to the latent grid. Fixed
    seed-0 params; any change to fg render, bg sphere colors, mask
    compositing, or the resize shows up here."""
    from tpunerf.core.views import ViewBatch
    from tpunerf.meshrep.textured_mesh import TexturedMeshScene

    scene = TexturedMeshScene.create(shape_path=None, shape_scale=0.6,
                                     latent_mode=True, texture_resolution=16,
                                     render_grid_size=32)
    scene.latent_size = 16
    params = scene.init_params(jax.random.key(0))
    views = ViewBatch(theta=jnp.array([1.2]), phi=jnp.array([0.7]),
                      radius=jnp.array([1.5]), dirs=jnp.array([0]),
                      is_body=jnp.array([True]))
    out = scene.render_train(params, views)
    img = np.asarray(out["image"][0])
    assert img.shape == (16, 16, 4)
    assert float(np.asarray(out["mask"][0]).sum()) == pytest.approx(
        124.25, abs=1.0)
    # interior pixel = foreground (mask 1): composited == fg exactly
    np.testing.assert_allclose(
        img[8, 8], [0.053144, -0.151097, -0.228955, 0.482361], atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["foreground"][0, 8, 8]),
                               img[8, 8], atol=1e-6)
    # corner pixel = background (mask 0): composited == env-sphere bg
    np.testing.assert_allclose(
        img[0, 0], [0.160628, 0.403694, 0.675051, 0.60434], atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["background"][0, 0, 0]),
                               img[0, 0], atol=1e-6)
    # mixed off-center probes
    np.testing.assert_allclose(
        img[4, 12], [0.2078, -0.554919, -1.067014, 0.147422], atol=1e-3)
    np.testing.assert_allclose(
        img[12, 4], [-0.053544, 0.430989, -0.764044, -0.104779], atol=1e-3)
