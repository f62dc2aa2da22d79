import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpunerf.fields.marching import marching_tetrahedra
from tpunerf.fields.sketch_shape import SDFGrid, sketch_shape_loss
from tpunerf.meshrep import shapes


@pytest.fixture(scope="module")
def sphere_sdf():
    mesh = shapes.icosphere(subdivisions=1, radius=0.5)
    return SDFGrid.from_mesh(np.asarray(mesh.vertices),
                             np.asarray(mesh.faces), resolution=24)


def test_sdf_sign_and_magnitude(sphere_sdf):
    # center is inside (negative), far corner outside (positive)
    inside = float(sphere_sdf.sample(jnp.zeros((1, 3)))[0])
    outside = float(sphere_sdf.sample(jnp.full((1, 3), 0.85))[0])
    assert inside < 0
    assert outside > 0
    # |sdf| at center ≈ inradius (icosphere(1) faces are chords of r=0.5,
    # and the coarse grid blurs further)
    assert inside == pytest.approx(-0.45, abs=0.15)
    # surface point ≈ 0
    surf = float(sphere_sdf.sample(jnp.array([[0.5, 0.0, 0.0]]))[0])
    assert abs(surf) < 0.08


def test_sketch_shape_loss_direction(sphere_sdf):
    """Density inside the guide mesh is rewarded, outside penalized."""
    inside_pts = jnp.zeros((1, 1, 4, 3))
    outside_pts = jnp.full((1, 1, 4, 3), 0.8)
    dense = jnp.full((1, 1, 4), 50.0)
    empty = jnp.full((1, 1, 4), 1e-3)
    valid = jnp.ones((1, 1, 4))
    ps = 0.1
    # dense-inside < empty-inside; empty-outside < dense-outside
    assert float(sketch_shape_loss(sphere_sdf, inside_pts, dense, valid, ps)) \
        < float(sketch_shape_loss(sphere_sdf, inside_pts, empty, valid, ps))
    assert float(sketch_shape_loss(sphere_sdf, outside_pts, empty, valid, ps)) \
        < float(sketch_shape_loss(sphere_sdf, outside_pts, dense, valid, ps))


def test_marching_tetrahedra_sphere():
    """Extract the 0-level of an analytic sphere SDF and check the radius."""
    G = 24
    ax = np.linspace(-1, 1, G)
    gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
    vals = np.sqrt(gx ** 2 + gy ** 2 + gz ** 2) - 0.6
    verts, faces = marching_tetrahedra(vals, iso=0.0)
    assert len(verts) > 50 and len(faces) > 50
    radii = np.linalg.norm(verts, axis=1)
    np.testing.assert_allclose(radii, 0.6, atol=0.08)
    assert faces.max() < len(verts)


def test_sample_fast_divergence_bounded(sphere_sdf):
    """The one-gather prefiltered lookup (r5 hot path for the sketch loss)
    stays within the analytic nearest-on-2G bound of exact trilinear, and
    the BCE target it produces diverges immaterially."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-0.95, 0.95, (4096, 3)).astype(np.float32))
    exact = np.asarray(sphere_sdf.sample(x))
    fast = np.asarray(sphere_sdf.sample_fast(x))
    # |∇sdf| ≈ 1 for a sphere; half-cell on the 2G grid + interp error
    h2 = sphere_sdf.bound / sphere_sdf.resolution          # = 2·bound/(2G)
    assert np.abs(fast - exact).max() < 1.5 * h2
    ps = 0.3
    t_exact = jax.nn.sigmoid(-exact / ps)
    t_fast = jax.nn.sigmoid(-fast / ps)
    assert np.abs(np.asarray(t_fast) - np.asarray(t_exact)).max() < 0.1
    assert np.abs(np.asarray(t_fast) - np.asarray(t_exact)).mean() < 0.01
