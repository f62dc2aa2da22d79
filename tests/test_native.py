"""Native C++ SDF-grid builder vs the numpy fallback."""
import numpy as np
import pytest

from tpunerf import native
from tpunerf.fields import sketch_shape as ss
from tpunerf.meshrep import shapes


@pytest.mark.skipif(not native.native_available(),
                    reason="native toolchain unavailable")
def test_native_matches_numpy_fallback():
    mesh = shapes.icosphere(1, radius=0.5)
    v = np.asarray(mesh.vertices)
    f = np.asarray(mesh.faces)
    G = 12
    nat = native.sdf_grid(v, f, G, 1.0)

    # numpy fallback (bypass the native fast path)
    ax = (np.arange(G) + 0.5) / G * 2.0 - 1.0
    gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
    pts = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], axis=-1)
    dist = np.full(len(pts), np.inf)
    tri = v[f]
    for i in range(tri.shape[0]):
        dist = np.minimum(dist,
                          ss._point_triangle_distance_np(pts, tri[i]))
    wn = ss._winding_number_np(pts, v.astype(np.float64), f.astype(np.int64))
    ref = np.where(wn > 0.5, -dist, dist).reshape(G, G, G)

    np.testing.assert_allclose(nat, ref, atol=1e-4)


@pytest.mark.skipif(not native.native_available(),
                    reason="native toolchain unavailable")
def test_sdfgrid_uses_native():
    mesh = shapes.icosphere(1, radius=0.5)
    grid = ss.SDFGrid.from_mesh(np.asarray(mesh.vertices),
                                np.asarray(mesh.faces), resolution=16)
    assert grid.values.shape == (16, 16, 16)
    assert float(grid.values[8, 8, 8]) < 0      # inside
    assert float(grid.values[0, 0, 0]) > 0      # outside
