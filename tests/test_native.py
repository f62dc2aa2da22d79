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


@pytest.mark.skipif(not native.native_available(),
                    reason="native toolchain unavailable")
def test_native_marching_matches_numpy():
    """Native (C++/OpenMP) and numpy extractors produce identical meshes."""
    from tpunerf.fields.marching import marching_tetrahedra
    rng = np.random.default_rng(3)
    G = 24
    ax = np.linspace(-1, 1, G)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    vals = (0.55 - np.sqrt(X**2 + Y**2 + Z**2)) * 30 + 10 \
        + rng.normal(0, 0.5, X.shape)
    vn, fn = marching_tetrahedra(vals, 10.0, use_native=True)
    vp, fp = marching_tetrahedra(vals, 10.0, use_native=False)
    assert vn.shape == vp.shape and fn.shape == fp.shape
    # same triangle soup up to vertex indexing: compare sorted coordinates
    np.testing.assert_allclose(np.sort(vn, axis=0), np.sort(vp, axis=0),
                               atol=1e-5)
    tri_n = np.sort(vn[fn].reshape(len(fn), -1), axis=0)
    tri_p = np.sort(vp[fp].reshape(len(fp), -1), axis=0)
    np.testing.assert_allclose(tri_n, tri_p, atol=1e-5)


def test_marching_winding_consistent_outward():
    """Face normals point toward lower field values everywhere (regression:
    the 2-in/2-out tet cases were wound backwards, breaking vertex-normal
    accumulation on extracted meshes)."""
    from tpunerf.fields.marching import marching_tetrahedra
    G = 32
    ax = np.linspace(-1, 1, G)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    vals = 10 + 30 * (0.5 - np.sqrt((X - 0.1)**2 / 0.8
                                    + (Y + 0.05)**2 / 1.3 + Z**2))
    for use_native in ([True, False] if native.native_available()
                       else [False]):
        V, F = marching_tetrahedra(vals, 10.0, use_native=use_native)
        e1, e2 = V[F[:, 1]] - V[F[:, 0]], V[F[:, 2]] - V[F[:, 0]]
        nrm = np.cross(e1, e2)
        ctr = V[F].mean(axis=1) - np.array([0.1, -0.05, 0.0])
        assert (np.sum(nrm * ctr, axis=1) > 0).all()


@pytest.mark.skipif(not native.native_available(),
                    reason="native toolchain unavailable")
def test_native_marching_watertight():
    """Edge-identity welding ⇒ every interior edge used exactly twice."""
    from collections import Counter
    from tpunerf.fields.marching import marching_tetrahedra
    G = 20
    ax = np.linspace(-1, 1, G)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    vals = (0.5 - np.sqrt(X**2 + Y**2 + Z**2)) * 30 + 10
    V, F = marching_tetrahedra(vals, 10.0, use_native=True)
    cnt = Counter()
    for f in F:
        for a, b in ((f[0], f[1]), (f[1], f[2]), (f[2], f[0])):
            cnt[(min(a, b), max(a, b))] += 1
    assert set(cnt.values()) == {2}
