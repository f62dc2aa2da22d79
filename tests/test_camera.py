import math

import jax.numpy as jnp
import numpy as np
import pytest

from tpunerf.core import camera as cam


def test_spherical_position_convention():
    # theta=0 → straight overhead (+Y); theta=pi/2, phi=0 → +Z
    p = cam.spherical_camera_position(0.0, 0.0, 2.0)
    np.testing.assert_allclose(np.asarray(p), [0, 2, 0], atol=1e-6)
    p = cam.spherical_camera_position(math.pi / 2, 0.0, 3.0)
    np.testing.assert_allclose(np.asarray(p), [0, 0, 3], atol=1e-6)
    p = cam.spherical_camera_position(math.pi / 2, math.pi / 2, 1.0)
    np.testing.assert_allclose(np.asarray(p), [1, 0, 0], atol=1e-6)


def test_look_at_maps_target_to_minus_z():
    theta, phi, r = 1.0, 2.0, 3.0
    M = cam.camera_transform_from_view(theta, phi, r)
    pos = cam.spherical_camera_position(theta, phi, r)
    # camera position maps to origin
    pc = cam.transform_vertices(pos[None], M)
    np.testing.assert_allclose(np.asarray(pc), np.zeros((1, 3)), atol=1e-5)
    # look-at target (origin) maps to (0, 0, -r): camera faces −z
    oc = cam.transform_vertices(jnp.zeros((1, 3)), M)
    np.testing.assert_allclose(np.asarray(oc), [[0, 0, -r]], atol=1e-5)


def test_projection_center_and_fov_edge():
    proj = cam.perspective_projection(fovy=math.pi / 2)  # tan(fov/2)=1
    # point on the optical axis projects to NDC center
    ndc = cam.perspective_project(jnp.array([[0.0, 0.0, -2.0]]), proj)
    np.testing.assert_allclose(np.asarray(ndc), [[0, 0]], atol=1e-6)
    # point at y = depth (45° above axis) lands at NDC y = +1 for fov 90°
    ndc = cam.perspective_project(jnp.array([[0.0, 2.0, -2.0]]), proj)
    np.testing.assert_allclose(np.asarray(ndc), [[0, 1]], atol=1e-6)


def test_batched_transform_shapes():
    thetas = jnp.array([0.5, 1.0, 1.5])
    M = cam.camera_transform_from_view(thetas, jnp.zeros(3), jnp.full(3, 2.0))
    assert M.shape == (3, 4, 3)
    verts = jnp.ones((10, 3))
    fv_cam, fv_img, fn = cam.prepare_vertices(
        verts, jnp.zeros((4, 3), jnp.int32), cam.perspective_projection(), M)
    assert fv_cam.shape == (3, 4, 3, 3)
    assert fv_img.shape == (3, 4, 3, 2)
    assert fn.shape == (3, 4, 3)


def test_view_direction_buckets():
    ov, fr = math.radians(30), math.radians(60)
    theta = jnp.full((5,), math.radians(90.0))
    phi = jnp.array([0.0, math.pi / 2, math.pi, 3 * math.pi / 2,
                     2 * math.pi - 0.01])
    d = cam.get_view_direction(theta, phi, ov, fr)
    assert list(np.asarray(d)) == [0, 1, 2, 3, 0]
    # overhead / bottom override azimuth
    d = cam.get_view_direction(jnp.array([0.1, math.pi - 0.1]),
                               jnp.zeros(2), ov, fr)
    assert list(np.asarray(d)) == [4, 5]


def test_face_normals_unit():
    tri = jnp.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], jnp.float32)
    n = cam.face_normals(tri)
    np.testing.assert_allclose(np.asarray(n), [[0, 0, 1]], atol=1e-6)


def test_look_at_overhead_pose_orthonormal():
    """θ=0 (camera straight above, view ∥ up) must yield a proper rotation
    via the alternate-up fallback, not a near-zero x/y axis (r3 advisor)."""
    M = np.asarray(cam.camera_transform_from_view(0.0, 0.3, 1.3))
    R = M[:3, :]
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-5)
    assert np.isfinite(M).all()


def test_look_at_normal_pose_unchanged_by_fallback():
    """The degenerate-up fallback must not perturb ordinary poses."""
    M = np.asarray(cam.camera_transform_from_view(1.0, 0.7, 1.3))
    R = M[:3, :]
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-5)
    # x axis ⟂ up=(0,1,0) for the standard construction
    assert abs(R[1, 0]) < 1e-6
