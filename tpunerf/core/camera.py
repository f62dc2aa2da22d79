"""Camera math: spherical poses, look-at transforms, perspective projection.

Pure-jnp, batched, jit-friendly. Conventions replicate the reference's kaolin
camera stack (reference: src/latent_paint/models/render.py:11,20-31 —
`generate_perspective_projection`, `generate_transformation_matrix`,
`prepare_vertices`) so renders are numerically comparable:

* world: +Y up; the camera orbits the origin at spherical (theta, phi, r)
  with position (r·sinθ·sinφ, r·cosθ, r·sinθ·cosφ).
* camera space: right-handed, camera looks down −z (z-axis points from the
  look-at target toward the camera).
* image/NDC: x right, y **up**, both in [−1, 1]; perspective divide by −z.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def spherical_camera_position(theta, phi, radius) -> jnp.ndarray:
    """Camera position on a sphere (reference render.py:21-23 convention).

    theta: polar angle from +Y (0 = overhead), phi: azimuth. Broadcasts;
    returns (..., 3).
    """
    theta, phi, radius = jnp.broadcast_arrays(
        jnp.asarray(theta, jnp.float32), jnp.asarray(phi, jnp.float32),
        jnp.asarray(radius, jnp.float32))
    x = radius * jnp.sin(theta) * jnp.sin(phi)
    y = radius * jnp.cos(theta)
    z = radius * jnp.sin(theta) * jnp.cos(phi)
    return jnp.stack([x, y, z], axis=-1)


def _cross3(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Component-wise 3-vector cross product.

    `jnp.cross` lowers through gather/roll ops; fused into large render
    graphs on TPU that triggered an XLA miscompile (observed v5e: inf/NaN
    camera axes for a subset of a B=8 pose batch inside the full
    render_train program, while the identical math in a small jit was
    correct). Plain arithmetic fuses cleanly and sidesteps it."""
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    return jnp.stack([ay * bz - az * by,
                      az * bx - ax * bz,
                      ax * by - ay * bx], axis=-1)


def _normalize(v: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return v * jax.lax.rsqrt(jnp.sum(v * v, axis=-1, keepdims=True) + eps)


def look_at_transform(camera_position: jnp.ndarray,
                      look_at: jnp.ndarray,
                      up: jnp.ndarray) -> jnp.ndarray:
    """World→camera transform as a (..., 4, 3) matrix.

    Applied as ``[p, 1] @ M`` (kaolin `generate_transformation_matrix`
    semantics, used at reference render.py:30). The camera z-axis points from
    `look_at` toward `camera_position` (camera faces −z). Near-overhead
    poses (up ∥ z, θ→0 — reachable, the sampler's theta_range starts at 0)
    fall back to an alternate up vector so the rotation stays orthonormal
    instead of silently degenerating to a near-zero x/y axis (r3 advisor).
    """
    camera_position = jnp.asarray(camera_position, jnp.float32)
    look_at = jnp.broadcast_to(jnp.asarray(look_at, jnp.float32), camera_position.shape)
    up = jnp.broadcast_to(jnp.asarray(up, jnp.float32), camera_position.shape)

    z_axis = _normalize(camera_position - look_at)
    x_raw = _cross3(up, z_axis)
    # up ∥ view direction ⇒ |up × z| ≈ 0: switch to a z-world up (same
    # strategy as uv_unwrap._project_chart). Threshold far below any pose
    # the samplers emit away from exact overhead, so normal poses are
    # bit-identical.
    alt_up = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], jnp.float32),
                              up.shape)
    degenerate = jnp.sum(x_raw * x_raw, axis=-1, keepdims=True) < 1e-8
    x_raw = jnp.where(degenerate, _cross3(alt_up, z_axis), x_raw)
    x_axis = _normalize(x_raw)
    y_axis = _cross3(z_axis, x_axis)

    rot = jnp.stack([x_axis, y_axis, z_axis], axis=-1)          # (..., 3, 3)
    trans = -jnp.einsum("...i,...ij->...j", camera_position, rot)  # (..., 3)
    return jnp.concatenate([rot, trans[..., None, :]], axis=-2)   # (..., 4, 3)


def camera_transform_from_view(theta, phi, radius=3.0,
                               look_at_height=0.0) -> jnp.ndarray:
    """Spherical view → world→camera (..., 4, 3) transform.

    Mirrors reference `Renderer.get_camera_from_view` (render.py:20-31):
    look-at target (0, look_at_height, 0), up (0, 1, 0).
    """
    pos = spherical_camera_position(theta, phi, radius)
    look_at = jnp.zeros_like(pos).at[..., 1].set(look_at_height)
    up = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], jnp.float32), pos.shape)
    return look_at_transform(pos, look_at, up)


def perspective_projection(fovy: float = math.pi / 3,
                           ratio: float = 1.0) -> jnp.ndarray:
    """Projection coefficients (3,) — kaolin `generate_perspective_projection`
    semantics (reference render.py:11): NDC x = px·c0/−pz, y = py·c1/−pz.
    """
    tanfov = math.tan(fovy / 2.0)
    return jnp.array([1.0 / (ratio * tanfov), 1.0 / tanfov, -1.0], jnp.float32)


def transform_vertices(vertices: jnp.ndarray,
                       camera_transform: jnp.ndarray) -> jnp.ndarray:
    """World (..., V, 3) → camera space via a (..., 4, 3) transform."""
    ones = jnp.ones((*vertices.shape[:-1], 1), vertices.dtype)
    padded = jnp.concatenate([vertices, ones], axis=-1)
    return padded @ camera_transform


def perspective_project(vertices_camera: jnp.ndarray,
                        camera_proj: jnp.ndarray) -> jnp.ndarray:
    """Camera-space (..., V, 3) → NDC image coords (..., V, 2).

    kaolin `perspective_camera`: scale by proj coeffs then divide x,y by the
    third component (= −z for the standard projection vector).
    """
    scaled = vertices_camera * camera_proj
    return scaled[..., :2] / scaled[..., 2:3]


def face_normals(face_vertices: jnp.ndarray, unit: bool = True) -> jnp.ndarray:
    """Normals of (..., F, 3, 3) face vertices → (..., F, 3).

    Uses the arithmetic `_cross3` (not `jnp.cross`) — see its docstring for
    the TPU fusion-miscompile this avoids."""
    e1 = face_vertices[..., 1, :] - face_vertices[..., 0, :]
    e2 = face_vertices[..., 2, :] - face_vertices[..., 0, :]
    n = _cross3(e1, e2)
    if unit:
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    return n


def index_vertices_by_faces(vertex_attr: jnp.ndarray,
                            faces: jnp.ndarray) -> jnp.ndarray:
    """Gather per-vertex attributes (..., V, C) into per-face (..., F, 3, C).

    TPU-native stand-in for kaolin `index_vertices_by_faces`
    (reference textured_mesh.py:48-50) — a plain XLA gather.
    """
    return jnp.take(vertex_attr, faces, axis=-2)


def prepare_vertices(vertices: jnp.ndarray, faces: jnp.ndarray,
                     camera_proj: jnp.ndarray,
                     camera_transform: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """World mesh + camera → (face_vertices_camera, face_vertices_image,
    face_normals); kaolin `prepare_vertices` semantics
    (reference render.py:39-40). Batched over leading camera dims.
    """
    verts_cam = transform_vertices(vertices, camera_transform)
    verts_img = perspective_project(verts_cam, camera_proj)
    fv_cam = index_vertices_by_faces(verts_cam, faces)
    fv_img = index_vertices_by_faces(verts_img, faces)
    normals = face_normals(fv_cam)
    return fv_cam, fv_img, normals


def get_view_direction(thetas: jnp.ndarray, phis: jnp.ndarray,
                       overhead: float, front: float) -> jnp.ndarray:
    """Bucket (theta, phi) [radians] into prompt-direction ids.

    0 front · 1 left · 2 back · 3 right · 4 overhead · 5 bottom.

    Implements the *intended* semantics of the reference's
    `get_view_direction` (src/utils.py:8-54): the live version double-applies
    deg2rad to already-radian inputs (SURVEY.md Appendix A) — here angles are
    radians throughout. Front window is phi ∈ [−front/2, front/2).
    """
    thetas = jnp.asarray(thetas)
    phis = jnp.mod(jnp.asarray(phis), 2 * jnp.pi)
    half = front / 2.0
    res = jnp.full(thetas.shape, 3, dtype=jnp.int32)             # right
    res = jnp.where((phis >= 2 * jnp.pi - half) | (phis < half), 0, res)  # front
    res = jnp.where((phis >= half) & (phis < jnp.pi - half), 1, res)      # left
    res = jnp.where((phis >= jnp.pi - half) & (phis < jnp.pi + half), 2, res)  # back
    res = jnp.where(thetas <= overhead, 4, res)                  # overhead
    res = jnp.where(thetas >= jnp.pi - overhead, 5, res)         # bottom
    return res


VIEW_DIRECTION_SUFFIXES = (
    "front view", "side view", "back view", "side view", "overhead view",
    "bottom view",
)
