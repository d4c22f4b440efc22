"""4x4 / 3x3 matrix helpers.

Replaces the reference's ``common/mat4.cuh`` and ``common/matrix.cuh`` and the
TRS machinery of ``pathtracer/scene/transform.cuh``.  One convention is used
throughout (the reference mixed two and carried a known ``operator*`` typo,
``mat4.cuh:289`` — documented in SURVEY.md, deliberately not replicated):

* matrices are ``jnp`` arrays of shape ``(..., 4, 4)``,
* they act on **column** vectors: ``p' = M @ p``; translation in ``M[:3, 3]``,
* compose right-to-left: ``world = T @ R @ S``.

Points/directions cross the Vec3 SoA boundary via ``transform_point`` /
``transform_dir`` / ``transform_normal`` which are written componentwise so
the batch dimension stays on TPU vector lanes (no gathers, no stacking).
"""

from __future__ import annotations

import jax.numpy as jnp

from ptrt_tpu.core.vec import Vec3


def identity() -> jnp.ndarray:
    return jnp.eye(4, dtype=jnp.float32)


def translate(t: Vec3 | tuple) -> jnp.ndarray:
    tx, ty, tz = _unpack3(t)
    m = jnp.eye(4, dtype=jnp.float32)
    return m.at[0, 3].set(tx).at[1, 3].set(ty).at[2, 3].set(tz)


def scale(s: Vec3 | tuple | float) -> jnp.ndarray:
    if isinstance(s, (int, float)):
        s = (s, s, s)
    sx, sy, sz = _unpack3(s)
    return jnp.diag(jnp.stack([jnp.asarray(sx, jnp.float32),
                               jnp.asarray(sy, jnp.float32),
                               jnp.asarray(sz, jnp.float32),
                               jnp.asarray(1.0, jnp.float32)]))


def _unpack3(v):
    if isinstance(v, Vec3):
        return v.x, v.y, v.z
    return v[0], v[1], v[2]


def rotation_x(a) -> jnp.ndarray:
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.array(
        [[1, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 1]],
        dtype=jnp.float32,
    ).at[1, 1].set(c).at[1, 2].set(-s).at[2, 1].set(s).at[2, 2].set(c)


def rotation_y(a) -> jnp.ndarray:
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.array(
        [[0, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 0], [0, 0, 0, 1]],
        dtype=jnp.float32,
    ).at[0, 0].set(c).at[0, 2].set(s).at[2, 0].set(-s).at[2, 2].set(c)


def rotation_z(a) -> jnp.ndarray:
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.array(
        [[0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
        dtype=jnp.float32,
    ).at[0, 0].set(c).at[0, 1].set(-s).at[1, 0].set(s).at[1, 1].set(c)


def rotation_euler_xyz(rx, ry, rz) -> jnp.ndarray:
    """R = Rz @ Ry @ Rx — matches the reference's Euler order
    (``RTmesh.cuh:618-656`` rotateSelfEulerXYZ applies X then Y then Z)."""
    return rotation_z(rz) @ rotation_y(ry) @ rotation_x(rx)


def rotation_axis_angle(axis: Vec3, angle) -> jnp.ndarray:
    """Rodrigues rotation (``common/matrix.cuh:8-133``)."""
    ax = axis.normalized()
    x, y, z = (jnp.asarray(ax.x, jnp.float32),
               jnp.asarray(ax.y, jnp.float32),
               jnp.asarray(ax.z, jnp.float32))
    c, s = jnp.cos(angle), jnp.sin(angle)
    C = 1.0 - c
    r = jnp.stack(
        [
            jnp.stack([c + x * x * C, x * y * C - z * s, x * z * C + y * s]),
            jnp.stack([y * x * C + z * s, c + y * y * C, y * z * C - x * s]),
            jnp.stack([z * x * C - y * s, z * y * C + x * s, c + z * z * C]),
        ]
    )
    m = jnp.eye(4, dtype=jnp.float32)
    return m.at[:3, :3].set(r)


def trs(translation: Vec3, rotation_euler: Vec3, scl: Vec3) -> jnp.ndarray:
    """world = T @ Rz Ry Rx @ S (``transform.cuh:260-306`` semantics)."""
    return (
        translate(translation)
        @ rotation_euler_xyz(rotation_euler.x, rotation_euler.y, rotation_euler.z)
        @ scale(scl)
    )


def look_at(eye: Vec3, target: Vec3, up: Vec3) -> jnp.ndarray:
    """GL-style view matrix (``mat4.cuh`` lookAt)."""
    f = (target - eye).normalized()
    s = f.cross(up).normalized()
    u = s.cross(f)
    ex, ey, ez = eye.x, eye.y, eye.z
    row0 = jnp.stack([s.x, s.y, s.z, -(s.x * ex + s.y * ey + s.z * ez)])
    row1 = jnp.stack([u.x, u.y, u.z, -(u.x * ex + u.y * ey + u.z * ez)])
    row2 = jnp.stack([-f.x, -f.y, -f.z, (f.x * ex + f.y * ey + f.z * ez)])
    row3 = jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32)
    return jnp.stack([row0, row1, row2, row3]).astype(jnp.float32)


def perspective(fov_y_rad, aspect, z_near, z_far) -> jnp.ndarray:
    """GL-style perspective projection (``mat4.cuh`` perspective)."""
    f = 1.0 / jnp.tan(fov_y_rad / 2.0)
    a = (z_far + z_near) / (z_near - z_far)
    b = (2.0 * z_far * z_near) / (z_near - z_far)
    m = jnp.zeros((4, 4), jnp.float32)
    return (
        m.at[0, 0].set(f / aspect)
        .at[1, 1].set(f)
        .at[2, 2].set(a)
        .at[2, 3].set(b)
        .at[3, 2].set(-1.0)
    )


def inverse(m: jnp.ndarray) -> jnp.ndarray:
    return jnp.linalg.inv(m)


def inverse_rigid_trs(m: jnp.ndarray) -> jnp.ndarray:
    """Fast inverse for T@R@S matrices (no solver, stays fusible)."""
    return jnp.linalg.inv(m)  # small 4x4 — XLA lowers this fine


# -- Vec3 <-> matrix transforms (componentwise, lane-friendly) ---------------


def transform_point(m: jnp.ndarray, p: Vec3) -> Vec3:
    """(M @ [p,1]).xyz with perspective divide skipped (affine M assumed).

    Mirrors ``intersection.cuh:258-271`` transformPoint.
    """
    x = m[0, 0] * p.x + m[0, 1] * p.y + m[0, 2] * p.z + m[0, 3]
    y = m[1, 0] * p.x + m[1, 1] * p.y + m[1, 2] * p.z + m[1, 3]
    z = m[2, 0] * p.x + m[2, 1] * p.y + m[2, 2] * p.z + m[2, 3]
    return Vec3(x, y, z)


def transform_dir(m: jnp.ndarray, d: Vec3) -> Vec3:
    """Rotation/scale part only (``intersection.cuh:273-283``)."""
    x = m[0, 0] * d.x + m[0, 1] * d.y + m[0, 2] * d.z
    y = m[1, 0] * d.x + m[1, 1] * d.y + m[1, 2] * d.z
    z = m[2, 0] * d.x + m[2, 1] * d.y + m[2, 2] * d.z
    return Vec3(x, y, z)


def transform_normal(normal_matrix: jnp.ndarray, n: Vec3) -> Vec3:
    """Transform by inverse-transpose, renormalized
    (``intersection.cuh:285-297``)."""
    return transform_dir(normal_matrix, n).normalized(1e-30)


def project_point(m: jnp.ndarray, p: Vec3):
    """Full projective transform with divide; returns (Vec3 ndc, w).

    Used by motion vectors (``denoiser_kernels.cuh:33-68``).
    """
    x = m[0, 0] * p.x + m[0, 1] * p.y + m[0, 2] * p.z + m[0, 3]
    y = m[1, 0] * p.x + m[1, 1] * p.y + m[1, 2] * p.z + m[1, 3]
    z = m[2, 0] * p.x + m[2, 1] * p.y + m[2, 2] * p.z + m[2, 3]
    w = m[3, 0] * p.x + m[3, 1] * p.y + m[3, 2] * p.z + m[3, 3]
    inv_w = 1.0 / jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return Vec3(x * inv_w, y * inv_w, z * inv_w), w


def normal_matrix(world: jnp.ndarray) -> jnp.ndarray:
    """Inverse-transpose of the upper 3x3, embedded in 4x4."""
    inv = jnp.linalg.inv(world)
    return jnp.eye(4, dtype=jnp.float32).at[:3, :3].set(inv[:3, :3].T)
