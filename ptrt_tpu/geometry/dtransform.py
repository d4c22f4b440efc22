"""Device-side TRS transform math for fused game frames.

Host scenes derive instance matrices with numpy (``geometry/transform.py``,
mirroring ``transform.cuh:260-306``); a FUSED game frame needs the same
matrices computed from the jitted game state so step+render is one XLA
program (the BASELINE north star).  Conventions match Transform3D exactly:
rotation = Rz·Ry·Rx (``transform.py:_rot_xyz``), world = T·R·S, inverse =
S⁻¹·Rᵀ·T⁻¹, normal matrix = R·S⁻¹.

All functions are vectorized over a leading instance axis (I, ...).
"""

from __future__ import annotations

import jax.numpy as jnp

from ptrt_tpu.core.vec import Vec3


def rot_xyz(rx, ry, rz) -> jnp.ndarray:
    """(..., 3, 3) rotation Rz @ Ry @ Rx, elementwise over leading dims."""
    cx, sx = jnp.cos(rx), jnp.sin(rx)
    cy, sy = jnp.cos(ry), jnp.sin(ry)
    cz, sz = jnp.cos(rz), jnp.sin(rz)
    r00 = cz * cy
    r01 = cz * sy * sx - sz * cx
    r02 = cz * sy * cx + sz * sx
    r10 = sz * cy
    r11 = sz * sy * sx + cz * cx
    r12 = sz * sy * cx - cz * sx
    r20 = -sy
    r21 = cy * sx
    r22 = cy * cx
    return jnp.stack([
        jnp.stack([r00, r01, r02], axis=-1),
        jnp.stack([r10, r11, r12], axis=-1),
        jnp.stack([r20, r21, r22], axis=-1),
    ], axis=-2)


def instance_mats(pos: jnp.ndarray, rot: jnp.ndarray,
                  scale: jnp.ndarray) -> jnp.ndarray:
    """(I, 3) TRS arrays -> (I, 24) InstanceSet matrix rows.

    Cols 0:12 world->local affine (S⁻¹Rᵀ | -S⁻¹Rᵀt), cols 12:21 the
    local->world normal matrix (R·S⁻¹) — the exact layout
    ``scene_geom.InstanceSet.mats`` documents.
    """
    r = rot_xyz(rot[..., 0], rot[..., 1], rot[..., 2])  # (I, 3, 3)
    inv_s = 1.0 / jnp.maximum(jnp.abs(scale), 1e-12) * jnp.sign(
        jnp.where(scale == 0.0, 1.0, scale))
    # inv3[i, j] = r[j, i] * inv_s[i]
    inv3 = jnp.swapaxes(r, -1, -2) * inv_s[..., :, None]
    inv_t = -jnp.einsum("...ij,...j->...i", inv3, pos)
    nrm = r * inv_s[..., None, :]  # (I, 3, 3): R · S⁻¹
    I = pos.shape[0]
    out = jnp.zeros((I, 24), jnp.float32)
    aff = jnp.concatenate([inv3, inv_t[..., :, None]], axis=-1)  # (I, 3, 4)
    out = out.at[:, 0:12].set(aff.reshape(I, 12))
    out = out.at[:, 12:21].set(nrm.reshape(I, 9))
    return out


def instance_world_aabbs(pos, rot, scale, local_lo, local_hi):
    """Transform per-instance LOCAL AABBs by TRS -> world (I, 3) lo/hi
    (the 8-corner method, ``transform.cuh:399-416``)."""
    r = rot_xyz(rot[..., 0], rot[..., 1], rot[..., 2])  # (I, 3, 3)
    m = r * scale[..., None, :]  # world linear part R·S
    corners = []
    for cx in (0, 1):
        for cy in (0, 1):
            for cz in (0, 1):
                p = jnp.stack([
                    jnp.where(cx, local_hi[..., 0], local_lo[..., 0]),
                    jnp.where(cy, local_hi[..., 1], local_lo[..., 1]),
                    jnp.where(cz, local_hi[..., 2], local_lo[..., 2]),
                ], axis=-1)
                corners.append(jnp.einsum("...ij,...j->...i", m, p) + pos)
    c = jnp.stack(corners, axis=0)  # (8, I, 3)
    return c.min(axis=0), c.max(axis=0)


def apply_world(pos, rot, scale, p: Vec3) -> Vec3:
    """World-transform points (single instance, broadcasting TRS scalars)."""
    r = rot_xyz(rot[0], rot[1], rot[2])
    x = p.x * scale[0]
    y = p.y * scale[1]
    z = p.z * scale[2]
    return Vec3(
        r[0, 0] * x + r[0, 1] * y + r[0, 2] * z + pos[0],
        r[1, 0] * x + r[1, 1] * y + r[1, 2] * z + pos[1],
        r[2, 0] * x + r[2, 1] * y + r[2, 2] * z + pos[2])
