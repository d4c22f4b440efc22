"""RTIOW-basis camera with DOF and view/proj matrices for motion vectors.

Functional rebuild of ``pathtracer/scene/camera.cuh`` (and its RT sibling
``raytracer/RTcamera.cuh``): same basis construction, same ray-generation
math, plus the view / projection / inverse-view-projection matrices the
denoiser's reprojection needs (``camera.cuh:41-48, 74-87``).

The camera is an immutable pytree; "mutations" (``set_position``,
``look_at``) return new cameras — reset-on-edit falls out of value semantics.
Ray generation is batched: (s, t) arrays in, a RayBatch out.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ptrt_tpu.core import mat as m4
from ptrt_tpu.core import rng as prng
from ptrt_tpu.core.vec import PI, Vec3, cross, normalize
from ptrt_tpu.render.ray import RayBatch


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class Camera:
    origin: Vec3
    lower_left_corner: Vec3
    horizontal: Vec3
    vertical: Vec3
    u: Vec3
    v: Vec3
    w: Vec3
    lens_radius: jnp.ndarray
    view: jnp.ndarray
    proj: jnp.ndarray
    inv_view_proj: jnp.ndarray
    fov: jnp.ndarray
    aspect: jnp.ndarray
    near_clip: jnp.ndarray
    far_clip: jnp.ndarray

    def tree_flatten(self):
        return tuple(getattr(self, f.name) for f in dataclasses.fields(self)), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- construction (``camera.cuh:95-121``) -------------------------------
    @staticmethod
    def make(lookfrom, lookat, vup=(0.0, 1.0, 0.0), vfov=60.0,
             aspect_ratio=16.0 / 9.0, aperture=0.0, focus_dist=1.0,
             znear=0.1, zfar=1000.0) -> "Camera":
        lookfrom = _as_vec3(lookfrom)
        lookat = _as_vec3(lookat)
        vup = _as_vec3(vup)
        vfov = jnp.asarray(vfov, jnp.float32)
        aspect_ratio = jnp.asarray(aspect_ratio, jnp.float32)
        focus_dist = jnp.asarray(focus_dist, jnp.float32)

        theta = vfov * (PI / 180.0)
        h = jnp.tan(theta / 2.0)
        viewport_height = 2.0 * h
        viewport_width = aspect_ratio * viewport_height

        w = normalize(lookfrom - lookat)
        u = normalize(cross(vup, w))
        v = cross(w, u)

        origin = lookfrom
        horizontal = u * (focus_dist * viewport_width)
        vertical = v * (focus_dist * viewport_height)
        llc = origin - horizontal * 0.5 - vertical * 0.5 - w * focus_dist

        view = m4.look_at(lookfrom, lookat, vup)
        proj = m4.perspective(theta, aspect_ratio, znear, zfar)
        ivp = m4.inverse(proj @ view)

        return Camera(
            origin=origin, lower_left_corner=llc, horizontal=horizontal,
            vertical=vertical, u=u, v=v, w=w,
            lens_radius=jnp.asarray(aperture, jnp.float32) / 2.0,
            view=view, proj=proj, inv_view_proj=ivp,
            fov=vfov, aspect=aspect_ratio,
            near_clip=jnp.asarray(znear, jnp.float32),
            far_clip=jnp.asarray(zfar, jnp.float32),
        )

    # -- ray generation ------------------------------------------------------
    def get_ray_simple(self, s, t) -> RayBatch:
        """Pinhole rays; marked specular like the reference
        (``camera.cuh:201-205``)."""
        d = (self.lower_left_corner + self.horizontal * s + self.vertical * t
             - self.origin)
        d = normalize(d)
        spec = jnp.ones(jnp.shape(d.x), bool)
        return RayBatch(self.origin.broadcast_to(jnp.shape(d.x)), d, spec)

    def get_ray(self, s, t, rng_state=None):
        """DOF rays when aperture > 0 (``camera.cuh:156-166``).

        Returns (rng_state, RayBatch).  The aperture branch is a lane select,
        so one compiled program covers both cases.
        """
        if rng_state is None:
            return None, self.get_ray_simple(s, t)
        rng_state, rd = prng.sample_unit_disk(rng_state)
        rd = rd * self.lens_radius
        offset = self.u * rd.x + self.v * rd.y
        use_dof = self.lens_radius > 0.0
        offset = offset * jnp.where(use_dof, 1.0, 0.0)
        d = (self.lower_left_corner + self.horizontal * s + self.vertical * t
             - self.origin - offset)
        d = normalize(d)
        spec = jnp.ones(jnp.shape(d.x), bool)
        return rng_state, RayBatch(
            (self.origin + offset).broadcast_to(jnp.shape(d.x)), d, spec)

    def ray_through(self, s: float, t: float):
        """Host-side pinhole ray through viewport coords (s, t) in [0, 1]² —
        numpy (origin, direction) for picking / debug-ray generators."""
        import numpy as np

        g = lambda v: np.array([float(v.x), float(v.y), float(v.z)])
        o = g(self.origin)
        d = (g(self.lower_left_corner) + g(self.horizontal) * s
             + g(self.vertical) * t - o)
        return o, d / max(np.linalg.norm(d), 1e-12)

    # -- matrices ------------------------------------------------------------
    def get_view_proj(self) -> jnp.ndarray:
        return self.proj @ self.view

    # -- edits (value-semantic, ``camera.cuh:268-324``) ----------------------
    def set_position(self, pos) -> "Camera":
        """Move the eye, keeping the current look-at point and focus
        (``camera.cuh:268-294``)."""
        pos = _as_vec3(pos)
        old_center = (self.lower_left_corner + self.horizontal * 0.5
                      + self.vertical * 0.5)
        focus_dist = (self.origin - old_center).length()
        lookat = self.origin - self.w * focus_dist
        return Camera.make(
            pos, lookat, self.v, self.fov, self.aspect,
            aperture=self.lens_radius * 2.0,
            focus_dist=(pos - lookat).length(),
            znear=self.near_clip, zfar=self.far_clip,
        )

    def look_at(self, target, vup=(0.0, 1.0, 0.0)) -> "Camera":
        """Re-aim at a target from the current origin
        (``camera.cuh:301-324``)."""
        target = _as_vec3(target)
        return Camera.make(
            self.origin, target, _as_vec3(vup), self.fov, self.aspect,
            aperture=self.lens_radius * 2.0,
            focus_dist=(self.origin - target).length(),
            znear=self.near_clip, zfar=self.far_clip,
        )


def _as_vec3(x) -> Vec3:
    if isinstance(x, Vec3):
        return x.map(lambda c: jnp.asarray(c, jnp.float32))
    return Vec3(jnp.asarray(x[0], jnp.float32), jnp.asarray(x[1], jnp.float32),
                jnp.asarray(x[2], jnp.float32))


def pixel_grid(width: int, height: int, jitter_x=0.5, jitter_y=0.5):
    """(s, t) arrays for the full pixel grid, bottom-up like the reference's
    framebuffer convention (``scene_kernels.cuh:140-146``).

    jitter_* may be scalars or (H, W) arrays of sub-pixel offsets in [0, 1).
    """
    xs = jnp.arange(width, dtype=jnp.float32)[None, :]
    ys = jnp.arange(height, dtype=jnp.float32)[:, None]
    s = (xs + jitter_x) / float(width)
    t = (ys + jitter_y) / float(height)
    # jitters may carry leading batch dims (e.g. an spp axis) — broadcast
    # both to the common shape ending in (H, W)
    shape = jnp.broadcast_shapes(jnp.shape(s), jnp.shape(t), (height, width))
    return jnp.broadcast_to(s, shape), jnp.broadcast_to(t, shape)
