"""Motion vectors for temporal reprojection.

Equivalent of ``motion_vector_kernel`` (``denoiser_kernels.cuh:33-68``):
reconstruct the world position of each pixel from the camera ray and linear
depth, reproject through the previous frame's view-projection, and output
uv-space deltas.  Sky pixels (depth >= threshold) get zero motion.
"""

from __future__ import annotations

import jax.numpy as jnp

from ptrt_tpu.core import mat as m4
from ptrt_tpu.core.vec import Vec3
from ptrt_tpu.scene.camera import Camera, pixel_grid

SKY_DEPTH_THRESHOLD = 1e29  # denoiser_kernels.cuh:23-25


def motion_vectors(depth: jnp.ndarray, camera: Camera,
                   prev_view_proj: jnp.ndarray, width: int, height: int):
    """Returns (mx, my) uv-space motion, each (H, W)."""
    s, t = pixel_grid(width, height)
    ray = camera.get_ray_simple(s, t)
    world = ray.origin + ray.direction * depth

    ndc, w = m4.project_point(prev_view_proj, world)
    prev_s = ndc.x * 0.5 + 0.5
    prev_t = ndc.y * 0.5 + 0.5

    # motion = current uv - previous uv (denoiser_kernels.cuh:64-66);
    # here v is the bottom-up t used across the pipeline
    mx = s - prev_s
    my = t - prev_t

    valid = (depth < SKY_DEPTH_THRESHOLD) & (w > 0.0)
    return jnp.where(valid, mx, 0.0), jnp.where(valid, my, 0.0)
