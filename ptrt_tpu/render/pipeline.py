"""The per-frame render pipeline as one fused XLA program.

The reference launches 12–20 kernels per frame from the host
(``scene.cuh:1028-1209``: path_trace -> motion vectors -> denoise -> bloom ->
upscale -> tonemap).  Here the whole frame graph is ONE jitted function —
XLA fuses the phases, there are no host round-trips, and the same program
runs on TPU, CPU, or a sharded mesh.

``render_frame`` is shaped so a game's ``step`` can be composed in front of
it and jitted together (the BASELINE north star: step+render = one program).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ptrt_tpu.core import rng as prng
from ptrt_tpu.core.bluenoise import next_blue_noise
from ptrt_tpu.core.color import aces_tonemap, srgb_oetf, to_rgb8
from ptrt_tpu.core.taa import taa_jitter
from ptrt_tpu.core.vec import Vec3
from ptrt_tpu.render.integrator import PathOutput, trace_path
from ptrt_tpu.render.ray import RayBatch
from ptrt_tpu.scene.camera import Camera, pixel_grid


class FrameBuffers(NamedTuple):
    """Per-frame HDR + G-buffer outputs (low-res when scaled)."""

    color: Vec3  # (h, w) radiance (avg over spp)
    diffuse: Vec3
    specular: Vec3
    emission: Vec3
    normal: Vec3
    depth: jnp.ndarray
    object_id: jnp.ndarray
    roughness: jnp.ndarray
    transmission: jnp.ndarray
    rays_traced: jnp.ndarray  # scalar (all spp)


def trace_frame(geom, materials, lights, n_lights: int, sky, camera: Camera,
                rng_state, frame_index, width: int, height: int, spp: int,
                max_depth: int, split: bool, use_brute: bool,
                blue_noise_tbl, rr_enabled: bool = True,
                rr_start: int = 2) -> tuple:
    """``path_trace_kernel`` equivalent (``scene_kernels.cuh:120-194``):
    spp-loop of jittered primary rays through the wavefront integrator.

    Returns (rng_state, FrameBuffers).
    """
    ys, xs = jnp.mgrid[0:height, 0:width]

    def sample(s, carry):
        state, acc = carry
        jx_t, jy_t = taa_jitter(frame_index + s)
        bx, by = next_blue_noise(blue_noise_tbl, xs, ys, frame_index + s)
        jitter_x = jx_t + (bx - 0.5) * 0.25
        jitter_y = jy_t + (by - 0.5) * 0.25
        sg, tg = pixel_grid(width, height, 0.5 + jitter_x, 0.5 + jitter_y)
        state, ray = camera.get_ray(sg, tg, state)
        state, out = trace_path(geom, materials, lights, n_lights, sky, ray,
                                state, max_depth, split=split,
                                use_brute=use_brute, rr_enabled=rr_enabled,
                                rr_start=rr_start)
        acc_color, acc_d, acc_s, acc_e, rays, first = acc
        acc_color = acc_color + out.radiance
        acc_d = acc_d + out.diffuse
        acc_s = acc_s + out.specular
        acc_e = acc_e + out.emission
        rays = rays + out.rays_traced
        # G-buffers from sample 0 (scene_kernels.cuh:180-185)
        first = jax.tree_util.tree_map(
            lambda f, n: jnp.where(s == 0, n, f), first,
            (out.first_normal, out.first_depth, out.first_object_id,
             out.first_roughness, out.first_transmission))
        return state, (acc_color, acc_d, acc_s, acc_e, rays, first)

    zero3 = Vec3.zeros((height, width))
    first0 = (zero3, jnp.full((height, width), 1e30),
              jnp.full((height, width), -1, jnp.int32),
              jnp.ones((height, width)), jnp.zeros((height, width)))
    init = (rng_state, (zero3, zero3, zero3, zero3, jnp.float32(0.0), first0))
    if spp == 1:
        state, acc = sample(0, init)
    else:
        state, acc = jax.lax.fori_loop(0, spp, sample, init)
    color, diff, spec, emis, rays, first = acc
    inv = 1.0 / float(spp)
    normal, depth, objid, rough, trans = first
    return state, FrameBuffers(
        color=color * inv, diffuse=diff * inv, specular=spec * inv,
        emission=emis * inv, normal=normal, depth=depth, object_id=objid,
        roughness=rough, transmission=trans, rays_traced=rays,
    )


def upscale_bilinear(img: Vec3, out_h: int, out_w: int) -> Vec3:
    """``upscale_bilinear_kernel`` (``scene_kernels.cuh:404-440``)."""
    def up(c):
        return jax.image.resize(c, (out_h, out_w), method="bilinear")
    return img.map(up)


def tonemap_to_rgb8(hdr: Vec3, total_samples: int = 1,
                    flip_y: bool = True) -> jnp.ndarray:
    """``tonemap_kernel`` (``scene.cuh:2004-2047``): average, fitted ACES,
    exact sRGB OETF, 8-bit quantize, Y-flip to image convention."""
    c = hdr * (1.0 / float(total_samples))
    c = aces_tonemap(c)
    c = srgb_oetf(c)
    img = to_rgb8(c)
    if flip_y:
        img = img[::-1]
    return img
