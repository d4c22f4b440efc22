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
from ptrt_tpu.scene.camera import Camera


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


# lane budget for one traced wavefront.  All spp samples of a frame trace
# TOGETHER as one flat wavefront up to this cap (batches beyond it run
# sequentially): one tail compaction instead of one per spp, and no
# fori_loop around the integrator.  Measured on v5e: per-lane gather cost
# rises past ~2M lanes (HBM pressure from the (lanes, 96) leaf-gather
# intermediates), so batches are capped just above one 1080p sample.
from ptrt_tpu.geometry.bvh import _env_int

MAX_WAVEFRONT_LANES = _env_int("PTRT_MAX_WAVEFRONT", 2_200_000,
                               1024, 1 << 28)


def trace_frame(geom, materials, lights, n_lights: int, sky, camera: Camera,
                rng_state, frame_index, width: int, height: int, spp: int,
                max_depth: int, split: bool, use_brute: bool,
                blue_noise_tbl, rr_enabled: bool = True,
                rr_start: int = 2, camera_nee: bool = True,
                tile=None) -> tuple:
    """``path_trace_kernel`` equivalent (``scene_kernels.cuh:120-194``).

    The reference's per-thread spp loop becomes an spp AXIS on the wavefront
    (reduced at the end): the traversal tail is paid once per frame instead
    of once per sample.  Each sample keeps its own decorrelated PCG stream
    (``prng.fold``) and its own TAA/blue-noise jitter, so the estimator
    matches the sequential loop statistically.

    ``tile``: ``(y0, x0, full_h, full_w)`` — this call renders the
    (height, width) tile whose top-left GLOBAL pixel is (y0, x0) of a
    full_h x full_w frame (y0/x0 may be traced scalars).  Camera uv,
    blue-noise lookups and per-pixel RNG salts all use GLOBAL pixel
    coordinates, so a tiled render is bit-identical to the whole-frame
    one — this is what makes the shard_mapped multi-chip trace exact
    (parallel/sharding.py).

    Returns (rng_state, FrameBuffers).
    """
    ys, xs = jnp.mgrid[0:height, 0:width]
    if tile is not None:
        y0, x0, full_h, full_w = tile
        ys = ys + y0
        xs = xs + x0
    else:
        full_h, full_w = height, width

    batch = max(1, min(spp, MAX_WAVEFRONT_LANES // (width * height)))

    def trace_batch(s0, sb: int):
        """Trace samples [s0, s0+sb) as one (sb, H, W) wavefront.
        ``s0`` may be a traced scalar (the fori-batched path)."""
        s_idx = jnp.arange(sb) + s0
        fidx = frame_index + s_idx  # (sb,)
        jx_t, jy_t = taa_jitter(fidx)  # (sb,)
        bx, by = next_blue_noise(blue_noise_tbl, xs, ys,
                                 fidx[:, None, None])  # (sb, H, W)
        jitter_x = jx_t[:, None, None] + (bx - 0.5) * 0.25
        jitter_y = jy_t[:, None, None] + (by - 0.5) * 0.25
        # GLOBAL pixel coords -> camera uv (bottom-up, scene_kernels.cuh
        # :140-146); identical to pixel_grid() when tile is None
        xf = xs.astype(jnp.float32)[None, :, :]
        yf = ys.astype(jnp.float32)[None, :, :]
        sg = (xf + 0.5 + jitter_x) / float(full_w)
        tg = (yf + 0.5 + jitter_y) / float(full_h)
        sub = prng.fold(rng_state, s_idx[:, None, None] + 1)  # (sb, H, W)
        sub, ray = camera.get_ray(sg, tg, sub)
        _, out = trace_path(geom, materials, lights, n_lights, sky, ray,
                            sub, max_depth, split=split,
                            use_brute=use_brute, rr_enabled=rr_enabled,
                            rr_start=rr_start, camera_nee=camera_nee,
                            pixel_grid=True)
        return out

    def batch_parts(s0, sb):
        out = trace_batch(s0, sb)
        mean0 = lambda c: jnp.sum(c, axis=0)
        sums = (out.radiance.map(mean0), out.diffuse.map(mean0),
                out.specular.map(mean0), out.emission.map(mean0),
                out.rays_traced)
        first = (out.first_normal.map(lambda c: c[0]),
                 out.first_depth[0], out.first_object_id[0],
                 out.first_roughness[0], out.first_transmission[0])
        return sums, first

    n_full = spp // batch
    rem = spp - n_full * batch
    if n_full > 1:
        # batches as a fori_loop: ONE integrator/traversal instantiation in
        # the program no matter how many sequential wavefront batches the
        # lane budget forces (an unrolled python loop made the 1080p@4spp
        # bench program 4 traversals big — the dominant compile cost)
        def fbody(b, carry):
            sums, first = carry
            s, f = batch_parts(b * batch, batch)
            sums = jax.tree_util.tree_map(jnp.add, sums, s)
            pickb0 = lambda cur, new: jnp.where(b == 0, new, cur)
            first = jax.tree_util.tree_map(pickb0, first, f)
            return sums, first

        zero3 = lambda: Vec3.zeros((height, width))
        init = (
            (zero3(), zero3(), zero3(), zero3(), jnp.float32(0.0)),
            (zero3(), jnp.zeros((height, width)),
             jnp.zeros((height, width), jnp.int32),
             jnp.zeros((height, width)), jnp.zeros((height, width))),
        )
        sums, first = jax.lax.fori_loop(0, n_full, fbody, init)
        acc = sums + (first,)
    else:
        # batch == spp (single wavefront) or spp < 2*batch: no loop needed
        s, f = batch_parts(0, batch)
        acc = s + (f,)
    if rem:
        s, _ = batch_parts(n_full * batch, rem)
        acc = tuple(jax.tree_util.tree_map(jnp.add, a, p)
                    for a, p in zip(acc[:5], s)) + (acc[5],)

    color, diff, spec, emis, rays, first = acc
    inv = 1.0 / float(spp)
    normal, depth, objid, rough, trans = first
    # the persistent per-pixel stream advances once per frame; sample streams
    # are derived from it, so one step decorrelates successive frames
    state, _ = prng.uniform(rng_state)
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
