"""Multi-chip scaling: pixel-tile sharding over a device mesh.

The reference is single-GPU; its only "data parallelism" is one CUDA thread
per pixel (SURVEY.md §2.5).  The TPU-native scaling axis is the same one,
lifted across chips: the (H, W) pixel grid is sharded over a 2-D
``jax.sharding.Mesh`` with ``NamedSharding``s, scene tables (triangles, BVH,
materials, lights) are replicated, and XLA inserts the collectives — halo
exchanges for the denoiser/bloom convolutions ride the ICI; the tonemapped
frame is gathered only if the host asks for it.

Because the whole frame is ONE jitted program (render/pipeline.py), sharding
is purely annotation: no host-side tile loop, no manual communication.
"""

from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_pixel_mesh(n_devices: int | None = None) -> Mesh:
    """A (y, x) device mesh, as square as the device count allows."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    best = 1
    for dy in range(1, int(math.isqrt(n)) + 1):
        if n % dy == 0:
            best = dy
    dy, dx = best, n // best
    arr = np.array(devs).reshape(dy, dx)
    return Mesh(arr, ("y", "x"))


def shard_pixels(mesh: Mesh, tree):
    """Place every (H, W[, ...]) leaf of a pytree on the pixel mesh (rows
    over 'y', cols over 'x'); rank<2 leaves are replicated."""

    def place(leaf):
        x = jax.numpy.asarray(leaf)
        if x.ndim >= 2:
            spec = P("y", "x", *([None] * (x.ndim - 2)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, tree)


def replicate(mesh: Mesh, tree):
    return jax.tree_util.tree_map(
        lambda leaf: jax.device_put(jax.numpy.asarray(leaf),
                                    NamedSharding(mesh, P())), tree)


def shard_mapped_trace(mesh: Mesh, rh: int, rw: int, trace_tile):
    """Wrap a tile tracer in ``shard_map`` so the whole trace runs
    SHARD-LOCALLY: each device traces only its own pixel tile, with its
    own compaction buffers.

    Without this, GSPMD partitions the jitted walk's compaction machinery
    (global cumsum + lane-permutation gathers over the flattened
    wavefront) by ALL-GATHERING the full ray state on every device —
    measured 2,762 all-gathers in one 256x128 sharded frame program
    (tools/prof_mesh.py).  Per-pixel work is embarrassingly parallel; the
    only cross-chip traffic a frame needs is the denoiser's halo
    exchanges, which stay OUTSIDE this wrapper.

    ``trace_tile(rng_state_local, bn, geom, mats, lights, sky, camera,
    frame_idx, tile) -> (rng_state_local, FrameBuffers_local)`` — the tile
    argument is ``(y0, x0, rh, rw)`` in GLOBAL pixel coordinates
    (render/pipeline.py trace_frame makes tiled rendering bit-identical
    to whole-frame).  ``rays_traced`` is psum-reduced to a replicated
    scalar.
    """
    from jax.sharding import PartitionSpec  # local alias for clarity

    dy, dx = mesh.devices.shape
    if rh % dy or rw % dx:
        raise ValueError(f"render size {rh}x{rw} must divide the "
                         f"{dy}x{dx} mesh")
    sh, sw = rh // dy, rw // dx
    px = PartitionSpec("y", "x")
    rep = PartitionSpec()

    def local_fn(rng_state, bn, geom, mats, lights, sky, camera, frame_idx):
        yi = jax.lax.axis_index("y").astype(jax.numpy.int32)
        xi = jax.lax.axis_index("x").astype(jax.numpy.int32)
        tile = (yi * sh, xi * sw, rh, rw)
        state, bufs = trace_tile(rng_state, bn, geom, mats, lights, sky,
                                 camera, frame_idx, tile)
        bufs = bufs._replace(
            rays_traced=jax.lax.psum(bufs.rays_traced, ("y", "x")))
        return state, bufs

    # check_vma=False: the walk's while_loop carries start as
    # device-invariant zeros and become varying (per-shard rays) — the
    # varying-axes checker would demand explicit pcasts on every carry
    return jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(px, rep, rep, rep, rep, rep, rep, rep),
        out_specs=(px, _bufs_specs(px, rep)),
        check_vma=False)


def _bufs_specs(px, rep):
    """PartitionSpec pytree matching render/pipeline.FrameBuffers."""
    from ptrt_tpu.core.vec import Vec3
    from ptrt_tpu.render.pipeline import FrameBuffers

    v = Vec3(px, px, px)
    return FrameBuffers(color=v, diffuse=v, specular=v, emission=v,
                        normal=v, depth=px, object_id=px, roughness=px,
                        transmission=px, rays_traced=rep)
