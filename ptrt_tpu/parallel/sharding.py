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
