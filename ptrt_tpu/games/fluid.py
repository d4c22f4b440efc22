"""Heightfield fluid simulation feeding the dynamic-triangles render path.

The reference shipped a fluid-sim example game (screenshot
``Test game screenshots/fluid sim.PNG``; code external to the repo) that
pushed per-frame procedural triangles through the ``Triangles``-type dynamic
mesh hook (``PTRTtransfer.cuh:2250-2270``).  This module provides the
TPU-native equivalent: a jitted shallow-water (2D wave-equation) step on an
(N, N) grid — pure stencil math, ideal VPU work — plus a vectorized
heightfield->triangle-soup conversion that drives ``ObjectHandle
.set_triangles`` every frame.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ptrt_tpu.scene.materials import Materials
from ptrt_tpu.scene.unified import UnifiedScene, UnifiedSceneBuilder


class FluidState(NamedTuple):
    height: jnp.ndarray  # (N, N) water height
    velocity: jnp.ndarray  # (N, N) vertical velocity


def init_state(n: int = 32, drop: bool = True) -> FluidState:
    h = jnp.zeros((n, n), jnp.float32)
    if drop:
        ys, xs = jnp.mgrid[0:n, 0:n]
        r2 = (xs - n * 0.35) ** 2 + (ys - n * 0.5) ** 2
        h = h + 0.6 * jnp.exp(-r2 / (0.02 * n * n))
    return FluidState(height=h, velocity=jnp.zeros((n, n), jnp.float32))


@partial(jax.jit, static_argnames=())
def step(state: FluidState, dt: jnp.ndarray, wave_speed: jnp.ndarray,
         damping: jnp.ndarray) -> FluidState:
    """Damped 2D wave equation with reflecting borders — one stencil pass."""
    h = state.height
    lap = (
        jnp.roll(h, 1, 0) + jnp.roll(h, -1, 0)
        + jnp.roll(h, 1, 1) + jnp.roll(h, -1, 1) - 4.0 * h
    )
    v = (state.velocity + wave_speed * wave_speed * lap * dt) * damping
    return FluidState(height=h + v * dt, velocity=v)


def add_drop(state: FluidState, x: float, y: float,
             amplitude: float = 0.5, radius: float = 0.05) -> FluidState:
    n = state.height.shape[0]
    ys, xs = jnp.mgrid[0:n, 0:n]
    r2 = (xs / n - x) ** 2 + (ys / n - y) ** 2
    return state._replace(
        height=state.height + amplitude * jnp.exp(-r2 / (radius * radius)))


@partial(jax.jit, static_argnames=("extent",))
def heightfield_to_triangles(height: jnp.ndarray, extent: float = 4.0,
                             base_y: float = 0.0) -> jnp.ndarray:
    """(N, N) heights -> (T, 3, 3) world-space triangle soup.

    Two triangles per cell, built with pure slicing (no gathers).
    """
    n = height.shape[0]
    xs = jnp.linspace(-extent / 2, extent / 2, n)
    zs = jnp.linspace(-extent / 2, extent / 2, n)
    px = jnp.broadcast_to(xs[None, :], (n, n))
    pz = jnp.broadcast_to(zs[:, None], (n, n))
    py = base_y + height

    p = jnp.stack([px, py, pz], axis=-1)  # (n, n, 3)
    a = p[:-1, :-1]
    b = p[:-1, 1:]
    c = p[1:, 1:]
    d = p[1:, :-1]
    t1 = jnp.stack([a, c, b], axis=-2)  # winding: up-facing normals
    t2 = jnp.stack([a, d, c], axis=-2)
    tris = jnp.concatenate([t1.reshape(-1, 3, 3), t2.reshape(-1, 3, 3)], 0)
    return tris


def build_scene(width: int = 320, height: int = 180, n: int = 24) -> tuple:
    """Water pool scene: fluid surface + walls + a light rig."""
    u = UnifiedScene(width, height)
    u.set_sky_gradient((0.5, 0.65, 0.9), (0.9, 0.95, 1.0))
    state = init_state(n)
    tris = np.asarray(heightfield_to_triangles(state.height))
    u.add_triangles(tris, Materials.Water()).set_name("fluid")
    u.add_plane_xz(-0.6, 12.0, Materials.Concrete()).set_name("floor")
    u.add_point_light((3, 5, 2), (1.0, 0.95, 0.9), 4.0, range=30.0,
                      radius=0.2)
    u.add_directional_light((-0.4, -1.0, -0.3), (0.7, 0.8, 1.0), 0.8)
    u.set_camera((0, 2.5, -4.0), (0, 0, 0), (0, 1, 0), 55.0)
    u.samples_per_pixel = 1
    u.max_bounce_depth = 4
    return u, UnifiedSceneBuilder.build_pt_scene(u), state


def derive_scene(state: FluidState):
    """Fluid state -> scene update: identity TRS + a device BVH refit of
    the surface BLAS from the new heightfield (games/fused.py).  The whole
    geometry update runs inside the fused frame program — the reference
    rebuilt this mesh's BVH on the CPU every frame."""
    from ptrt_tpu.games.fused import DerivedScene

    tris = heightfield_to_triangles(state.height)
    return DerivedScene(
        pos=jnp.zeros((1, 3), jnp.float32),
        rot=jnp.zeros((1, 3), jnp.float32),
        scale=jnp.ones((1, 3), jnp.float32),
        refits={0: (tris[:, 0], tris[:, 1], tris[:, 2])})


def run_fused(n_frames: int = 30, width: int = 320, height: int = 180,
              grid: int = 24, preset: str = "fast", present=None):
    """step + refit + render as one XLA program; returns (state, fps,
    last rgb8)."""
    from ptrt_tpu.games.fused import FusedRunner

    u, scene, state = build_scene(width, height, grid)
    scene.set_performance_preset(preset)
    runner = FusedRunner(
        scene,
        step_fn=lambda s, dt_: step(s, dt_, jnp.float32(6.0),
                                    jnp.float32(0.995)),
        derive_fn=derive_scene)
    dt = jnp.float32(1.0 / 30.0)
    return runner.run(state, lambda i: dt, n_frames, present=present)


def run_headless(n_steps: int = 20, width: int = 160, height: int = 90,
                 grid: int = 24, render_every: int = 10):
    u, scene, state = build_scene(width, height, grid)
    scene.set_performance_preset("fast")
    frames = []
    dt = jnp.float32(1.0 / 30.0)
    for i in range(n_steps):
        state = step(state, dt, jnp.float32(6.0), jnp.float32(0.995))
        tris = np.asarray(heightfield_to_triangles(state.height))
        u.find_object("fluid").set_triangles(tris)
        UnifiedSceneBuilder.update_pt_scene(scene, u)
        if i % render_every == 0:
            frames.append(scene.render_frame())
    return state, frames
