"""Cube Slider — the endless-runner demo game.

Recreates the reference's cube-slider example game (screenshots
``Test game screenshots/cube slider/``: a player cube sliding down a glowing
track, dodging dark obstacle cubes and collecting emissive pickups).  The
reference games are a ``main()`` + per-frame step over the UnifiedScene API
(``README.md`` "Example Games"); here the game state is a jitted JAX pytree
update and the scene edits flow through ObjectHandles exactly like the
reference's incremental-edit path (``PTRTtransfer.cuh:1392-1468, 2204``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ptrt_tpu.scene.materials import Material, Materials
from ptrt_tpu.scene.unified import (UnifiedScene, UnifiedSceneBuilder)

N_OBSTACLES = 6
N_PICKUPS = 3
TRACK_HALF_W = 2.2
PLAYER_Z = 0.0
SPEED = 8.0
LANE_ACCEL = 18.0


class GameState(NamedTuple):
    t: jnp.ndarray  # game time
    player_x: jnp.ndarray
    player_vx: jnp.ndarray
    obstacle_z: jnp.ndarray  # (N,) distance ahead
    obstacle_x: jnp.ndarray
    pickup_z: jnp.ndarray
    pickup_x: jnp.ndarray
    pickup_alive: jnp.ndarray  # bool (N,)
    score: jnp.ndarray
    alive: jnp.ndarray  # bool


def init_state(seed: int = 0) -> GameState:
    k = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(k, 4)
    return GameState(
        t=jnp.float32(0),
        player_x=jnp.float32(0),
        player_vx=jnp.float32(0),
        obstacle_z=jnp.linspace(10.0, 60.0, N_OBSTACLES)
        + jax.random.uniform(k1, (N_OBSTACLES,)) * 4.0,
        obstacle_x=jax.random.uniform(k2, (N_OBSTACLES,), minval=-TRACK_HALF_W,
                                      maxval=TRACK_HALF_W),
        pickup_z=jnp.linspace(15.0, 55.0, N_PICKUPS)
        + jax.random.uniform(k3, (N_PICKUPS,)) * 5.0,
        pickup_x=jax.random.uniform(k4, (N_PICKUPS,), minval=-TRACK_HALF_W,
                                    maxval=TRACK_HALF_W),
        pickup_alive=jnp.ones(N_PICKUPS, bool),
        score=jnp.float32(0),
        alive=jnp.asarray(True),
    )


@partial(jax.jit, static_argnames=())
def step(state: GameState, steer: jnp.ndarray, dt: jnp.ndarray) -> GameState:
    """One fixed game tick.  ``steer`` in [-1, 1]."""
    alive_f = state.alive.astype(jnp.float32)
    vx = state.player_vx + steer * LANE_ACCEL * dt
    vx = vx * 0.92  # lane damping
    px = jnp.clip(state.player_x + vx * dt * alive_f, -TRACK_HALF_W,
                  TRACK_HALF_W)

    # world scrolls toward the player
    oz = state.obstacle_z - SPEED * dt * alive_f
    pz = state.pickup_z - SPEED * dt * alive_f

    # recycle passed obstacles ahead with a hash-scrambled lane
    def recycle(z, x, salt):
        passed = z < -2.0
        h = jnp.sin(z * 12.9898 + x * 78.233 + salt) * 43758.5453
        new_x = (h - jnp.floor(h)) * 2.0 * TRACK_HALF_W - TRACK_HALF_W
        return jnp.where(passed, z + 64.0, z), jnp.where(passed, new_x, x)

    oz, ox = recycle(oz, state.obstacle_x, 1.0)
    passed_pk = pz < -2.0  # recycled pickups come back alive
    pz, pxk = recycle(pz, state.pickup_x, 2.0)

    # collisions (AABB overlap in x/z at the player's z)
    hit_obs = jnp.any((jnp.abs(oz - PLAYER_Z) < 0.9)
                      & (jnp.abs(ox - px) < 0.9))
    got_pick = ((jnp.abs(pz - PLAYER_Z) < 0.8) & (jnp.abs(pxk - px) < 0.8)
                & state.pickup_alive)
    score = state.score + got_pick.sum() * 10.0 + SPEED * dt * 0.5 * alive_f
    pk_alive = (state.pickup_alive | passed_pk) & jnp.logical_not(got_pick)

    return GameState(
        t=state.t + dt,
        player_x=px,
        player_vx=vx,
        obstacle_z=oz,
        obstacle_x=ox,
        pickup_z=pz,
        pickup_x=pxk,
        pickup_alive=pk_alive,
        score=score,
        alive=state.alive & jnp.logical_not(hit_obs),
    )


def build_scene(width: int = 640, height: int = 360) -> tuple:
    """The purple-glow track world of the screenshots."""
    u = UnifiedScene(width, height)
    u.set_sky_gradient((0.55, 0.5, 0.75), (0.45, 0.42, 0.6))

    track = Material.make((0.75, 0.6, 0.95), 0.4)
    track = track.replace(emission=(0.25, 0.18, 0.4))
    u.add_plane_xz(-0.5, 200.0, track).set_name("track")

    player = u.add_cube(Materials.Silver()).set_name("player")
    player.set_scale(0.8).set_dynamic(True)

    for i in range(N_OBSTACLES):
        ob = u.add_cube(Material.make((0.08, 0.06, 0.1), 0.6))
        ob.set_name(f"obstacle_{i}").set_scale(0.9).set_dynamic(True)
    for i in range(N_PICKUPS):
        pk = u.add_cube(Materials.EmissiveLamp((1.0, 0.5, 1.0), 6.0))
        pk.set_name(f"pickup_{i}").set_scale(0.5).set_dynamic(True)

    u.add_point_light((0, 8, 4), (0.9, 0.8, 1.0), 3.0, range=40.0, radius=0.3)
    u.set_camera((0, 2.2, -4.5), (0, 0.4, 6.0), (0, 1, 0), 55.0)
    u.samples_per_pixel = 1
    u.max_bounce_depth = 3
    return u, UnifiedSceneBuilder.build_pt_scene(u)


def sync_scene(u: UnifiedScene, pt_scene, state: GameState) -> None:
    """Push game state into the scene via handles (the reference's
    per-frame edit/commit path)."""
    s = jax.device_get(state)
    u.find_object("player").set_position((float(s.player_x), 0.0, PLAYER_Z))
    for i in range(N_OBSTACLES):
        u.find_object(f"obstacle_{i}").set_position(
            (float(s.obstacle_x[i]), 0.0, float(s.obstacle_z[i])))
    for i in range(N_PICKUPS):
        y = 0.2 if bool(s.pickup_alive[i]) else -100.0  # hide collected
        u.find_object(f"pickup_{i}").set_position(
            (float(s.pickup_x[i]), y, float(s.pickup_z[i])))
    UnifiedSceneBuilder.update_pt_scene(pt_scene, u)


def derive_scene(state: GameState, base_rot, base_scale):
    """Game state -> per-instance TRS (dynamic-mesh order: player,
    obstacles, pickups) — the fused-frame scene update (games/fused.py).
    Collected pickups hide by dropping far below the track (the data-side
    equivalent of the reference's hidden-handle scale collapse,
    ``PTRTtransfer.cuh:2281-2295``)."""
    from ptrt_tpu.games.fused import DerivedScene

    player = jnp.stack([state.player_x, jnp.float32(0.0),
                        jnp.float32(PLAYER_Z)])[None, :]
    obst = jnp.stack([state.obstacle_x,
                      jnp.zeros_like(state.obstacle_x),
                      state.obstacle_z], axis=-1)
    pk_y = jnp.where(state.pickup_alive, 0.2, -100.0)
    pick = jnp.stack([state.pickup_x, pk_y, state.pickup_z], axis=-1)
    pos = jnp.concatenate([player, obst, pick], axis=0)
    return DerivedScene(pos=pos, rot=base_rot, scale=base_scale)


def run_fused(n_frames: int = 60, width: int = 640, height: int = 360,
              preset: str = "fast", present=None):
    """The north-star loop: step+scene-update+render as ONE XLA program
    per frame, zero host scene edits.  Returns (state, fps, last_rgb8)."""
    from ptrt_tpu.games.fused import FusedRunner

    u, scene = build_scene(width, height)
    scene.set_performance_preset(preset)
    dyn = [m for m in scene.meshes if m.is_dynamic]
    base_rot = jnp.asarray(np.stack([m.transform.rotation for m in dyn]),
                           jnp.float32)
    base_scale = jnp.asarray(np.stack([m.transform.scale for m in dyn]),
                             jnp.float32)
    runner = FusedRunner(
        scene,
        step_fn=lambda s, inp: step(s, inp[0], inp[1]),
        derive_fn=lambda s: derive_scene(s, base_rot, base_scale))
    dt = jnp.float32(1.0 / 30.0)
    inputs = lambda i: (jnp.float32(np.sin(i * 0.2)), dt)
    return runner.run(init_state(), inputs, n_frames, present=present)


def run_headless(n_steps: int = 30, width: int = 160, height: int = 90,
                 render_every: int = 10, preset: str = "fast"):
    """Drive the game loop; returns (final_state, frames list)."""
    u, scene = build_scene(width, height)
    scene.set_performance_preset(preset)
    state = init_state()
    frames = []
    dt = jnp.float32(1.0 / 30.0)
    for i in range(n_steps):
        steer = jnp.float32(np.sin(i * 0.2))  # scripted input
        state = step(state, steer, dt)
        sync_scene(u, scene, state)
        if i % render_every == 0:
            frames.append(scene.render_frame())
    return state, frames
