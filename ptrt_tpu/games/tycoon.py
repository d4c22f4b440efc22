"""Tycoon — grid-building demo game.

Recreates the reference's tycoon example (screenshots
``Test game screenshots/tycoon/``: voxel buildings placed on a dark ground
plane in building/map modes).  State is a jitted economy tick + an occupancy
grid; placing a building instantiates a dynamic cube stack through the
unified scene's ``instantiate_object`` path, matching how the reference
games spawn objects at runtime.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ptrt_tpu.scene.materials import Material, Materials
from ptrt_tpu.scene.unified import (UnifiedMeshDesc, UnifiedScene,
                                    UnifiedSceneBuilder)

GRID = 8
CELL = 2.0

BUILDING_TYPES = [
    # (name, cost, income/s, height, material factory)
    ("hut", 50.0, 2.0, 0.8, lambda: Materials.WoodOak()),
    ("shop", 120.0, 6.0, 1.4, lambda: Materials.PlasticRed()),
    ("tower", 400.0, 18.0, 3.0, lambda: Materials.Chrome()),
]


class EconomyState(NamedTuple):
    money: jnp.ndarray
    income: jnp.ndarray
    t: jnp.ndarray


def init_economy(start_money: float = 100.0) -> EconomyState:
    return EconomyState(money=jnp.float32(start_money),
                        income=jnp.float32(0.0), t=jnp.float32(0.0))


@partial(jax.jit, static_argnames=())
def tick(state: EconomyState, dt: jnp.ndarray) -> EconomyState:
    return EconomyState(money=state.money + state.income * dt,
                        income=state.income, t=state.t + dt)


class TycoonGame:
    def __init__(self, width: int = 320, height: int = 180):
        self.unified = UnifiedScene(width, height)
        u = self.unified
        u.set_sky_gradient((0.45, 0.45, 0.55), (0.25, 0.22, 0.25))
        u.add_plane_xz(0.0, GRID * CELL,
                       Material.make((0.25, 0.18, 0.12), 0.8)).set_name("map")
        u.add_directional_light((-0.4, -1.0, -0.2), (1.0, 0.95, 0.85), 1.2)
        u.add_point_light((0, 10, -6), (0.9, 0.9, 1.0), 3.0, range=50.0,
                          radius=0.3)
        u.set_camera((0, 9, -14), (0, 0, 0), (0, 1, 0), 50.0)
        u.samples_per_pixel = 1
        u.max_bounce_depth = 3
        self.scene = UnifiedSceneBuilder.build_pt_scene(u)
        self.economy = init_economy()
        self.grid = np.full((GRID, GRID), -1, np.int32)  # building type ids
        self.build_mode = False

    # -- game verbs ----------------------------------------------------------
    def toggle_build_mode(self) -> bool:
        self.build_mode = not self.build_mode
        return self.build_mode

    def can_place(self, gx: int, gz: int, type_id: int) -> bool:
        if not (0 <= gx < GRID and 0 <= gz < GRID):
            return False
        if self.grid[gz, gx] >= 0:
            return False
        return float(self.economy.money) >= BUILDING_TYPES[type_id][1]

    def place_building(self, gx: int, gz: int, type_id: int) -> bool:
        """Spend money, mark grid, spawn the building mesh."""
        if not self.can_place(gx, gz, type_id):
            return False
        name, cost, income, h, mat = BUILDING_TYPES[type_id]
        self.economy = EconomyState(
            money=self.economy.money - cost,
            income=self.economy.income + income,
            t=self.economy.t)
        self.grid[gz, gx] = type_id
        x = (gx - (GRID - 1) / 2.0) * CELL
        z = (gz - (GRID - 1) / 2.0) * CELL
        handle = self.unified.instantiate_object(
            UnifiedMeshDesc.Cube(mat()), name=f"b_{gx}_{gz}")
        handle.set_scale((1.4, h, 1.4)).set_position((x, h / 2.0, z))
        UnifiedSceneBuilder.update_pt_scene(self.scene, self.unified)
        return True

    def demolish(self, gx: int, gz: int) -> bool:
        if not (0 <= gx < GRID and 0 <= gz < GRID) or self.grid[gz, gx] < 0:
            return False
        tid = int(self.grid[gz, gx])
        self.grid[gz, gx] = -1
        self.economy = EconomyState(
            money=self.economy.money,
            income=self.economy.income - BUILDING_TYPES[tid][2],
            t=self.economy.t)
        # hide via scale collapse (the reference's hidden<->visible trick,
        # PTRTtransfer.cuh:2281-2295)
        self.unified.find_object(f"b_{gx}_{gz}").set_scale(1e-5) \
            .set_position((0, -100, 0))
        UnifiedSceneBuilder.update_pt_scene(self.scene, self.unified)
        return True

    def update(self, dt: float) -> None:
        self.economy = tick(self.economy, jnp.float32(dt))

    def render(self):
        return self.scene.render_frame()


# -- fused variant ------------------------------------------------------------
#
# The handle-based TycoonGame above mirrors the reference's host-side edit
# loop (instantiate_object + update_pt_scene per placement).  The fused
# variant is the TPU-native formulation: every (cell, building-type) pair
# is a PRE-ALLOCATED scale-collapsed dynamic instance (the reference's own
# hidden<->visible scale trick, PTRTtransfer.cuh:2281-2295, promoted to a
# device-side array), so placement and demolition are pure device state
# edits consumed INSIDE the jitted step — step + economy + scene derive +
# trace + tonemap is ONE XLA program per frame, zero host scene edits.


class FusedTycoonState(NamedTuple):
    grid: jnp.ndarray  # (GRID, GRID) int32 building type, -1 = empty
    pop: jnp.ndarray  # (GRID, GRID) f32 build "pop-up" animation [0, 1]
    money: jnp.ndarray
    income: jnp.ndarray
    t: jnp.ndarray


def init_fused_state(start_money: float = 200.0) -> FusedTycoonState:
    return FusedTycoonState(
        grid=jnp.full((GRID, GRID), -1, jnp.int32),
        pop=jnp.zeros((GRID, GRID), jnp.float32),
        money=jnp.float32(start_money),
        income=jnp.float32(0.0),
        t=jnp.float32(0.0))


# action codes for the fused step's input tuple
ACT_NONE, ACT_PLACE, ACT_DEMOLISH = 0, 1, 2


def fused_step(s: FusedTycoonState, inp) -> FusedTycoonState:
    """One tick: economy + at most one build/demolish action, all device.

    ``inp`` = (action, gx, gz, type_id, dt) — scalars (host input polling
    is the one legitimate host job in the fused loop)."""
    action, gx, gz, tid, dt = inp
    costs = jnp.asarray([b[1] for b in BUILDING_TYPES], jnp.float32)
    incomes = jnp.asarray([b[2] for b in BUILDING_TYPES], jnp.float32)
    inb = (gx >= 0) & (gx < GRID) & (gz >= 0) & (gz < GRID)
    gxc = jnp.clip(gx, 0, GRID - 1)
    gzc = jnp.clip(gz, 0, GRID - 1)
    tidc = jnp.clip(tid, 0, len(BUILDING_TYPES) - 1)
    cell = s.grid[gzc, gxc]
    cost = costs[tidc]
    can_place = ((action == ACT_PLACE) & inb & (cell < 0)
                 & (s.money >= cost))
    can_demo = (action == ACT_DEMOLISH) & inb & (cell >= 0)
    grid = jnp.where(can_place, s.grid.at[gzc, gxc].set(tidc), s.grid)
    grid = jnp.where(can_demo, grid.at[gzc, gxc].set(-1), grid)
    money = s.money + s.income * dt - jnp.where(can_place, cost, 0.0)
    income = (s.income
              + jnp.where(can_place, incomes[tidc], 0.0)
              - jnp.where(can_demo, incomes[jnp.maximum(cell, 0)], 0.0))
    pop = jnp.clip(s.pop + 2.0 * dt, 0.0, 1.0)
    pop = jnp.where(can_place, pop.at[gzc, gxc].set(0.0), pop)
    return FusedTycoonState(grid=grid, pop=pop, money=money, income=income,
                            t=s.t + dt)


def _cell_centers() -> np.ndarray:
    gx, gz = np.meshgrid(np.arange(GRID), np.arange(GRID), indexing="xy")
    x = (gx - (GRID - 1) / 2.0) * CELL
    z = (gz - (GRID - 1) / 2.0) * CELL
    return np.stack([x.reshape(-1), np.zeros(GRID * GRID),
                     z.reshape(-1)], axis=1).astype(np.float32)


def derive_fused_scene(s: FusedTycoonState, centers: jnp.ndarray):
    """(GRID^2 * n_types) instance TRS from the grid: the instance for
    (type t, cell c) is visible iff grid[c] == t, with a pop-up height
    animation; hidden instances scale-collapse in place."""
    from ptrt_tpu.games.fused import DerivedScene

    n_types = len(BUILDING_TYPES)
    heights = jnp.asarray([b[3] for b in BUILDING_TYPES], jnp.float32)
    grid = s.grid.reshape(-1)  # (C,)
    anim = 0.2 + 0.8 * s.pop.reshape(-1)  # pop-up ease
    pos_list, scale_list = [], []
    for t in range(n_types):
        vis = grid == t
        h = heights[t] * anim
        sy = jnp.where(vis, h, 1e-6)
        sxz = jnp.where(vis, 1.4, 1e-6)
        pos_list.append(jnp.stack(
            [centers[:, 0], sy * 0.5, centers[:, 2]], axis=1))
        scale_list.append(jnp.stack([sxz, sy, sxz], axis=1))
    pos = jnp.concatenate(pos_list)
    scale = jnp.concatenate(scale_list)
    rot = jnp.zeros_like(pos)
    return DerivedScene(pos=pos, rot=rot, scale=scale)


def build_fused_scene(width: int = 640, height: int = 360):
    """Scene with GRID^2 x n_types pre-allocated dynamic building slots
    (type-major order, matching derive_fused_scene)."""
    u = UnifiedScene(width, height)
    u.set_sky_gradient((0.45, 0.45, 0.55), (0.25, 0.22, 0.25))
    u.add_plane_xz(0.0, GRID * CELL,
                   Material.make((0.25, 0.18, 0.12), 0.8)).set_name("map")
    u.add_directional_light((-0.4, -1.0, -0.2), (1.0, 0.95, 0.85), 1.2)
    u.add_point_light((0, 10, -6), (0.9, 0.9, 1.0), 3.0, range=50.0,
                      radius=0.3)
    u.set_camera((0, 9, -14), (0, 0, 0), (0, 1, 0), 50.0)
    u.samples_per_pixel = 1
    u.max_bounce_depth = 3
    centers = _cell_centers()
    for t, (name, _, _, _, mat) in enumerate(BUILDING_TYPES):
        for c in range(GRID * GRID):
            h = u.add_cube(mat())
            h.set_name(f"slot_{name}_{c}")
            h.set_position((float(centers[c, 0]), -100.0,
                            float(centers[c, 2]))).set_scale(1e-6)
            u.meshes[h.index].is_dynamic = True
    scene = UnifiedSceneBuilder.build_pt_scene(u)
    return u, scene, jnp.asarray(centers)


def run_fused(n_frames: int = 60, width: int = 640, height: int = 360,
              preset: str = "fast", present=None):
    """Fused tycoon loop: scripted placements consumed inside the jitted
    frame.  Returns (state, fps, last_rgb8)."""
    from ptrt_tpu.games.fused import FusedRunner

    u, scene, centers = build_fused_scene(width, height)
    scene.set_performance_preset(preset)
    runner = FusedRunner(scene, step_fn=fused_step,
                         derive_fn=lambda s: derive_fused_scene(s, centers))
    dt = jnp.float32(1.0 / 30.0)
    rng = np.random.default_rng(7)
    script = [(ACT_PLACE, int(rng.integers(0, GRID)),
               int(rng.integers(0, GRID)), int(rng.integers(0, 3)))
              for _ in range(n_frames + 1)]

    def inputs(i):
        a, gx, gz, tid = script[i] if i % 3 == 0 else (ACT_NONE, 0, 0, 0)
        return (jnp.int32(a), jnp.int32(gx), jnp.int32(gz), jnp.int32(tid),
                dt)

    return runner.run(init_fused_state(), inputs, n_frames, present=present)


def run_headless(n_steps: int = 8, width: int = 160, height: int = 90):
    """Scripted session: earn, build a few structures, render."""
    game = TycoonGame(width, height)
    game.scene.set_performance_preset("fast")
    rng = np.random.default_rng(3)
    frames = [game.render()]
    placements = [(2, 2, 0), (3, 2, 0), (5, 4, 1), (2, 5, 0)]
    pi = 0
    for i in range(n_steps):
        game.update(1.0)
        if pi < len(placements):
            gx, gz, tid = placements[pi]
            if game.place_building(gx, gz, tid):
                pi += 1
    frames.append(game.render())
    return game, frames
