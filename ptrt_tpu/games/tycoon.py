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
