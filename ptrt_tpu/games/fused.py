"""Fused game frames: step + scene update + render as ONE XLA program.

The reference's game loop edits the scene through host-side handles and
re-uploads dirty state each frame (``PTRTtransfer.cuh:1392-1468, 2204``);
round 2 reproduced that literally — a ``device_get`` of the game state,
Python handle edits, matrix rebuilds — which puts the host in the frame
loop.  The BASELINE north star instead demands ``step(state) -> (state,
frame)`` as one jitted program.

This module provides that: a game supplies
  * ``step_fn(state, inputs) -> state``            (jittable)
  * ``derive_fn(state) -> DerivedScene``           (jittable)
and ``FusedRunner`` closes the static scene tables over one jitted
``frame()`` that steps the game, rebuilds the instance matrices/AABBs on
device (geometry/dtransform.py), optionally refits refilled BLASes on
device (geometry/refit.py), traces, denoises and tonemaps — zero host
work per frame beyond fetching the finished RGB8 image.
"""

from __future__ import annotations

import dataclasses
import time
from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ptrt_tpu.geometry import dtransform as dt
from ptrt_tpu.geometry.scene_geom import InstanceSet, WorldGeometry


@dataclass
class DerivedScene:
    """What a game's ``derive_fn`` returns: per-dynamic-instance TRS (in
    the scene's dynamic-mesh order) + optional per-frame extras."""

    pos: jnp.ndarray  # (I, 3)
    rot: jnp.ndarray  # (I, 3) euler, Transform3D convention
    scale: jnp.ndarray  # (I, 3)
    camera: object = None  # optional Camera pytree override
    refits: dict = None  # {instance_index: (v0, v1, v2)} (T, 3) arrays


class FusedRunner:
    """One-program step+render over a prepared Scene.

    The scene must already contain its dynamic meshes (is_dynamic=True) in
    the order ``derive_fn`` emits.  All static data (BLAS tables, material
    and light tables, sky, blue noise) is closed over; per-frame state is
    the game state, RNG, denoiser history and prev view-proj — all device
    residents.
    """

    def __init__(self, scene, step_fn: Callable, derive_fn: Callable):
        from ptrt_tpu.scene import pt_scene as ps

        scene._ensure_device_state()
        geom = scene._geom
        if not isinstance(geom, WorldGeometry) or geom.iset is None:
            raise ValueError("FusedRunner needs a scene with dynamic "
                             "instances (WorldGeometry + InstanceSet)")
        self.scene = scene
        self._static = geom.static
        self._iset0 = geom.iset
        self._plans = scene._iset_cache[2]
        dyn = [m for m in scene.meshes if m.is_dynamic]
        lo = np.stack([m.local_aabb().lo for m in dyn]).astype(np.float32)
        hi = np.stack([m.local_aabb().hi for m in dyn]).astype(np.float32)
        self._local_lo = jnp.asarray(lo)
        self._local_hi = jnp.asarray(hi)

        rh, rw = scene.render_size
        self._size = (rh, rw)
        p = scene.perf
        denoise = bool(p.enable_denoiser)
        if denoise and scene._denoiser_state is None:
            from ptrt_tpu.render.denoiser import init_denoiser_state

            scene._denoiser_state = init_denoiser_state(rh, rw)
        body = ps._frame_fn(
            rw, rh, scene.width, scene.height,
            int(p.samples_per_pixel), int(p.max_bounce_depth),
            denoise, bool(p.enable_bloom), len(scene.lights),
            # always the BVH path: the fused world carries instances only
            # in the batched InstanceSet (the brute fallback walks the
            # host-side per-instance list, which a fused frame doesn't have)
            False, scene._sky().has_env_sampling,
            bool(p.enable_russian_roulette),
            int(p.russian_roulette_start_bounce),
            bool(p.enable_motion_vectors),
            bool(getattr(p, "camera_nee_fix", True)),
        )

        iset0, static, local_lo, local_hi = (
            self._iset0, self._static, self._local_lo, self._local_hi)
        plans = self._plans

        def frame(state, inputs, mats_tbl, lights_tbl, sky, camera,
                  rng_state, frame_idx, prev_vp, den_state, bn):
            state = step_fn(state, inputs)
            drv = derive_fn(state)
            mats = dt.instance_mats(drv.pos, drv.rot, drv.scale)
            g = iset0.geom
            llo, lhi = local_lo, local_hi
            if drv.refits:
                from ptrt_tpu.geometry.lbvh import lbvh_update
                from ptrt_tpu.geometry.refit import (refit_apply,
                                                     refit_root_aabb)

                for idx, (v0, v1, v2) in sorted(drv.refits.items()):
                    # meshes flagged device_lbvh get the Morton-sorted
                    # in-frame rebuild (geometry/lbvh.py) — per-frame
                    # topology re-shapes never leave the device
                    if dyn[idx].device_lbvh:
                        g = lbvh_update(g, plans[idx], v0, v1, v2)
                    else:
                        g = refit_apply(g, plans[idx], v0, v1, v2)
                    rlo, rhi = refit_root_aabb(g, plans[idx])
                    llo = llo.at[idx].set(rlo)
                    lhi = lhi.at[idx].set(rhi)
            bb_lo, bb_hi = dt.instance_world_aabbs(
                drv.pos, drv.rot, drv.scale, llo, lhi)
            iset = InstanceSet(geom=g, roots=iset0.roots, mats=mats,
                               bb_min=bb_lo, bb_max=bb_hi)
            world = WorldGeometry(static=static, instances=(), iset=iset)
            cam = drv.camera if drv.camera is not None else camera
            rgb8, rng_state, den_state = body(
                world, mats_tbl, lights_tbl, sky, cam, rng_state,
                frame_idx, prev_vp, den_state, bn)
            return state, rgb8, rng_state, den_state, cam

        self._frame = jax.jit(frame)

    def run(self, state, inputs_fn: Callable, n_frames: int,
            present: Callable | None = None):
        """Drive the loop; returns (state, frames/s, last rgb8).

        ``inputs_fn(i) -> pytree`` supplies per-frame inputs (host side —
        input polling is the one legitimate host job in the loop).
        """
        sc = self.scene
        prev_vp = sc.prev_view_proj
        rgb8 = None
        # warmup / compile
        state, rgb8, sc._rng_state, sc._denoiser_state, cam = self._frame(
            state, inputs_fn(0), sc._mat_table, sc._light_table, sc._sky(),
            sc.camera, sc._rng_state, jnp.int32(sc.frame_count), prev_vp,
            sc._denoiser_state, sc._blue_noise)
        prev_vp = _view_proj(cam)
        jax.block_until_ready(rgb8)
        t0 = time.time()
        for i in range(1, n_frames + 1):
            state, rgb8, sc._rng_state, sc._denoiser_state, cam = (
                self._frame(state, inputs_fn(i), sc._mat_table,
                            sc._light_table, sc._sky(), sc.camera,
                            sc._rng_state,
                            jnp.int32(sc.frame_count + i), prev_vp,
                            sc._denoiser_state, sc._blue_noise))
            prev_vp = _view_proj(cam)
            if present is not None:
                present(np.asarray(rgb8))
        jax.block_until_ready(rgb8)
        fps = n_frames / (time.time() - t0)
        sc.frame_count += n_frames + 1
        return state, fps, np.asarray(rgb8)


def _view_proj(cam):
    return cam.get_view_proj()
