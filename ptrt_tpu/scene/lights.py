"""Light types and the SoA light table.

Equivalent of ``pathtracer/scene/lights.cuh`` (Light struct with type,
position, direction, color, intensity, range, cone angles, radius) plus the
Area type of the unified layer (``PTRTtransfer.cuh:134-240``; the reference
degrades Area to Point in both backends — we keep the factory surface and the
same degraded sampling for image parity, see SURVEY.md "defects").
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from enum import IntEnum
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ptrt_tpu.core.vec import Vec3

Color = Tuple[float, float, float]


class LightType(IntEnum):
    POINT = 0
    DIRECTIONAL = 1
    SPOT = 2
    AREA = 3  # unified-layer type; sampled as point (PTRTtransfer.cuh:1833)


@dataclass
class Light:
    """Host light record (defaults ``lights.cuh:29-53``)."""

    type: LightType = LightType.POINT
    position: Color = (0.0, 10.0, 0.0)
    direction: Color = (0.0, -1.0, 0.0)
    color: Color = (1.0, 1.0, 1.0)
    intensity: float = 1.0
    range: float = 100.0
    inner_cone: float = 0.5
    outer_cone: float = 0.7
    radius: float = 0.0  # >0 -> soft shadows via cone sampling
    width: float = 0.0  # AREA: rect extent along the U basis
    height: float = 0.0  # AREA: rect extent along the V basis

    @staticmethod
    def point(position, color=(1.0, 1.0, 1.0), intensity=1.0, range=100.0,
              radius=0.0) -> "Light":
        return Light(LightType.POINT, tuple(position), (0, -1, 0), tuple(color),
                     intensity, range, radius=radius)

    @staticmethod
    def directional(direction, color=(1.0, 1.0, 1.0), intensity=1.0) -> "Light":
        d = np.asarray(direction, np.float64)
        d = d / max(np.linalg.norm(d), 1e-12)
        return Light(LightType.DIRECTIONAL, (0, 0, 0), tuple(d), tuple(color),
                     intensity)

    @staticmethod
    def spot(position, direction, color=(1.0, 1.0, 1.0), intensity=1.0,
             range=100.0, inner_cone=0.5, outer_cone=0.7,
             radius=0.0) -> "Light":
        """Cone angles in RADIANS, stored as cosines — matching
        ``addSpotLight`` (``scene.cuh:1527-1544``)."""
        d = np.asarray(direction, np.float64)
        d = d / max(np.linalg.norm(d), 1e-12)
        return Light(
            LightType.SPOT, tuple(position), tuple(d), tuple(color), intensity,
            range,
            inner_cone=float(np.cos(inner_cone)),
            outer_cone=float(np.cos(outer_cone)),
            radius=radius,
        )

    @staticmethod
    def area(position, direction, width=1.0, height=1.0, color=(1.0, 1.0, 1.0),
             intensity=1.0, range=100.0) -> "Light":
        """Area light factory (``PTRTtransfer.cuh:147-211``).

        IMPROVEMENT over the reference: both reference backends silently
        degrade Area to a Point light (``PTRTtransfer.cuh:1833, 2178,
        2359`` — flagged defect in SURVEY §7); here the rect is sampled
        properly (uniform point on the quad, solid-angle pdf, single-sided
        emission along ``direction``, NEE+MIS) — see ``render/nee.py:
        sample_light``.  The U/V basis is derived from ``direction`` with
        the same deterministic ONB the device sampler uses."""
        d = np.asarray(direction, np.float64)
        d = d / max(np.linalg.norm(d), 1e-12)
        lt = Light.point(position, color, intensity, range,
                         radius=0.5 * float(np.sqrt(width * height)))
        return dataclasses.replace(lt, type=LightType.AREA,
                                   direction=tuple(d),
                                   width=float(width), height=float(height))


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class LightTable:
    """SoA device light buffers, one lane per light."""

    type: jnp.ndarray  # int32
    position: Vec3
    direction: Vec3
    color: Vec3
    intensity: jnp.ndarray
    range: jnp.ndarray
    inner_cone: jnp.ndarray
    outer_cone: jnp.ndarray
    radius: jnp.ndarray
    packed: jnp.ndarray  # (L, 16): one row gather per NEE sample

    def tree_flatten(self):
        return tuple(getattr(self, f.name) for f in dataclasses.fields(self)), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def count(self) -> int:
        return int(self.type.shape[0])

    @staticmethod
    def from_lights(lights: list[Light]) -> "LightTable":
        if not lights:
            # one dummy lane so shapes stay static; count tracked separately
            lights = [Light(intensity=0.0, color=(0, 0, 0))]

        def v3(name):
            a = np.array([getattr(l, name) for l in lights], np.float32)
            return Vec3(jnp.asarray(a[:, 0]), jnp.asarray(a[:, 1]), jnp.asarray(a[:, 2]))

        def f(name):
            return jnp.asarray(np.array([getattr(l, name) for l in lights], np.float32))

        # AREA keeps its own type: the device sampler does real rect-area
        # sampling (render/nee.py) — improvement over the reference's
        # Area->Point degradation
        types = np.array([int(l.type) for l in lights], np.int32)

        def arr3(name):
            return np.array([getattr(l, name) for l in lights], np.float32)

        def arr1(name):
            return np.array([getattr(l, name) for l in lights],
                            np.float32)[:, None]

        # packed layout: [type pos(3) dir(3) color(3) intensity range
        #                 inner outer radius width height pad]
        packed = np.concatenate(
            [types.astype(np.float32)[:, None], arr3("position"),
             arr3("direction"), arr3("color"), arr1("intensity"),
             arr1("range"), arr1("inner_cone"), arr1("outer_cone"),
             arr1("radius"), arr1("width"), arr1("height"),
             np.zeros((len(lights), 1), np.float32)], axis=1)

        return LightTable(
            type=jnp.asarray(types),
            position=v3("position"),
            direction=v3("direction"),
            color=v3("color"),
            intensity=f("intensity"),
            range=f("range"),
            inner_cone=f("inner_cone"),
            outer_cone=f("outer_cone"),
            radius=f("radius"),
            packed=jnp.asarray(packed),
        )
