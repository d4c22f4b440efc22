"""Sky sampling: vertical gradient or equirectangular HDRI environment.

Equivalent of ``sampleSky``/``sampleSkyDir`` (``render_utils.cuh:115-158``).
The HDRI is a (H, W, 3) float32 array sampled bilinearly (the reference uses
a CUDA texture object with HW bilinear filtering, ``scene.cuh:958-1026``).
Whether an env map exists is static per compiled program.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ptrt_tpu.core.vec import PI, TWO_PI, Vec3, lerp


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class SkyConfig:
    top: Vec3
    bottom: Vec3
    use_sky: jnp.ndarray  # float 0/1 multiplier
    env: Optional[jnp.ndarray] = None  # (H, W, 3) linear HDR
    env_rotation: jnp.ndarray = 0.0  # radians, yaw around +y

    def tree_flatten(self):
        return (self.top, self.bottom, self.use_sky, self.env,
                self.env_rotation), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @staticmethod
    def gradient(top=(0.5, 0.7, 1.0), bottom=(1.0, 1.0, 1.0)) -> "SkyConfig":
        return SkyConfig(
            top=Vec3(*[jnp.float32(c) for c in top]),
            bottom=Vec3(*[jnp.float32(c) for c in bottom]),
            use_sky=jnp.float32(1.0),
        )

    @staticmethod
    def off() -> "SkyConfig":
        return SkyConfig(
            top=Vec3.full(jnp.float32(0.0)), bottom=Vec3.full(jnp.float32(0.0)),
            use_sky=jnp.float32(0.0),
        )

    @staticmethod
    def hdri(env_map, rotation: float = 0.0) -> "SkyConfig":
        return SkyConfig(
            top=Vec3.full(jnp.float32(0.0)), bottom=Vec3.full(jnp.float32(0.0)),
            use_sky=jnp.float32(1.0), env=jnp.asarray(env_map, jnp.float32),
            env_rotation=jnp.float32(rotation),
        )


def sample_sky(dir: Vec3, sky: SkyConfig) -> Vec3:
    """Radiance for rays escaping to the environment."""
    if sky.env is None:
        t = 0.5 * (dir.y + 1.0)
        c = lerp(sky.bottom, sky.top, t)
        return c * sky.use_sky

    h, w = sky.env.shape[0], sky.env.shape[1]
    phi = jnp.arctan2(dir.z, dir.x) + sky.env_rotation
    theta = jnp.arccos(jnp.clip(dir.y, -1.0, 1.0))
    u = jnp.mod((phi + PI) * (1.0 / TWO_PI), 1.0)
    v = theta * (1.0 / PI)

    # bilinear fetch with wrap in u, clamp in v
    fx = u * w - 0.5
    fy = v * h - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = fx - x0
    ty = fy - y0
    x0i = jnp.mod(x0.astype(jnp.int32), w)
    x1i = jnp.mod(x0i + 1, w)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)

    def fetch(yy, xx):
        c = sky.env[yy, xx]
        return Vec3(c[..., 0], c[..., 1], c[..., 2])

    c00 = fetch(y0i, x0i)
    c01 = fetch(y0i, x1i)
    c10 = fetch(y1i, x0i)
    c11 = fetch(y1i, x1i)
    top_row = lerp(c00, c01, tx)
    bot_row = lerp(c10, c11, tx)
    return lerp(top_row, bot_row, ty) * sky.use_sky
