"""SoA 3-vector math substrate.

TPU-native replacement for the reference's AoS ``vec3`` class
(``src/common/vec3.cuh:8-168``).  Instead of one array with a trailing
dimension of 3 (which would waste 125/128 TPU vector lanes on every
elementwise op and turn dot products into minor-dim reductions), a ``Vec3``
holds three component arrays of identical shape.  Every vector op is then a
pure elementwise VPU op over the full ray/pixel batch, and gathers fetch three
contiguous planes.

All operations broadcast like jnp arrays; components may be Python scalars,
numpy scalars, or jnp arrays.
"""

from __future__ import annotations

import math as _math
from dataclasses import dataclass
from typing import Any, Union

import jax
import jax.numpy as jnp

Scalar = Union[float, int, jnp.ndarray]


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class Vec3:
    x: Any
    y: Any
    z: Any

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        return (self.x, self.y, self.z), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- constructors -------------------------------------------------------
    @staticmethod
    def full(v: Scalar) -> "Vec3":
        """vec3(v) broadcast constructor (``vec3.cuh`` single-arg ctor)."""
        return Vec3(v, v, v)

    @staticmethod
    def zeros(shape=(), dtype=jnp.float32) -> "Vec3":
        z = jnp.zeros(shape, dtype)
        return Vec3(z, z, z)

    @staticmethod
    def ones(shape=(), dtype=jnp.float32) -> "Vec3":
        o = jnp.ones(shape, dtype)
        return Vec3(o, o, o)

    @staticmethod
    def from_array(a) -> "Vec3":
        """Build from an array whose last axis is 3 (host interop)."""
        a = jnp.asarray(a)
        return Vec3(a[..., 0], a[..., 1], a[..., 2])

    def to_array(self) -> jnp.ndarray:
        """Stack components into a trailing axis of 3 (host interop)."""
        x, y, z = jnp.broadcast_arrays(
            jnp.asarray(self.x), jnp.asarray(self.y), jnp.asarray(self.z)
        )
        return jnp.stack([x, y, z], axis=-1)

    # -- shape helpers ------------------------------------------------------
    @property
    def shape(self):
        return jnp.broadcast_shapes(
            jnp.shape(self.x), jnp.shape(self.y), jnp.shape(self.z)
        )

    @property
    def dtype(self):
        return jnp.result_type(self.x, self.y, self.z)

    def astype(self, dtype) -> "Vec3":
        return self.map(lambda c: jnp.asarray(c).astype(dtype))

    def map(self, f) -> "Vec3":
        return Vec3(f(self.x), f(self.y), f(self.z))

    def reshape(self, *shape) -> "Vec3":
        return self.map(lambda c: jnp.reshape(c, shape))

    def broadcast_to(self, shape) -> "Vec3":
        return self.map(lambda c: jnp.broadcast_to(c, shape))

    def __getitem__(self, idx) -> "Vec3":
        return Vec3(self.x[idx], self.y[idx], self.z[idx])

    # -- arithmetic ---------------------------------------------------------
    def _coerce(self, other):
        if isinstance(other, Vec3):
            return other
        return Vec3(other, other, other)

    def __add__(self, o):
        o = self._coerce(o)
        return Vec3(self.x + o.x, self.y + o.y, self.z + o.z)

    __radd__ = __add__

    def __sub__(self, o):
        o = self._coerce(o)
        return Vec3(self.x - o.x, self.y - o.y, self.z - o.z)

    def __rsub__(self, o):
        o = self._coerce(o)
        return Vec3(o.x - self.x, o.y - self.y, o.z - self.z)

    def __mul__(self, o):
        o = self._coerce(o)
        return Vec3(self.x * o.x, self.y * o.y, self.z * o.z)

    __rmul__ = __mul__

    def __truediv__(self, o):
        o = self._coerce(o)
        return Vec3(self.x / o.x, self.y / o.y, self.z / o.z)

    def __rtruediv__(self, o):
        o = self._coerce(o)
        return Vec3(o.x / self.x, o.y / self.y, o.z / self.z)

    def __neg__(self):
        return Vec3(-self.x, -self.y, -self.z)

    # -- geometry -----------------------------------------------------------
    def dot(self, o: "Vec3"):
        return self.x * o.x + self.y * o.y + self.z * o.z

    def cross(self, o: "Vec3") -> "Vec3":
        return Vec3(
            self.y * o.z - self.z * o.y,
            self.z * o.x - self.x * o.z,
            self.x * o.y - self.y * o.x,
        )

    def length_squared(self):
        return self.dot(self)

    def length(self):
        return jnp.sqrt(self.length_squared())

    def normalized(self, eps: float = 0.0) -> "Vec3":
        inv = jax.lax.rsqrt(self.length_squared() + eps)
        return self * inv

    # -- elementwise helpers ------------------------------------------------
    def abs(self) -> "Vec3":
        return Vec3(jnp.abs(self.x), jnp.abs(self.y), jnp.abs(self.z))

    def exp(self) -> "Vec3":
        return Vec3(jnp.exp(self.x), jnp.exp(self.y), jnp.exp(self.z))

    def log(self) -> "Vec3":
        return Vec3(jnp.log(self.x), jnp.log(self.y), jnp.log(self.z))

    def sqrt(self) -> "Vec3":
        return Vec3(jnp.sqrt(self.x), jnp.sqrt(self.y), jnp.sqrt(self.z))

    def pow(self, p) -> "Vec3":
        return Vec3(self.x**p, self.y**p, self.z**p)

    def min_component(self):
        return jnp.minimum(self.x, jnp.minimum(self.y, self.z))

    def max_component(self):
        return jnp.maximum(self.x, jnp.maximum(self.y, self.z))

    def sum(self):
        return self.x + self.y + self.z

    def luminance(self):
        """Rec.709 luminance (``path_logic.cuh:46``)."""
        return 0.2126 * self.x + 0.7152 * self.y + 0.0722 * self.z


# -- free functions mirroring the reference's vec3 API ----------------------


def vec3(x: Scalar, y: Scalar = None, z: Scalar = None) -> Vec3:
    """Convenience constructor: ``vec3(v)`` broadcasts, ``vec3(x,y,z)``."""
    if y is None:
        return Vec3.full(x)
    return Vec3(x, y, z)


def dot(a: Vec3, b: Vec3):
    return a.dot(b)


def cross(a: Vec3, b: Vec3) -> Vec3:
    return a.cross(b)


def normalize(a: Vec3, eps: float = 0.0) -> Vec3:
    return a.normalized(eps)


def lerp(a, b, t):
    """a + (b-a)*t for Vec3 or scalar operands (``vec3.cuh`` lerp)."""
    if isinstance(a, Vec3) or isinstance(b, Vec3):
        if not isinstance(a, Vec3):
            a = Vec3.full(a)
        if not isinstance(b, Vec3):
            b = Vec3.full(b)
        return a + (b - a) * t
    return a + (b - a) * t


def clamp(v, lo, hi):
    if isinstance(v, Vec3):
        return Vec3(
            jnp.clip(v.x, lo, hi), jnp.clip(v.y, lo, hi), jnp.clip(v.z, lo, hi)
        )
    return jnp.clip(v, lo, hi)


def clamp01(v):
    return clamp(v, 0.0, 1.0)


def vmin(a: Vec3, b: Vec3) -> Vec3:
    return Vec3(
        jnp.minimum(a.x, b.x), jnp.minimum(a.y, b.y), jnp.minimum(a.z, b.z)
    )


def vmax(a: Vec3, b: Vec3) -> Vec3:
    return Vec3(
        jnp.maximum(a.x, b.x), jnp.maximum(a.y, b.y), jnp.maximum(a.z, b.z)
    )


def where(cond, a, b) -> Vec3:
    """Per-lane select between two Vec3 (the vector analog of branching)."""
    if not isinstance(a, Vec3):
        a = Vec3.full(a)
    if not isinstance(b, Vec3):
        b = Vec3.full(b)
    return Vec3(
        jnp.where(cond, a.x, b.x),
        jnp.where(cond, a.y, b.y),
        jnp.where(cond, a.z, b.z),
    )


def reflect(i: Vec3, n: Vec3) -> Vec3:
    """I - 2*dot(I,N)*N (``render_utils.cuh:41-44``)."""
    return i - n * (2.0 * i.dot(n))


def refract(i: Vec3, n: Vec3, eta):
    """Snell refraction; returns (T, ok_mask) (``render_utils.cuh:46-54``)."""
    ndoti = n.dot(i)
    k = 1.0 - eta * eta * (1.0 - ndoti * ndoti)
    ok = k >= 0.0
    t = i * eta - n * (eta * ndoti + jnp.sqrt(jnp.maximum(k, 0.0)))
    return t, ok

def face_forward(n: Vec3, i: Vec3) -> Vec3:
    """Flip N to face against I (``render_utils.cuh:56-59``)."""
    return where(n.dot(i) < 0.0, n, -n)


def clamp_vector_soft(v: Vec3, max_lum) -> Vec3:
    """Luminance-preserving soft clamp (``path_logic.cuh:44-52``)."""
    lum = v.luminance()
    scale = jnp.where(
        (lum > max_lum) & (lum > 0.0), max_lum / jnp.maximum(lum, 1e-30), 1.0
    )
    return v * scale


def clamp_vector(v: Vec3, max_len) -> Vec3:
    """Euclidean-length hard clamp (``path_logic.cuh:54-61``)."""
    len_sq = v.length_squared()
    scale = jnp.where(
        len_sq > max_len * max_len,
        max_len * jax.lax.rsqrt(jnp.maximum(len_sq, 1e-30)),
        1.0,
    )
    return v * scale


PI = _math.pi
TWO_PI = 2.0 * _math.pi
INV_PI = 1.0 / _math.pi
