"""Ray batch type — SoA analog of ``common/ray.cuh``.

A ``RayBatch`` carries origins, directions and the per-ray ``spec`` flag (the
reference's ``Ray::spec``, used to suppress NEE after specular bounces,
``ray.cuh:9-34``) for a whole wavefront.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ptrt_tpu.core.vec import Vec3


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class RayBatch:
    origin: Vec3
    direction: Vec3
    spec: jnp.ndarray  # bool per lane

    def tree_flatten(self):
        return (self.origin, self.direction, self.spec), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def at(self, t) -> Vec3:
        return self.origin + self.direction * t

    @staticmethod
    def make(origin: Vec3, direction: Vec3, spec=None) -> "RayBatch":
        if spec is None:
            spec = jnp.zeros(jnp.broadcast_shapes(
                jnp.shape(direction.x), jnp.shape(origin.x)), bool)
        return RayBatch(origin, direction, spec)

    def replace(self, **kw) -> "RayBatch":
        return dataclasses.replace(self, **kw)
