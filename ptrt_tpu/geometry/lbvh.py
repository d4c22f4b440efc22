"""Device-side LBVH-style rebuild for dynamic-topology refills.

The reference rebuilds a changed BLAS on the CPU every frame
(``mesh.cuh:403-492``); SURVEY §7 step 4 calls for a Morton-sort build on
device instead.  TPU reality makes the classic Karras build unnecessary
here: every host-built 8-wide tree (geometry/bvh8.py) allocates its leaf
blocks DFS-first, so **each subtree owns a contiguous interval of
tri-table blocks**.  That turns a full rebuild into

1. a Morton-code radix sort of the new triangles (``jax.lax.sort`` — a
   native TPU sort, SURVEY §7 step 4),
2. a refill of the fixed slot structure in sorted order (spatial locality
   now matches the contiguous-interval topology, level by level), and
3. the existing device AABB refit (geometry/refit.py) bottom-up.

All three are pure jittable array ops, so a fused game frame can add,
remove (degenerate/scale-collapsed slots) or completely re-shape geometry
with ZERO host round-trips and zero recompiles (the slot count is the
static shape; triangle count varies beneath it via pad slots).

Exactness: traversal results are tree-independent (closest hit is closest
hit through any valid BVH), so renders after an ``lbvh_update`` match a
host rebuild bit-for-bit modulo closest-t ties.  Quality: the sorted
refill keeps leaf blocks spatially tight under arbitrary deformation,
where a plain refit (same slots, moved vertices) degrades into huge
overlapping AABBs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ptrt_tpu.geometry.refit import RefitPlan, refit_apply
from ptrt_tpu.geometry.scene_geom import SceneGeometry

_MBITS = 10  # 10 bits per axis -> 30-bit Morton codes


def morton_codes(cx, cy, cz, lo, hi) -> jnp.ndarray:
    """(T,) int32 Morton codes of points quantized inside [lo, hi]
    (constant shifts only — per-lane variable shifts are slow on the VPU)."""
    n = (1 << _MBITS) - 1
    span = jnp.maximum(hi - lo, 1e-12)
    q = []
    for a, c in enumerate((cx, cy, cz)):
        f = (c - lo[a]) / span[a]
        q.append(jnp.clip((f * n).astype(jnp.int32), 0, n))
    code = jnp.zeros_like(q[0])
    for b in range(_MBITS):
        code = (code
                | (((q[0] >> b) & 1) << (3 * b))
                | (((q[1] >> b) & 1) << (3 * b + 1))
                | (((q[2] >> b) & 1) << (3 * b + 2)))
    return code


def morton_order(v0: jnp.ndarray, v1: jnp.ndarray,
                 v2: jnp.ndarray) -> jnp.ndarray:
    """(T,) int32: triangle indices sorted by centroid Morton code
    (device; bounds derived from the triangles themselves)."""
    cent = (jnp.minimum(jnp.minimum(v0, v1), v2)
            + jnp.maximum(jnp.maximum(v0, v1), v2)) * 0.5
    lo = cent.min(axis=0)
    hi = cent.max(axis=0)
    codes = morton_codes(cent[:, 0], cent[:, 1], cent[:, 2], lo, hi)
    t = v0.shape[0]
    idx = jnp.arange(t, dtype=jnp.int32)
    _, order = jax.lax.sort((codes, idx), num_keys=1)
    return order


def lbvh_slot_map(plan: RefitPlan, order: jnp.ndarray) -> jnp.ndarray:
    """Device slot->triangle map that refills the plan's fixed slot/pad
    structure in Morton order: the k-th non-pad slot receives the k-th
    sorted triangle.  Pad slots stay pads, so the packed per-slot mesh ids
    and the SoA mirrors remain valid unchanged (one mesh per BLAS)."""
    st = np.asarray(plan.slot_tri)
    nonpad = st >= 0
    rank = np.maximum(np.cumsum(nonpad) - 1, 0)  # static: pads are static
    mapped = jnp.take(order, jnp.asarray(rank, dtype=jnp.int32), axis=0)
    return jnp.where(jnp.asarray(nonpad), mapped, jnp.int32(-1))


def lbvh_update(geom: SceneGeometry, plan: RefitPlan,
                v0: jnp.ndarray, v1: jnp.ndarray,
                v2: jnp.ndarray) -> SceneGeometry:
    """Full device rebuild of one BLAS: Morton sort + sorted refill +
    bottom-up AABB refit.  Same signature/contract as ``refit_apply``
    (vertices in original triangle order), plus the sort."""
    order = morton_order(v0, v1, v2)
    return refit_apply(geom, plan, v0, v1, v2,
                       slot_tri_dev=lbvh_slot_map(plan, order))
