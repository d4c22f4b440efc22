"""Device scene geometry: packed world-space triangle SoA + flat BVH.

This is the TPU analog of the reference's uploaded BVH + TLAS
(``scene.cuh:458-594`` buildAndUploadTLAS, ``mesh.cuh:499-516`` uploadBVH).
Instead of a two-level TLAS->BLAS stack walk per CUDA thread
(``intersection.cuh:526-605``), all meshes' triangles are transformed to
world space on host (cheap — and on device it's one batched matmul when
dynamic), concatenated, and covered by ONE flat skip-pointer BVH.  Instance
identity survives as a per-triangle ``mesh_id`` lane used for materials and
G-buffer object ids.

Triangles are stored Möller–Trumbore-ready: v0 + edges e1, e2
(``common/triangle.cuh:9-91`` precomputed-edge layout), SoA per component.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ptrt_tpu.core.vec import Vec3
from ptrt_tpu.geometry.bvh import LEAF_SIZE, reorder_padded
from ptrt_tpu.geometry.bvh8 import build_bvh8, pack_node_rows
from ptrt_tpu.geometry.mesh import Mesh


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class SceneGeometry:
    """Device buffers for one assembled scene.

    Two packed-row tables drive traversal — TPU gathers cost per-index (a
    ~64-float row costs about the same as 1 float), so each traversal
    iteration fetches exactly one 8-wide node row and one triangle-block row:

    * ``node_rows`` (N, 64): 8-wide BVH node — eight child AABBs (SoA within
      the row) + bitcast(child_base_adj, leaf_base, leaf_mask, int_mask);
      layout documented in geometry/bvh8.py.
    * ``tri_rows`` (B, LEAF_SIZE*10): per triangle [v0(3) e1(3) e2(3)
      bitcast((mesh_id << 1) | shadow_opaque)] — a whole leaf in one
      gather, 80 floats instead of 96 (gathered bytes per iteration are
      the traversal's dominant cost).

    The SoA component views (v0/e1/e2/...) are kept for the gather-free
    brute-force path and for debug.
    """

    # packed traversal tables
    node_rows: jnp.ndarray  # (N, 64) f32
    tri_rows: jnp.ndarray  # (B, LEAF_SIZE*10) f32
    # triangles, leaf-block order, padded (length M) — brute-force path
    v0: Vec3
    e1: Vec3
    e2: Vec3
    tri_mesh_id: jnp.ndarray  # int32, -1 for padding
    tri_shadow_opaque: jnp.ndarray  # bool: occludes shadow rays
    # static: wide-tree depth bound (traversal mask-stack size)
    stack_depth: int = 16

    def tree_flatten(self):
        children = tuple(
            getattr(self, f.name) for f in dataclasses.fields(self)
            if f.name != "stack_depth")
        return children, self.stack_depth

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, stack_depth=aux)

    @property
    def num_nodes(self) -> int:
        return int(self.node_rows.shape[0])

    @property
    def num_tri_blocks(self) -> int:
        return int(self.tri_rows.shape[0])

    @property
    def num_tri_slots(self) -> int:
        return int(self.tri_mesh_id.shape[0])


def assemble_geometry(meshes: list[Mesh],
                      material_transmission: list[float] | None = None,
                      leaf_size: int = LEAF_SIZE,
                      mesh_ids: list[int] | None = None,
                      world: bool = True) -> SceneGeometry:
    """Build packed geometry + BVH from host meshes.

    ``material_transmission[i]`` is the transmission of mesh ``i``'s
    material INDEXED BY EMITTED ID (see ``mesh_ids``); occluders with
    transmission > 0.5 are skipped by shadow rays, matching
    ``intersection.cuh:481-524``.

    ``mesh_ids`` overrides the per-mesh object/material id baked into the
    triangle lanes (defaults to enumeration order) — the two-level assembly
    uses it to keep GLOBAL mesh indices inside per-instance BLASes.
    ``world=False`` keeps vertices in mesh-local space (instance BLAS).
    """
    v0s, v1s, v2s, mids = [], [], [], []
    for i, m in enumerate(meshes):
        a, b, c = m.triangle_arrays(world=world)
        v0s.append(a)
        v1s.append(b)
        v2s.append(c)
        gid = i if mesh_ids is None else mesh_ids[i]
        mids.append(np.full(a.shape[0], gid, np.int32))
    if v0s:
        v0 = np.concatenate(v0s)
        v1 = np.concatenate(v1s)
        v2 = np.concatenate(v2s)
        mid = np.concatenate(mids)
    else:
        v0 = v1 = v2 = np.zeros((0, 3), np.float32)
        mid = np.zeros((0,), np.int32)

    bvh = build_bvh8(v0, v1, v2, leaf_size)

    pv0 = reorder_padded(v0, bvh.order)
    pv1 = reorder_padded(v1, bvh.order)
    pv2 = reorder_padded(v2, bvh.order)
    pmid = reorder_padded(mid, bvh.order, fill=-1)

    if material_transmission is None or len(material_transmission) == 0:
        opaque = pmid >= 0
    else:
        trans = np.asarray(material_transmission, np.float32)
        opaque = np.where(
            pmid >= 0, trans[np.maximum(pmid, 0)] <= 0.5, False
        )

    e1 = pv1 - pv0
    e2 = pv2 - pv0

    def dvec(a: np.ndarray) -> Vec3:
        return Vec3(jnp.asarray(a[:, 0]), jnp.asarray(a[:, 1]),
                    jnp.asarray(a[:, 2]))

    # -- packed 8-wide node rows (N, 64) ------------------------------------
    # All eight child AABBs ride one gathered row and are tested at the
    # PARENT, so missed children are never visited and tree depth (hence
    # lock-step iteration count, the dominant cost) drops ~3x vs binary.
    node_rows = pack_node_rows(bvh)

    # -- packed triangle-block rows (B, 10*leaf_size), SoA WITHIN the row ---
    # Field-major layout [v0x*L v0y*L v0z*L e1x*L ... packed_id*L]: the
    # traversal reshapes a gathered row to (R, 10, L) and slices whole
    # fields along the middle (major) axis — contiguous (R, L) views that
    # vectorize the Möller–Trumbore test across the block.  Interleaved
    # per-triangle layout would need L*10 single-column extracts, each a
    # cross-lane relayout (~22x slower, measured).  mesh_id and the shadow
    # opacity bit share one bitcast i32 ((id << 1) | opaque; id -1 = pad)
    # so the row stays at 10 fields — the gathered bytes per iteration are
    # the traversal's dominant cost.
    n_blocks = max(1, pmid.shape[0] // leaf_size)
    packed_id = ((pmid.astype(np.int32) << 1)
                 | opaque.astype(np.int32)).view(np.float32)
    fields = [pv0[:, 0], pv0[:, 1], pv0[:, 2],
              e1[:, 0], e1[:, 1], e1[:, 2],
              e2[:, 0], e2[:, 1], e2[:, 2],
              packed_id]
    tri_rows = np.concatenate(
        [np.asarray(f, np.float32).reshape(n_blocks, leaf_size)
         for f in fields], axis=1)

    return SceneGeometry(
        node_rows=jnp.asarray(node_rows),
        tri_rows=jnp.asarray(tri_rows),
        v0=dvec(pv0),
        e1=dvec(e1),
        e2=dvec(e2),
        tri_mesh_id=jnp.asarray(pmid.astype(np.int32)),
        tri_shadow_opaque=jnp.asarray(opaque),
        stack_depth=int(bvh.max_depth) + 2,
    )


# -- two-level world: static BLAS + dynamic instances ------------------------
#
# TPU-native analog of the reference's TLAS->BLAS structure
# (``intersection.cuh:526-605`` TLAS walk, ``:438-479`` instance transform,
# ``scene.cuh:596-743`` dirty-driven incremental updates).  Static meshes are
# baked into ONE world-space BLAS (fastest traversal: no per-lane matrix
# work).  Each dynamic mesh keeps a LOCAL-space BLAS plus its world/inverse/
# normal matrices: a transform edit swaps three small arrays (no rebuild
# anywhere); a vertex refill (Triangles-type, e.g. the fluid surface)
# rebuilds only that mesh's BLAS.  The "TLAS" is the per-instance world AABB
# list — instance counts are tiny (tens), so the instance test is a
# broadcast slab test, not a tree.


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class Instance:
    """One dynamic mesh: local BLAS + transform rows + world AABB."""

    geom: SceneGeometry
    inv_rows: jnp.ndarray  # (3, 4) world->local affine (rotation | trans)
    nrm_rows: jnp.ndarray  # (3, 3) local->world normal matrix (inv-transpose)
    bb_min: jnp.ndarray  # (3,) world AABB
    bb_max: jnp.ndarray  # (3,)

    def tree_flatten(self):
        return ((self.geom, self.inv_rows, self.nrm_rows, self.bb_min,
                 self.bb_max), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class WorldGeometry:
    """Static world BLAS + dynamic instances; traversal dispatches on it."""

    static: SceneGeometry
    instances: tuple

    def tree_flatten(self):
        return ((self.static, self.instances), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def instance_transform_rows(mesh: Mesh):
    """(inv_rows, nrm_rows, bb_min, bb_max) for a mesh's current transform —
    the only thing a transform edit has to recompute (TLAS-update analog,
    ``scene.cuh:655-692``)."""
    inv = np.asarray(mesh.transform.inverse_matrix(), np.float32)[:3, :4]
    nrm = np.asarray(mesh.transform.normal_matrix(), np.float32)[:3, :3]
    bb = mesh.world_aabb()
    return (jnp.asarray(inv), jnp.asarray(nrm),
            jnp.asarray(np.asarray(bb.lo, np.float32)),
            jnp.asarray(np.asarray(bb.hi, np.float32)))


def assemble_instance(mesh: Mesh, global_id: int,
                      material_transmission: list[float] | None = None,
                      leaf_size: int = LEAF_SIZE) -> Instance:
    """Local-space BLAS for one dynamic mesh (global mesh id baked in)."""
    geom = assemble_geometry([mesh], material_transmission, leaf_size,
                             mesh_ids=[global_id], world=False)
    inv, nrm, bb_min, bb_max = instance_transform_rows(mesh)
    return Instance(geom=geom, inv_rows=inv, nrm_rows=nrm,
                    bb_min=bb_min, bb_max=bb_max)


def update_instance_transform(inst: Instance, mesh: Mesh) -> Instance:
    """Matrix-only instance update — BLAS untouched."""
    inv, nrm, bb_min, bb_max = instance_transform_rows(mesh)
    return Instance(geom=inst.geom, inv_rows=inv, nrm_rows=nrm,
                    bb_min=bb_min, bb_max=bb_max)


def assemble_world(meshes: list[Mesh],
                   material_transmission: list[float] | None = None,
                   leaf_size: int = LEAF_SIZE) -> WorldGeometry:
    """Full two-level assembly (static bake + one BLAS per dynamic mesh)."""
    static, static_ids = [], []
    for i, m in enumerate(meshes):
        if not m.is_dynamic:
            static.append(m)
            static_ids.append(i)
    sg = assemble_geometry(static, material_transmission, leaf_size,
                           mesh_ids=static_ids)
    instances = tuple(
        assemble_instance(m, i, material_transmission, leaf_size)
        for i, m in enumerate(meshes) if m.is_dynamic)
    return WorldGeometry(static=sg, instances=instances)
