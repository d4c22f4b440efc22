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
      the row) + float(child_base_adj, leaf_base, leaf_mask, int_mask);
      layout documented in geometry/bvh8.py.
    * ``tri_rows`` (B, LEAF_SIZE*10): per triangle [v0(3) e1(3) e2(3)
      float((mesh_id << 1) | shadow_opaque)] — a whole leaf in one
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


# Build-time pre-split of oversized triangles (SBVH-lite): any triangle
# whose longest edge exceeds PRESPLIT_FRAC x the scene's AABB diagonal is
# bisected at that edge's midpoint, recursively.  Giant triangles (ground
# planes, walls — scene.cuh's showcase floor) otherwise hang huge leaf
# AABBs across the whole tree: nearly every lock-step lane visits them
# every walk, inflating the worst-lane iteration count the walk pays for.
# The split is EXACT (coplanar children cover the same surface; the
# watertight barycentric epsilon in traverse._mt_test covers the collinear
# sub-edge seams exactly like quad diagonals).  Only the packed device
# tables see the split — Mesh objects, mesh ids, materials and reported
# triangle counts are untouched.  Wireframe debug renders show the extra
# edges (hit.u/v are the only barycentric consumers).  0 disables.
import os as _os

PRESPLIT_FRAC = float(_os.environ.get("PTRT_PRESPLIT_FRAC", "0.125"))


def _presplit_tris(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
                   mid: np.ndarray, frac: float):
    """Longest-edge bisection until every triangle's longest edge is below
    frac * scene_diagonal.  Returns (v0, v1, v2, mid)."""
    if frac <= 0.0 or v0.shape[0] == 0:
        return v0, v1, v2, mid
    allv = np.concatenate([v0, v1, v2])
    diag = float(np.linalg.norm(allv.max(0) - allv.min(0)))
    if not np.isfinite(diag) or diag <= 0.0:
        return v0, v1, v2, mid
    # split only OUTLIERS: triangles big vs the scene (frac * diagonal)
    # that are also big vs the typical triangle (16x the median longest
    # edge) — a lone finely-tessellated object must not re-split itself
    # (uniform meshes keep their build-time refitability, and tri counts
    # stay honest)
    e0 = np.stack([((v1 - v0) ** 2).sum(1), ((v2 - v1) ** 2).sum(1),
                   ((v0 - v2) ** 2).sum(1)], axis=1).max(1)
    med = float(np.sqrt(np.median(e0)))
    thr2 = max(frac * diag, 16.0 * med) ** 2
    # each round halves the longest edge of every oversized triangle, so
    # the loop terminates in O(log(max_edge / thr)) rounds
    for _ in range(32):
        e = np.stack([  # squared edge lengths (ab, bc, ca)
            ((v1 - v0) ** 2).sum(1),
            ((v2 - v1) ** 2).sum(1),
            ((v0 - v2) ** 2).sum(1)], axis=1)
        k = e.argmax(1)
        big = e[np.arange(e.shape[0]), k] > thr2
        if not big.any():
            break
        bs = np.where(big)[0]
        a, b, c, m_, kb = v0[bs], v1[bs], v2[bs], mid[bs], k[bs]
        # rotate so the longest edge is (a, b) — winding preserved
        a2 = np.where((kb == 1)[:, None], b, np.where((kb == 2)[:, None], c, a))
        b2 = np.where((kb == 1)[:, None], c, np.where((kb == 2)[:, None], a, b))
        c2 = np.where((kb == 1)[:, None], a, np.where((kb == 2)[:, None], b, c))
        mp = 0.5 * (a2 + b2)
        keep = ~big
        v0 = np.concatenate([v0[keep], a2, mp])
        v1 = np.concatenate([v1[keep], mp, b2])
        v2 = np.concatenate([v2[keep], c2, c2])
        mid = np.concatenate([mid[keep], m_, m_])
    return (np.ascontiguousarray(v0, np.float32),
            np.ascontiguousarray(v1, np.float32),
            np.ascontiguousarray(v2, np.float32),
            np.ascontiguousarray(mid, np.int32))


def assemble_geometry(meshes: list[Mesh],
                      material_transmission: list[float] | None = None,
                      leaf_size: int = LEAF_SIZE,
                      mesh_ids: list[int] | None = None,
                      world: bool = True,
                      presplit: bool | None = None) -> SceneGeometry:
    """Build packed geometry + BVH from host meshes.

    ``material_transmission[i]`` is the transmission of mesh ``i``'s
    material INDEXED BY EMITTED ID (see ``mesh_ids``); occluders with
    transmission > 0.5 are skipped by shadow rays, matching
    ``intersection.cuh:481-524``.

    ``mesh_ids`` overrides the per-mesh object/material id baked into the
    triangle lanes (defaults to enumeration order) — the two-level assembly
    uses it to keep GLOBAL mesh indices inside per-instance BLASes.
    ``world=False`` keeps vertices in mesh-local space (instance BLAS).

    ``presplit`` (default: follow ``world``) bisects oversized triangles
    before the BVH build (see ``_presplit_tris``).  Instance BLASes keep it
    OFF: their refit plans (geometry/refit.py) map leaf slots back to the
    mesh's ORIGINAL triangle order, which a split would break.
    """
    if presplit is None:
        presplit = world
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

    n_orig = v0.shape[0]
    if presplit:
        v0, v1, v2, mid = _presplit_tris(v0, v1, v2, mid, PRESPLIT_FRAC)

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
    # opacity bit share one float-encoded int ((id << 1) | opaque; id -1 =
    # pad) so the row stays at 10 fields — the gathered bytes per iteration
    # are the traversal's dominant cost.  The int is stored as an exact
    # small-float VALUE, not a bit pattern (TPU fusions flush denormal f32
    # loads of argument tables to zero — see bvh8.pack_node_rows).
    n_blocks = max(1, pmid.shape[0] // leaf_size)
    packed_id = ((pmid.astype(np.int32) << 1)
                 | opaque.astype(np.int32)).astype(np.float32)
    fields = [pv0[:, 0], pv0[:, 1], pv0[:, 2],
              e1[:, 0], e1[:, 1], e1[:, 2],
              e2[:, 0], e2[:, 1], e2[:, 2],
              packed_id]
    tri_rows = np.concatenate(
        [np.asarray(f, np.float32).reshape(n_blocks, leaf_size)
         for f in fields], axis=1)

    out = SceneGeometry(
        node_rows=jnp.asarray(node_rows),
        tri_rows=jnp.asarray(tri_rows),
        v0=dvec(pv0),
        e1=dvec(e1),
        e2=dvec(e2),
        tri_mesh_id=jnp.asarray(pmid.astype(np.int32)),
        tri_shadow_opaque=jnp.asarray(opaque),
        stack_depth=int(bvh.max_depth) + 2,
    )
    # build-time leaf order, host-side only (device refit plans need the
    # original-tri -> leaf-slot mapping; geometry/refit.py).  A presplit
    # geometry has no such mapping — leave it unset so build_refit_plan
    # fails loudly instead of refitting garbage.
    if v0.shape[0] == n_orig:
        object.__setattr__(out, "_host_order", np.asarray(bvh.order))
    return out


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
class InstanceSet:
    """All dynamic instances merged for ONE batched walk.

    The reference's TLAS walk is one tree regardless of instance count
    (``intersection.cuh:526-605``); the round-2 per-instance unrolled loop
    made program size and runtime linear in instances.  Here every
    instance BLAS is concatenated into one node/tri table pair (child_base
    / leaf_base columns offset-patched at merge time), so traversal is a
    single walk whose lanes carry ``(ray, instance)`` work items — flat in
    instance count.

    ``geom``: the merged tables as a normal SceneGeometry (roots are NOT
    at row 0; per-item roots come from ``roots``).
    ``mats`` (I, 24): rows 0:12 world->local affine (3x4), 12:21 local->
    world normal matrix (3x3), rest pad.
    ``bb_min``/``bb_max`` (I, 3): world AABBs (the TLAS leaves).
    """

    geom: SceneGeometry
    roots: jnp.ndarray  # (I,) int32 node-row index of each instance root
    mats: jnp.ndarray  # (I, 24) f32
    bb_min: jnp.ndarray  # (I, 3) f32
    bb_max: jnp.ndarray  # (I, 3) f32

    def tree_flatten(self):
        return ((self.geom, self.roots, self.mats, self.bb_min,
                 self.bb_max), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def count(self) -> int:
        return int(self.roots.shape[0])


def _patch_offsets(node_rows: np.ndarray, node_off: int,
                   blk_off: int) -> np.ndarray:
    """Add table offsets to the float-encoded child_base/leaf_base columns
    of a node-row block (cols 48/49, layout in geometry/bvh8.py); exact
    while the offset totals stay < 2^24."""
    out = node_rows.copy()
    out[:, 48] += np.float32(node_off)
    out[:, 49] += np.float32(blk_off)
    return out


def merge_instances(instances: tuple) -> InstanceSet | None:
    """Concatenate per-instance BLAS tables into one batched set.  Pure
    host work, done once per instance-set change; transform-only edits go
    through ``update_instance_set_transforms`` (no re-concat)."""
    if not instances:
        return None
    node_rows, tri_rows = [], []
    roots = []
    vx, vy, vz = [], [], []
    e1x, e1y, e1z, e2x, e2y, e2z = [], [], [], [], [], []
    mid, opq = [], []
    node_off = blk_off = slot_off = 0
    depth = 2
    for inst in instances:
        g = inst.geom
        roots.append(node_off)
        node_rows.append(_patch_offsets(np.asarray(g.node_rows), node_off,
                                        blk_off))
        tri_rows.append(np.asarray(g.tri_rows))
        vx.append(np.asarray(g.v0.x)); vy.append(np.asarray(g.v0.y))
        vz.append(np.asarray(g.v0.z))
        e1x.append(np.asarray(g.e1.x)); e1y.append(np.asarray(g.e1.y))
        e1z.append(np.asarray(g.e1.z))
        e2x.append(np.asarray(g.e2.x)); e2y.append(np.asarray(g.e2.y))
        e2z.append(np.asarray(g.e2.z))
        mid.append(np.asarray(g.tri_mesh_id))
        opq.append(np.asarray(g.tri_shadow_opaque))
        node_off += g.num_nodes
        blk_off += g.num_tri_blocks
        slot_off += g.num_tri_slots
        depth = max(depth, g.stack_depth)
    geom = SceneGeometry(
        node_rows=jnp.asarray(np.concatenate(node_rows)),
        tri_rows=jnp.asarray(np.concatenate(tri_rows)),
        v0=Vec3(*[jnp.asarray(np.concatenate(a)) for a in (vx, vy, vz)]),
        e1=Vec3(*[jnp.asarray(np.concatenate(a)) for a in (e1x, e1y, e1z)]),
        e2=Vec3(*[jnp.asarray(np.concatenate(a)) for a in (e2x, e2y, e2z)]),
        tri_mesh_id=jnp.asarray(np.concatenate(mid)),
        tri_shadow_opaque=jnp.asarray(np.concatenate(opq)),
        stack_depth=depth,
    )
    mats, bmin, bmax = _instance_transform_tables(instances)
    return InstanceSet(geom=geom, roots=jnp.asarray(np.asarray(roots,
                                                               np.int32)),
                       mats=mats, bb_min=bmin, bb_max=bmax)


def _instance_transform_tables(instances: tuple):
    I = len(instances)
    mats = np.zeros((I, 24), np.float32)
    bmin = np.zeros((I, 3), np.float32)
    bmax = np.zeros((I, 3), np.float32)
    for i, inst in enumerate(instances):
        mats[i, 0:12] = np.asarray(inst.inv_rows, np.float32).reshape(12)
        mats[i, 12:21] = np.asarray(inst.nrm_rows, np.float32).reshape(9)
        bmin[i] = np.asarray(inst.bb_min, np.float32)
        bmax[i] = np.asarray(inst.bb_max, np.float32)
    return jnp.asarray(mats), jnp.asarray(bmin), jnp.asarray(bmax)


def update_instance_set_transforms(iset: InstanceSet,
                                   instances: tuple) -> InstanceSet:
    """Matrix/AABB-only refresh — merged BLAS tables untouched (the
    TLAS-update analog, ``scene.cuh:655-692``)."""
    mats, bmin, bmax = _instance_transform_tables(instances)
    return InstanceSet(geom=iset.geom, roots=iset.roots, mats=mats,
                       bb_min=bmin, bb_max=bmax)


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class WorldGeometry:
    """Static world BLAS + batched dynamic instances; traversal dispatches
    on it.  ``instances`` (per-instance BLAS + transform rows) is kept for
    host-side caching and the brute-force path; the BVH path walks the
    merged ``iset``."""

    static: SceneGeometry
    instances: tuple
    iset: InstanceSet | None = None

    def tree_flatten(self):
        return ((self.static, self.instances, self.iset), None)

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
    return WorldGeometry(static=sg, instances=instances,
                         iset=merge_instances(instances))
