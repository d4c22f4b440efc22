"""Lock-step 8-wide BVH traversal + Möller–Trumbore over ray wavefronts.

TPU-native replacement for the reference's per-thread stack walks
(``intersection.cuh:300-435`` BLAS, ``:526-605`` TLAS, ``:481-524`` any-hit).

Measured TPU reality (TODO.md perf model) shapes the design: traversal cost
is per-iteration GATHER cost (~3.3 ns/lane/gather), and a ~64-float row
gathers about as cheaply as a 16-float one — so the wins come from FEWER
iterations, not narrower rows.  Hence:

* **8-wide nodes** (geometry/bvh8.py): one gathered row carries all eight
  child AABBs; the parent tests them together and missed children are never
  visited.  Tree depth (and worst-lane iteration count) drops ~3x vs binary.
* **Mask-stack**: per lane, the pending work is a pair of packed int32
  entries ``(base << 8) | bitmask`` — one for leaf children (tri-table
  rows ``base+slot``), one for internal children (node ids ``base+slot``).
  A tiny per-lane stack of such entries lives in a (R, D) array; push/pop
  are elementwise ``where(iota == sp)`` ops, NOT scatters.
* **Dual action per iteration**: each iteration pops if idle, tests ONE
  pending leaf block (gather 1) and descends ONE pending internal child
  (gather 2) — so a lane's iteration count is ~max(leaf visits, node
  visits), not their sum, and both gathers are useful work.
* **Two-pass compaction**: the lock-step while pays the slowest lane
  (heavy-tailed), so pass 1 caps iterations over the full wavefront and the
  unfinished tail is compacted into a 1/8-size buffer and run to completion
  (exact, just reordered).

A gather-free brute-force path (tiled over triangle chunks) is provided for
small scenes, where dense elementwise work beats any gather.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ptrt_tpu.core.vec import Vec3, cross, where
from ptrt_tpu.geometry.bvh import LEAF_SIZE
from ptrt_tpu.geometry.scene_geom import SceneGeometry

T_MIN = 1e-4  # reference ray epsilon (intersection.cuh uses 1e-4 offsets)
T_MAX = 1e30
_MT_EPS = 1e-9


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class Hit:
    """SoA ``HitInfo`` (``intersection.cuh:108-132``)."""

    hit: jnp.ndarray  # bool
    t: jnp.ndarray
    point: Vec3
    normal: Vec3  # face-forwarded geometric normal
    front_face: jnp.ndarray  # bool
    mesh_index: jnp.ndarray  # int32 (object/material id)
    u: jnp.ndarray
    v: jnp.ndarray

    def tree_flatten(self):
        return tuple(getattr(self, f.name) for f in dataclasses.fields(self)), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _mt_test(v0: Vec3, e1: Vec3, e2: Vec3, o: Vec3, d: Vec3, t_min, t_max):
    """Möller–Trumbore with precomputed edges (``triangle.cuh:59-90``,
    ``intersection.cuh:219-255``); two-sided (no backface cull, the path
    tracer shades interiors)."""
    h = cross(d, e2)
    a = e1.dot(h)
    valid = jnp.abs(a) > _MT_EPS
    f = 1.0 / jnp.where(valid, a, 1.0)
    s = o - v0
    u = f * s.dot(h)
    q = cross(s, e1)
    v = f * d.dot(q)
    t = f * e2.dot(q)
    # small inclusive barycentric epsilon: adjacent triangles overlap by a
    # hair instead of leaving edge gaps (the reference's exclusive bounds
    # produce dotted cracks along quad diagonals; closest-t resolves the
    # overlap, so this stays exact in practice)
    beps = 1e-6
    ok = (
        valid
        & (u >= -beps)
        & (u <= 1.0 + beps)
        & (v >= -beps)
        & (u + v <= 1.0 + beps)
        & (t > t_min)
        & (t < t_max)
    )
    return ok, t, u, v


def _safe_inv(d: Vec3) -> Vec3:
    """Signed-epsilon inverse direction (``RayOptimized``,
    ``intersection.cuh:39-88``)."""
    tiny = 1e-12

    def inv(c):
        s = jnp.where(c >= 0.0, 1.0, -1.0)
        return 1.0 / (c + s * tiny)

    return Vec3(inv(d.x), inv(d.y), inv(d.z))


def _i32(col: jnp.ndarray) -> jnp.ndarray:
    """Decode a float-encoded table int (exact small-float VALUE < 2^24,
    see bvh8.pack_node_rows — bitcast bit patterns are denormal floats
    that TPU fusions flush to zero when the table is a jit argument)."""
    return col.astype(jnp.int32)


_BITS8 = tuple(1 << k for k in range(8))


def _fetch_node8(geom: SceneGeometry, nidx, octant=None):
    """8-wide node row (geometry/bvh8.py layout): slot AABBs (SoA inside the
    row) + child_base_adj / leaf_base / leaf_mask / int_mask. One gather.
    With ``octant`` (per-lane i32 in [0,8)), also returns the packed
    near-first child visit order for that octant (cols 52:60)."""
    row = jnp.take(geom.node_rows, nidx, axis=0)  # (R, 64)
    bmin8 = (row[..., 0:8], row[..., 8:16], row[..., 16:24])
    bmax8 = (row[..., 24:32], row[..., 32:40], row[..., 40:48])
    cba = _i32(row[..., 48])
    lb = _i32(row[..., 49])
    lmask = _i32(row[..., 50])
    imask = _i32(row[..., 51])
    if octant is None:
        return bmin8, bmax8, cba, lb, lmask, imask, None
    # per-lane octant column select: 8-way where-chain (constant indices;
    # take_along_axis and per-lane variable shifts are slow on the VPU)
    ordcols = _i32(row[..., 52:60])
    ordpack = jnp.zeros_like(nidx)
    for o in range(8):
        ordpack = jnp.where(octant == o, ordcols[..., o], ordpack)
    return bmin8, bmax8, cba, lb, lmask, imask, ordpack


def _fetch_node8_cm(geom: SceneGeometry, nidx, octant=None):
    """Column-major variant of ``_fetch_node8`` (see NODE_CM): one gathered
    row, transposed once; AABB fields as (8, R) views."""
    row = jnp.take(geom.node_rows, nidx, axis=0).T  # (64, R)
    bmin8 = (row[0:8], row[8:16], row[16:24])
    bmax8 = (row[24:32], row[32:40], row[40:48])
    cba = _i32(row[48])
    lb = _i32(row[49])
    lmask = _i32(row[50])
    imask = _i32(row[51])
    if octant is None:
        return bmin8, bmax8, cba, lb, lmask, imask, None
    ordcols = _i32(row[52:60])
    ordpack = jnp.zeros_like(nidx)
    for o in range(8):
        ordpack = jnp.where(octant == o, ordcols[o], ordpack)
    return bmin8, bmax8, cba, lb, lmask, imask, ordpack


def _slab8_cm(bmin8, bmax8, o: Vec3, inv_d: Vec3, t_max):
    """(8, R)-oriented slab test (NODE_CM); rays broadcast on axis 0."""
    oc = (o.x[None, :], o.y[None, :], o.z[None, :])
    ic = (inv_d.x[None, :], inv_d.y[None, :], inv_d.z[None, :])
    shape = jnp.broadcast_shapes(bmin8[0].shape, oc[0].shape)
    t_enter = jnp.zeros(shape, bmin8[0].dtype)
    t_exit = jnp.broadcast_to(t_max[None, :], shape)
    for a in range(3):
        t0 = (bmin8[a] - oc[a]) * ic[a]
        t1 = (bmax8[a] - oc[a]) * ic[a]
        t_enter = jnp.maximum(t_enter, jnp.minimum(t0, t1))
        t_exit = jnp.minimum(t_exit, jnp.maximum(t0, t1))
    return t_enter <= t_exit


def _hitmask8_cm(hits8) -> jnp.ndarray:
    """(8, R) bool -> int32 bitmask per lane."""
    m = jnp.zeros(hits8.shape[1:], jnp.int32)
    for k, b in enumerate(_BITS8):
        m = m | jnp.where(hits8[k], jnp.int32(b), 0)
    return m


_IDENTITY_ORD = sum(k << (3 * k) for k in range(8))  # slot k at rank k


def _ray_octant(d: Vec3) -> jnp.ndarray:
    """Octant index: bit a set when d[a] < 0 (matches bvh8.pack_node_rows)."""
    return ((d.x < 0.0).astype(jnp.int32)
            | ((d.y < 0.0).astype(jnp.int32) << 1)
            | ((d.z < 0.0).astype(jnp.int32) << 2))


def _rank_to_slot(rank: jnp.ndarray, ordpack: jnp.ndarray) -> jnp.ndarray:
    """Slot id at visit rank ``rank`` — 8-way select, constant shifts only."""
    slot = jnp.zeros_like(rank)
    for k in range(8):
        slot = jnp.where(rank == k, (ordpack >> (3 * k)) & 7, slot)
    return slot


def _slotmask_to_rankmask(m: jnp.ndarray, ordpack: jnp.ndarray) -> jnp.ndarray:
    """Permute a slot-space bitmask into rank (visit-order) space: output
    bit k set iff slot ``ord[k]`` is set in ``m``.  The internal-child mask
    lives in rank space so the ordered walk visits via cheap LSB pops; all
    shifts here are constant (per-lane variable shifts are slow)."""
    out = jnp.zeros_like(m)
    for k in range(8):
        slot_k = (ordpack >> (3 * k)) & 7
        bit = jnp.zeros_like(m)
        for j in range(8):
            bit = jnp.where(slot_k == j, (m >> j) & 1, bit)
        out = out | (bit << k)
    return out


def _slab8(bmin8, bmax8, o: Vec3, inv_d: Vec3, t_max):
    """Slab test of all 8 child AABBs of a node row; (R, 8) bool.
    Empty slots carry inverted boxes and can never pass."""
    oc = (o.x[..., None], o.y[..., None], o.z[..., None])
    ic = (inv_d.x[..., None], inv_d.y[..., None], inv_d.z[..., None])
    shape = jnp.broadcast_shapes(bmin8[0].shape, oc[0].shape)
    t_enter = jnp.zeros(shape, bmin8[0].dtype)
    t_exit = jnp.broadcast_to(t_max[..., None], shape)
    for a in range(3):
        t0 = (bmin8[a] - oc[a]) * ic[a]
        t1 = (bmax8[a] - oc[a]) * ic[a]
        t_enter = jnp.maximum(t_enter, jnp.minimum(t0, t1))
        t_exit = jnp.minimum(t_exit, jnp.maximum(t0, t1))
    return t_enter <= t_exit


def _hitmask8(hits8) -> jnp.ndarray:
    """(R, 8) bool -> int32 bitmask."""
    m = jnp.zeros(hits8.shape[:-1], jnp.int32)
    for k, b in enumerate(_BITS8):
        m = m | jnp.where(hits8[..., k], jnp.int32(b), 0)
    return m


def _lsb_slot(mask: jnp.ndarray) -> jnp.ndarray:
    """Bit position of the lowest set bit (undefined-but-bounded for 0)."""
    lsb = mask & -mask
    return jax.lax.population_count(lsb - 1)


def _fetch_leaf_cm(geom: SceneGeometry, leaf_block):
    """Column-major variant of ``_fetch_leaf``: one gathered row block,
    transposed once, fields as (L, R) views.  Same packed values."""
    blk = jnp.take(geom.tri_rows, jnp.maximum(leaf_block, 0), axis=0).T
    L = LEAF_SIZE
    c = lambda k: blk[k * L:(k + 1) * L]
    v0 = Vec3(c(0), c(1), c(2))
    e1 = Vec3(c(3), c(4), c(5))
    e2 = Vec3(c(6), c(7), c(8))
    packed = _i32(c(9))
    mesh_id = packed >> 1
    opaque = (packed & 1) == 1
    return v0, e1, e2, mesh_id, opaque


def _fetch_leaf(geom: SceneGeometry, leaf_block):
    """One gathered tri-block row -> SoA (R, L) field views (field-major
    row layout, see scene_geom.assemble_geometry).  Fields are cut with
    DIRECT 2D column slices of the (R, 10L) row — exactly like the node
    row's slices — NOT via a (R, 10, L) reshape + middle-axis slice: the
    3D reshape forces a Mosaic relayout of every field and measured 3x the
    node path's cost at 2.2M lanes (tools/prof_r3.py part D).
    Field 9 packs ((mesh_id << 1) | shadow_opaque)."""
    blk = jnp.take(geom.tri_rows, jnp.maximum(leaf_block, 0), axis=0)
    L = LEAF_SIZE
    c = lambda k: blk[..., k * L:(k + 1) * L]
    v0 = Vec3(c(0), c(1), c(2))
    e1 = Vec3(c(3), c(4), c(5))
    e2 = Vec3(c(6), c(7), c(8))
    packed = _i32(c(9))
    mesh_id = packed >> 1  # arithmetic shift keeps pad ids negative
    opaque = (packed & 1) == 1
    return v0, e1, e2, mesh_id, opaque


# -- BVH path ---------------------------------------------------------------

# Compacted traversal: the lock-step while pays the SLOWEST lane (measured:
# heavy-tailed node-visit counts), so each pass runs the full buffer only
# until the unfinished lanes fit a buffer 1/COMPACT_SHRINK the size (with at
# least PASS_MIN_ITERS iterations), then compacts them there and repeats —
# gather cost is per-index, so tail lanes cost SHRINK-times less per
# iteration.  COMPACT_STAGES bounds the recursion; the last stage runs to
# completion, so results are EXACT (just reordered).  Batches below
# MIN_COMPACT_LANES skip the machinery.
from ptrt_tpu.geometry.bvh import _env_int

# Leaf MT layout experiment: 0 = row-major (R, L) block fields (minor dim
# L=8 -> Mosaic pads each 8-wide vector op to the 128-lane tile, wasting
# 15/16 of the VPU); 1 = transpose the gathered (R, 10L) row once and run
# the MT block in (L, R) orientation (L rides the 8 sublanes exactly, R
# rides the lanes -> full-width VPU).  tools/prof_r3.py part O measures
# the microbench; flip the default once confirmed in-situ on TPU.
MT_CM = _env_int("PTRT_MT_CM", 0, 0, 1)
# Stack layout experiment: 0 = (R, D) stacks (minor dim D=16 -> two
# 8x128 tiles per row-group with 112 dead lanes each); 1 = (D, R) stacks
# (D on sublanes, rays on lanes -> fully packed tiles).  Applies to the
# PER-RAY walk only (packet walks keep their own row-major stacks).
STACK_CM = _env_int("PTRT_STACK_CM", 0, 0, 1)
# Node-path layout experiment: transpose the gathered (R, 64) node row and
# slab-test in (8, R) orientation (same rationale as MT_CM/STACK_CM).
NODE_CM = _env_int("PTRT_NODE_CM", 0, 0, 1)
# Leaf-action schedule: with N, each while step runs N sub-iterations —
# N-1 node-only, then one full — so the leaf gather+MT block (3/4 of the
# body, part D) is paid every Nth iteration.  Leaf occupancy on scattered
# walks is only 0.26 (part P): batching leaves raises the occupancy of
# each paid leaf block at the cost of stalling pure-leaf lanes for up to
# N-1 sub-iterations.  Exact (pending leaf bits just ride the current
# entry / stack); static structure, no lax.cond.  TPU sweep
# (tools/sweep_leaf.py, 1M-tri scene, 2.07M bounce-1 rays, 0.61 live):
# closest 337.0 / 171.7 / 164.0 / 185.2 ms at N=1/2/3/4 — N=3 is 2.05x
# (and 273 -> 207.5 ms on coherent camera rays, so closest defaults to 3
# for BOTH profiles).  ANY walks terminate on the first leaf hit, so
# delaying leaves delays the early-out: on COHERENT camera any rays N=3
# is 3.4x WORSE (64 -> 215.5 ms — occluders are found in the first leaf),
# while on scattered NEE wavefronts the node-only sub-iterations win
# (99.7 / 95.8 / 90.6 ms at N=1/2/3; 62.9 with the 16x2 ladder).  The
# any-walk schedule is therefore per-profile: scattered 3, coherent 1.
LEAF_EVERY = _env_int("PTRT_LEAF_EVERY", 3, 1, 8)
ANY_LEAF_EVERY = _env_int("PTRT_ANY_LEAF_EVERY", 3, 1, 8)
ANY_LEAF_EVERY_COH = _env_int("PTRT_ANY_LEAF_EVERY_COH", 1, 1, 8)

# 0: pass 1 exits (or never runs) the moment the active count fits the tail
# buffer — bounce-2+ and NEE walks start mostly-dead, and forcing even two
# full-width iterations on them wastes ~44 ms per call at 1080p
#
# ROUND-4 RETUNE: every compaction profile below was re-swept after the
# FUSED state transport landed (one row gather per stage instead of 11+
# per-array takes, see _fused_take).  With the machinery ~12x cheaper the
# optima moved to FINER ladders everywhere (tools/sweep_r4.py,
# sweep_r4b.py; 1080p wavefronts, 1M-tri scene, TPU v5e):
#   camera closest: big_shrink 12x2 191.2 -> 6x3 144.4 ms
#   camera any:     16x1 219.2 -> 8x3 145.5 ms
#   scattered closest: auto(camera) 151.0 -> 5x4 126.9 ms
#   scattered any:  16x2 stays best (50.2 ms)
PASS_MIN_ITERS = _env_int("PTRT_PASS_MIN_ITERS", 0, 0, 1024)
COMPACT_SHRINK = _env_int("PTRT_COMPACT_SHRINK", 8, 2, 256)
COMPACT_STAGES = _env_int("PTRT_COMPACT_STAGES", 3, 1, 8)
# any-hit walks terminate on first hit, so their tails are short and flat
ANY_COMPACT_SHRINK = _env_int("PTRT_ANY_SHRINK", 8, 2, 256)
ANY_COMPACT_STAGES = _env_int("PTRT_ANY_STAGES", 2, 1, 8)
# closest-walk shrink at megapixel scale: per-lane gather cost grows with
# buffer size past ~1M lanes; small wavefronts keep the 230k-lane optimum 8
BIG_COMPACT_SHRINK = _env_int("PTRT_BIG_SHRINK", 6, 2, 256)
BIG_COMPACT_LANES = 1_000_000
MIN_COMPACT_LANES = 16384
# SCATTERED walks (bounce>=1 closest, bounce/env NEE any): the active
# set is fractional from the start (bounce-1: 0.61 live; bounce-3: <0.1)
# and collapses within a few iterations.  The aggressive 4-wide ladder
# this knob shipped with (shrink 4 x 4 stages) measured 1.5-4.8x WORSE
# than the winners on TPU — each narrow stage re-pays the full
# scatter/compact machinery while the per-iteration saving is small
# (tools/sweep_leaf.py, sweep_leaf2.py: bounce-1 closest 252.9 vs 164
# ms; bounce-2-dead any 233.0 vs 48.3 ms).  Winners: CLOSEST scattered
# uses the camera profile unchanged (bounce-1: camera 164 vs 16x2
# ladder 192.8; bounce-2-dead: 65.5 vs 55.4 — a wash dominated by the
# live bounce-1 walk), selected by SCATTER_SHRINK=0 (auto).  ANY
# scattered keeps a real ladder at 16x2 (bounce-1: 62.9 vs camera 90.6;
# bounce-2-dead: 48.3 vs 78.5).  PASS_MIN_ITERS=0 still lets every
# stage exit the moment the active set fits the next buffer.
# (round-4: with fused transport the ladder now BEATS the camera profile
# on scattered closest walks — 5x4: 126.9 ms vs auto 151.0; shipped 5x3
# (131.4) because each extra stage instantiates another walk body per
# scattered walk and the bigger frame program flirts with the remote
# compile helper's memory cap, sweep_r4b.py)
SCATTER_SHRINK = _env_int("PTRT_SCATTER_SHRINK", 5, 0, 256)
SCATTER_STAGES = _env_int("PTRT_SCATTER_STAGES", 3, 1, 12)
ANY_SCATTER_SHRINK = _env_int("PTRT_ANY_SCATTER_SHRINK", 16, 2, 256)
ANY_SCATTER_STAGES = _env_int("PTRT_ANY_SCATTER_STAGES", 2, 1, 12)


def _pop_cur(st, iota_d):
    """If the current entry is drained and the stack is non-empty, pop."""
    cur_mask = st["mask_i"] | st["mask_l"]
    can_pop = (cur_mask == 0) & (st["sp"] > 0)
    spm1 = jnp.maximum(st["sp"] - 1, 0)
    sel = iota_d[None, :] == spm1[:, None]
    top_a = jnp.sum(jnp.where(sel, st["stack_a"], 0), axis=1)
    top_b = jnp.sum(jnp.where(sel, st["stack_b"], 0), axis=1)
    out = dict(
        st,
        base_i=jnp.where(can_pop, (top_a >> 8) - 8, st["base_i"]),
        mask_i=jnp.where(can_pop, top_a & 0xFF, st["mask_i"]),
        base_l=jnp.where(can_pop, top_b >> 8, st["base_l"]),
        mask_l=jnp.where(can_pop, top_b & 0xFF, st["mask_l"]),
        sp=jnp.where(can_pop, spm1, st["sp"]),
    )
    if "stack_o" in st:
        top_o = jnp.sum(jnp.where(sel, st["stack_o"], 0), axis=1)
        out["ord_i"] = jnp.where(can_pop, top_o, st["ord_i"])
    return out


def _pop_cur_cm(st, iota_d):
    """(D, R)-stack variant of ``_pop_cur`` (see STACK_CM)."""
    cur_mask = st["mask_i"] | st["mask_l"]
    can_pop = (cur_mask == 0) & (st["sp"] > 0)
    spm1 = jnp.maximum(st["sp"] - 1, 0)
    sel = iota_d[:, None] == spm1[None, :]
    top_a = jnp.sum(jnp.where(sel, st["stack_a"], 0), axis=0)
    top_b = jnp.sum(jnp.where(sel, st["stack_b"], 0), axis=0)
    out = dict(
        st,
        base_i=jnp.where(can_pop, (top_a >> 8) - 8, st["base_i"]),
        mask_i=jnp.where(can_pop, top_a & 0xFF, st["mask_i"]),
        base_l=jnp.where(can_pop, top_b >> 8, st["base_l"]),
        mask_l=jnp.where(can_pop, top_b & 0xFF, st["mask_l"]),
        sp=jnp.where(can_pop, spm1, st["sp"]),
    )
    if "stack_o" in st:
        top_o = jnp.sum(jnp.where(sel, st["stack_o"], 0), axis=0)
        out["ord_i"] = jnp.where(can_pop, top_o, st["ord_i"])
    return out


def _descend(st, geom, o, inv_d, t_bound, iota_d, octant=None, cm=False):
    """Node action: visit ONE pending internal child (one node-row gather),
    slab-test its 8 children, make them the new current entry (pushing the
    remainder of the old entry if it still has pending bits).

    With ``octant``, pending children are visited in the precomputed
    near-first order (state carries ``ord_i`` + ``stack_o``): the nearest
    child's subtree tightens t before farther siblings are slab-tested, so
    they prune (the reference's ordered descent, ``intersection.cuh:385-418``,
    lifted to the wide tree)."""
    base_i, mask_i = st["base_i"], st["mask_i"]
    base_l, mask_l = st["base_l"], st["mask_l"]
    sp = st["sp"]
    has_int = mask_i != 0
    if octant is None:
        slot_i = _lsb_slot(mask_i)
    else:
        # mask_i lives in RANK space: LSB = next rank, then map to slot
        slot_i = _rank_to_slot(_lsb_slot(mask_i), st["ord_i"])
    naddr = jnp.clip(base_i + slot_i, 0, geom.num_nodes - 1)
    if NODE_CM and jnp.ndim(naddr) == 1:  # per-ray walk only (see NODE_CM)
        bmin8, bmax8, cba, lb, row_lmask, row_imask, ordpack = (
            _fetch_node8_cm(geom, naddr, octant))
        hitm = _hitmask8_cm(_slab8_cm(bmin8, bmax8, o, inv_d, t_bound))
    else:
        bmin8, bmax8, cba, lb, row_lmask, row_imask, ordpack = _fetch_node8(
            geom, naddr, octant)
        hitm = _hitmask8(_slab8(bmin8, bmax8, o, inv_d, t_bound))
    new_l = hitm & row_lmask
    new_i = hitm & row_imask
    if octant is not None:
        new_i = _slotmask_to_rankmask(new_i, ordpack)
    mask_i = mask_i & (mask_i - 1)  # consume the visited bit
    take_new = has_int & ((new_l | new_i) != 0)
    do_push = take_new & ((mask_i | mask_l) != 0)
    ent_a = ((base_i + 8) << 8) | mask_i
    ent_b = (base_l << 8) | mask_l
    if cm:  # (D, R) col-major stacks (STACK_CM)
        sel = (iota_d[:, None] == sp[None, :]) & do_push[None, :]
        push = lambda stk, ent: jnp.where(sel, ent[None, :], stk)
    else:  # (R, D) row-major stacks
        sel = (iota_d[None, :] == sp[:, None]) & do_push[:, None]
        push = lambda stk, ent: jnp.where(sel, ent[:, None], stk)
    out = dict(
        st,
        stack_a=push(st["stack_a"], ent_a),
        stack_b=push(st["stack_b"], ent_b),
        sp=jnp.where(do_push, sp + 1, sp),
        base_i=jnp.where(take_new, cba, base_i),
        mask_i=jnp.where(take_new, new_i, mask_i),
        base_l=jnp.where(take_new, lb, base_l),
        mask_l=jnp.where(take_new, new_l, mask_l),
    )
    if octant is not None:
        out["stack_o"] = push(st["stack_o"], st["ord_i"])
        out["ord_i"] = jnp.where(take_new, ordpack, st["ord_i"])
    return out


def _active(st):
    return ((st["mask_i"] | st["mask_l"]) != 0) | (st["sp"] > 0)


def _run_walk(body, state, to_completion, shrink=None, body_node=None):
    """Drive the walk.  With ``to_completion`` False, stop as soon as the
    unfinished lanes fit the 1/shrink tail buffer (but run at least
    PASS_MIN_ITERS iterations).

    With ``body_node`` (a leaf-free body variant), a PRE-PHASE while runs
    it as long as NO lane anywhere has a pending leaf — the first
    iterations of a root-seeded walk descend pure-internal levels, and at
    full wavefront width the skipped leaf gather+MT block is the single
    biggest line item of the whole walk."""
    if shrink is None:
        shrink = COMPACT_SHRINK

    def cond_full(s):
        return jnp.any(_active(s[0]))

    def cond_capped(s):
        st, k = s
        act = _active(st)
        n_active = jnp.sum(act.astype(jnp.int32))
        cap = jnp.size(st["sp"]) // shrink
        return jnp.any(act) & ((k < PASS_MIN_ITERS) | (n_active > cap))

    cond = cond_full if to_completion else cond_capped
    carry = (state, jnp.int32(0))
    if body_node is not None:
        def cond_pre(s):
            return cond(s) & jnp.logical_not(jnp.any(s[0]["mask_l"] != 0))

        carry = jax.lax.while_loop(cond_pre, body_node, carry)
    out, _ = jax.lax.while_loop(cond, body, carry)
    return out


def _pack_active(active, small_n):
    """Indices of active lanes, packed to the front of a small_n buffer via
    cumsum + scatter (an argsort would sort the whole wavefront).  Unfilled
    slots duplicate lane 0; re-running a lane is a no-op once its masks and
    sp are drained, and duplicate slots compute identical results, so the
    scatter-back is still exact."""
    total = jnp.size(active)
    pos = jnp.cumsum(active.astype(jnp.int32)) - 1
    pos = jnp.where(active, pos, small_n)  # inactive -> out of bounds
    lanes = jnp.arange(total, dtype=jnp.int32)
    out = jnp.zeros((small_n,), jnp.int32)
    return out.at[pos].set(lanes, mode="drop")


FUSED_COMPACT = _env_int("PTRT_FUSED_COMPACT", 1, 0, 1)


def _f2i(a):
    return jax.lax.bitcast_convert_type(a, jnp.int32)


def _i2f(a):
    return jax.lax.bitcast_convert_type(a, jnp.float32)


def _fused_take(state, o, d, extras, perm):
    """ONE row gather for the whole compaction transport: walk state + ray
    origins/directions + extras are packed as int32 columns of a single
    (R, C) matrix (floats bitcast — pure bit transport, no float math ever
    touches the int view, so TPU denormal flushing cannot alter values),
    gathered with ``perm`` once, and unpacked.

    The measured gather model (TODO.md: cost is per-INDEX, row width ~free
    to ~96 floats) makes one C-wide row gather ~12x cheaper than the 11+
    per-array takes it replaces — that per-array machinery cost is what
    made fine-grained compaction ladders LOSE their round-3 sweeps."""
    cols = []
    spec = []  # (kind, key, dtype, ncols, was_1d)

    def add(kind, key, a):
        if a.dtype == jnp.bool_:
            enc, dt = a.astype(jnp.int32), jnp.bool_
        elif a.dtype == jnp.float32:
            enc, dt = _f2i(a), jnp.float32
        else:
            enc, dt = a, jnp.int32
        was_1d = enc.ndim == 1
        blk = enc[:, None] if was_1d else enc
        cols.append(blk)
        spec.append((kind, key, dt, blk.shape[1], was_1d))

    for k, a in state.items():
        add("st", k, a)
    for i, c in enumerate((o.x, o.y, o.z, d.x, d.y, d.z)):
        add("ray", i, c)
    for i, e in enumerate(extras):
        add("ex", i, e)
    mat = jnp.concatenate(cols, axis=1)
    sm = jnp.take(mat, perm, axis=0)
    out_st, ray, ex = {}, [None] * 6, [None] * len(extras)
    off = 0
    for kind, key, dt, nc, was_1d in spec:
        v = sm[:, off] if was_1d else sm[:, off:off + nc]
        off += nc
        if dt == jnp.float32:
            v = _i2f(v)
        elif dt == jnp.bool_:
            v = v != 0
        if kind == "st":
            out_st[key] = v
        elif kind == "ray":
            ray[key] = v
        else:
            ex[key] = v
    return (out_st, Vec3(ray[0], ray[1], ray[2]),
            Vec3(ray[3], ray[4], ray[5]), tuple(ex))


def _compact_finish(loop_factory, state, o, d, extras=(), stages=1,
                    result_keys=None, shrink=None, stack_cm=False):
    """Compact unfinished lanes into a 1/shrink buffer, continue
    there (recursively re-compacting up to ``stages`` times), scatter results
    back.  ``extras`` are additional per-lane inputs (e.g. any-hit t_max).
    All arrays are lane-major (axis 0 = lane), except ``stack_*`` keys when
    ``stack_cm`` (lane axis 1, see STACK_CM).

    ``result_keys``: after the tail RUNS TO COMPLETION its walk state
    (masks/sp/stacks) is dead — only these keys are scattered back to the
    full buffer (each skipped key saves one scatter op per stage)."""
    if shrink is None:
        shrink = COMPACT_SHRINK
    total = jnp.size(state["sp"])
    small_n = total // shrink
    perm = _pack_active(_active(state), small_n)
    take = lambda a: jnp.take(a, perm, axis=0)
    if FUSED_COMPACT and not stack_cm:
        small, o_s, d_s, extras_s = _fused_take(state, o, d, extras, perm)
    else:
        small = {k: jnp.take(a, perm,
                             axis=1 if (stack_cm and k.startswith("stack"))
                             else 0)
                 for k, a in state.items()}
        o_s = o.map(take)
        d_s = d.map(take)
        extras_s = tuple(take(e) for e in extras)
    last = stages <= 1 or small_n // shrink < 1024
    small = loop_factory(small, o_s, d_s, *extras_s, to_completion=last)
    if not last:
        small = _compact_finish(loop_factory, small, o_s, d_s, extras_s,
                                stages=stages - 1, result_keys=result_keys,
                                shrink=shrink, stack_cm=stack_cm)
    if result_keys is None:
        upd = lambda full, sm: full.at[perm].set(sm)
        return jax.tree_util.tree_map(upd, state, small)
    out = dict(state)
    if FUSED_COMPACT and len(result_keys) > 1:
        # fused result scatter: one row scatter instead of one per key
        enc = lambda a: _f2i(a) if a.dtype == jnp.float32 else (
            a.astype(jnp.int32))
        fm = jnp.stack([enc(state[k]) for k in result_keys], axis=1)
        sm_m = jnp.stack([enc(small[k]) for k in result_keys], axis=1)
        fm = fm.at[perm].set(sm_m)
        for i, k in enumerate(result_keys):
            v = fm[:, i]
            if state[k].dtype == jnp.float32:
                v = _i2f(v)
            elif state[k].dtype != jnp.int32:
                v = v.astype(state[k].dtype)
            out[k] = v
        return out
    for k in result_keys:
        out[k] = jax.tree_util.tree_map(
            lambda full, sm: full.at[perm].set(sm), state[k], small[k])
    return out


def _init_walk_state(total: int, depth: int, live,
                     ordered: bool = False, cm: bool | None = None) -> dict:
    """Start every live lane at the root (node id 0 = base 0 + slot 0).
    Stacks are (R, D), or (D, R) with ``cm`` (defaults to STACK_CM;
    packet walks pass cm=False — their stack machinery is row-major)."""
    if cm is None:
        cm = bool(STACK_CM)
    z = jnp.zeros((total,), jnp.int32)
    stk_shape = (depth, total) if cm else (total, depth)
    st = dict(
        base_i=z,
        mask_i=jnp.where(live, 1, 0).astype(jnp.int32),
        base_l=z,
        mask_l=z,
        sp=z,
        stack_a=jnp.zeros(stk_shape, jnp.int32),
        stack_b=jnp.zeros(stk_shape, jnp.int32),
    )
    if ordered:
        st["ord_i"] = jnp.full((total,), _IDENTITY_ORD, jnp.int32)
        st["stack_o"] = jnp.zeros(stk_shape, jnp.int32)
    return st


def _seed_from_root(st: dict, geom: SceneGeometry, o: Vec3, d: Vec3,
                    t0, octant=None) -> dict:
    """Perform the root visit DENSELY: the root row is node_rows[0] — a
    static slice broadcast against all lanes, so the walk's first iteration
    (which would gather the identical root row per lane and run a wasted
    leaf action) disappears.  Measured: the full-width iteration is the
    single most expensive of the whole walk (~56 ms at 2.2M lanes), and
    every lane pays it.

    Equivalent to one ``_descend`` from the initial (base 0, mask 1) state
    with an empty stack: no push can occur, the new current entry is the
    root's slab-tested children."""
    row = geom.node_rows[0]
    bmin8 = (row[0:8], row[8:16], row[16:24])
    bmax8 = (row[24:32], row[32:40], row[40:48])
    meta = _i32(row[48:52])
    cba, lb, lmask, imask = meta[0], meta[1], meta[2], meta[3]
    inv_d = _safe_inv(d)
    live = t0 > 0.0
    bmin8 = tuple(b[None, :] for b in bmin8)
    bmax8 = tuple(b[None, :] for b in bmax8)
    hitm = _hitmask8(_slab8(bmin8, bmax8, o, inv_d, jnp.where(live, t0, 0.0)))
    hitm = jnp.where(live, hitm, 0)
    new_l = hitm & lmask
    new_i = hitm & imask
    out = dict(st, base_i=jnp.full_like(st["base_i"], cba),
               base_l=jnp.full_like(st["base_l"], lb),
               mask_l=new_l)
    if octant is not None:
        ordcols = _i32(row[52:60])
        ordpack = jnp.zeros_like(hitm)
        for oc in range(8):
            ordpack = jnp.where(octant == oc, ordcols[oc], ordpack)
        out["ord_i"] = ordpack
        out["mask_i"] = _slotmask_to_rankmask(new_i, ordpack)
    else:
        out["mask_i"] = new_i
    return out


# -- instance (two-level) helpers --------------------------------------------


def _affine(rows, p: Vec3) -> Vec3:
    """Apply a (3, 4) affine row matrix to a point."""
    return Vec3(
        rows[0, 0] * p.x + rows[0, 1] * p.y + rows[0, 2] * p.z + rows[0, 3],
        rows[1, 0] * p.x + rows[1, 1] * p.y + rows[1, 2] * p.z + rows[1, 3],
        rows[2, 0] * p.x + rows[2, 1] * p.y + rows[2, 2] * p.z + rows[2, 3],
    )


def _linear(rows, v: Vec3) -> Vec3:
    """Apply the rotation/scale part of a (3, 4) matrix to a direction.
    The direction is NOT renormalized, so the ray parameter t is identical
    in local and world space (``intersection.cuh:438-479`` rescales tMax by
    the direction scale instead; keeping t shared is exact and free)."""
    return Vec3(
        rows[0, 0] * v.x + rows[0, 1] * v.y + rows[0, 2] * v.z,
        rows[1, 0] * v.x + rows[1, 1] * v.y + rows[1, 2] * v.z,
        rows[2, 0] * v.x + rows[2, 1] * v.y + rows[2, 2] * v.z,
    )


def _slab1(bb_min, bb_max, o: Vec3, inv_d: Vec3, t_max):
    """Single world-AABB slab test against the wavefront (instance cull)."""
    t_enter = jnp.zeros_like(o.x)
    t_exit = t_max
    for a in range(3):
        oc = (o.x, o.y, o.z)[a]
        ic = (inv_d.x, inv_d.y, inv_d.z)[a]
        t0 = (bb_min[a] - oc) * ic
        t1 = (bb_max[a] - oc) * ic
        t_enter = jnp.maximum(t_enter, jnp.minimum(t0, t1))
        t_exit = jnp.minimum(t_exit, jnp.maximum(t0, t1))
    return t_enter <= t_exit


def _walk_closest_raw(geom: SceneGeometry, o: Vec3, d: Vec3, t0,
                      roots=None, scattered: bool = False,
                      skip_pass1: bool = False) -> dict:
    """Run the closest-hit walk over flat lanes; lanes with t0 <= 0 are
    dead.  Returns the raw best state {t, best} (``best`` packs the winning
    (tri block, slot); -1 = none).

    With ``roots`` (per-lane int32 node ids), each lane starts at its own
    subtree root instead of row 0 — the batched-instance walk uses this to
    run every (ray, instance) item through ONE walk.  Without it, the root
    visit is performed densely (``_seed_from_root``).

    ``scattered`` selects the ladder compaction profile (SCATTER_SHRINK /
    SCATTER_STAGES) tuned for bounce wavefronts whose active set collapses
    within a few iterations.

    ``skip_pass1``: the caller GUARANTEES at most total/shrink lanes are
    live (e.g. a packet-handoff tail, live <= 1/16 by construction) — the
    full-width pass (and its body instantiation in the program) is elided
    and the walk starts compacted.  Lanes beyond the guarantee would be
    silently dropped; only set this when the bound is structural."""
    total = jnp.size(t0)
    depth = geom.stack_depth
    iota_d = jnp.arange(depth, dtype=jnp.int32)

    state = _init_walk_state(total, depth, t0 > 0.0, ordered=True)
    state.update(t=t0, best=jnp.full((total,), -1, jnp.int32))
    if roots is None:
        state = _seed_from_root(state, geom, o, d, t0, _ray_octant(d))
    else:
        state["base_i"] = roots

    if scattered and SCATTER_SHRINK:
        shrink, stages = SCATTER_SHRINK, SCATTER_STAGES
    else:
        # SCATTER_SHRINK=0 (default): scattered closest walks use the
        # camera profile — measured best on live bounce-1 wavefronts
        shrink = (BIG_COMPACT_SHRINK if total >= BIG_COMPACT_LANES
                  else COMPACT_SHRINK)
        stages = COMPACT_STAGES

    def loop_fac(st, o_s, d_s, to_completion):
        b, bn = _make_closest_body(geom, o_s, d_s, iota_d)
        return _run_walk(b, st, to_completion, shrink=shrink, body_node=bn)

    if total < MIN_COMPACT_LANES:
        body, body_node = _make_closest_body(geom, o, d, iota_d)
        s = _run_walk(body, state, True, body_node=body_node)
    elif skip_pass1:
        s = _compact_finish(loop_fac, state, o, d, stages=stages,
                            result_keys=("t", "best"), shrink=shrink,
                            stack_cm=bool(STACK_CM))
    else:
        body, body_node = _make_closest_body(geom, o, d, iota_d)
        s = _run_walk(body, state, False, shrink=shrink,
                      body_node=body_node)
        s = _compact_finish(loop_fac, s, o, d, stages=stages,
                            result_keys=("t", "best"), shrink=shrink,
                            stack_cm=bool(STACK_CM))
    return {"t": s["t"], "best": s["best"]}


def _closest_state(geom: SceneGeometry, o: Vec3, d: Vec3, t0,
                   scattered: bool = False) -> dict:
    """Walk + one-time attribute reconstruction (t/u/v/nrm/mesh), with
    ``nrm`` in the geometry's own (possibly instance-local) space."""
    if scattered and SORTPK and jnp.size(t0) >= SORTPK_MIN_LANES:
        return _sorted_packet_closest_state(geom, o, d, t0)
    return _reconstruct_hit(
        geom, o, d, _walk_closest_raw(geom, o, d, t0, scattered=scattered))


def _reconstruct_hit(geom: SceneGeometry, o: Vec3, d: Vec3, s: dict) -> dict:
    """(t, best) -> full hit state via ONE tri-row gather + single-triangle
    MT recompute (exact: same triangle, same ray)."""
    found = s["best"] >= 0
    idx = jnp.maximum(s["best"], 0)
    blk = idx // LEAF_SIZE
    slot = idx - blk * LEAF_SIZE
    v0, e1, e2, mesh_id, _ = _fetch_leaf(geom, blk)
    sel = (jnp.arange(LEAF_SIZE, dtype=jnp.int32)[None, :] == slot[:, None])
    pick = lambda a: jnp.sum(jnp.where(sel, a, 0), axis=-1)
    pick3 = lambda v: Vec3(pick(v.x), pick(v.y), pick(v.z))
    v0s, e1s, e2s = pick3(v0), pick3(e1), pick3(e2)
    _, _, uu, vv = _mt_test(v0s, e1s, e2s, o, d, 0.0, jnp.inf)
    nrm = cross(e1s, e2s)
    zero = jnp.zeros_like(uu)
    return dict(
        t=s["t"],
        u=jnp.where(found, uu, zero),
        v=jnp.where(found, vv, zero),
        nrm=where(found, nrm, Vec3.zeros(jnp.shape(uu))),
        mesh=jnp.where(found, pick(mesh_id), -1),
    )


def _merge_instance_closest(s, inst, o: Vec3, d: Vec3, inv_d: Vec3,
                            runner) -> dict:
    """Trace one instance with the current best t as the bound and merge.
    ``runner(geom, o_local, d_local, t0) -> state`` (BVH or brute)."""
    live = _slab1(inst.bb_min, inst.bb_max, o, inv_d, s["t"])
    o_l = _affine(inst.inv_rows, o)
    d_l = _linear(inst.inv_rows, d)
    si = runner(inst.geom, o_l, d_l, jnp.where(live, s["t"], -1.0))
    found = si["mesh"] >= 0  # any hit beats s: the walk was bounded by s[t]
    n_w = _linear(inst.nrm_rows, si["nrm"])  # inverse-transpose rotation
    return dict(
        t=jnp.where(found, si["t"], s["t"]),
        u=jnp.where(found, si["u"], s["u"]),
        v=jnp.where(found, si["v"], s["v"]),
        nrm=where(found, n_w, s["nrm"]),
        mesh=jnp.where(found, si["mesh"], s["mesh"]),
    )


# -- batched instances (one walk for ALL instances) ---------------------------
#
# The reference's TLAS is one tree walk regardless of instance count
# (``intersection.cuh:526-605``).  The round-2 per-instance unrolled loop
# made both program size and runtime linear in instances; here the per-
# instance BLASes are merged into one table pair (scene_geom.InstanceSet)
# and traversal runs rounds of (ray, instance) work items through ONE
# walk whose lanes start at per-item roots:
#   1. dense TLAS pass: slab every ray against every instance world AABB
#      (instances are tens — a broadcast beats a tree) -> per-lane bitmask
#   2. per round: pack lanes with pending instances into a 1/4 buffer,
#      transform each item's ray into its instance frame (one 24-float
#      matrix-row gather), walk the merged tables bounded by the lane's
#      current best t, scatter improvements back, clear the processed bit
#   3. rounds repeat while any lane has pending instances — the count of
#      rounds is the max instance OVERLAP per ray (~1-2), not the count
#      of instances.

_INST_WORD_BITS = 31  # avoid the int32 sign bit in mask words


def _inst_hit_words(iset, o: Vec3, inv_d: Vec3, t, live) -> list:
    """Per-lane bitmask words of instances whose world AABB the ray enters
    within t (the dense TLAS leaf test).

    Batched per 31-instance word — a (R, 31) slab test + one bit-packed
    reduction per word — so program size is O(words), not O(instances)
    (a per-instance unrolled loop made the 192-slot fused tycoon's frame
    program and per-walk slab work linear in instance count).  Word pad
    slots carry inverted boxes and can never pass."""
    B = _INST_WORD_BITS
    n_words = (iset.count + B - 1) // B
    pad = n_words * B - iset.count
    bmin = jnp.pad(iset.bb_min, ((0, pad), (0, 0)), constant_values=1.0)
    bmax = jnp.pad(iset.bb_max, ((0, pad), (0, 0)), constant_values=-1.0)
    bits = jnp.asarray([1 << b for b in range(B)], jnp.int32)
    oc = (o.x[..., None], o.y[..., None], o.z[..., None])
    ic = (inv_d.x[..., None], inv_d.y[..., None], inv_d.z[..., None])
    words = []
    for wi in range(n_words):
        lo = bmin[wi * B:(wi + 1) * B]  # (B, 3)
        hi = bmax[wi * B:(wi + 1) * B]
        t_enter = jnp.zeros(jnp.shape(t) + (B,), jnp.float32)
        t_exit = jnp.broadcast_to(t[..., None], jnp.shape(t) + (B,))
        for a in range(3):
            t0 = (lo[None, :, a] - oc[a]) * ic[a]
            t1 = (hi[None, :, a] - oc[a]) * ic[a]
            t_enter = jnp.maximum(t_enter, jnp.minimum(t0, t1))
            t_exit = jnp.minimum(t_exit, jnp.maximum(t0, t1))
        ok = (t_enter <= t_exit) & live[..., None]
        words.append(jnp.sum(jnp.where(ok, bits[None, :], 0), axis=-1))
    return words


def _words_any(words) -> jnp.ndarray:
    a = words[0] != 0
    for m in words[1:]:
        a = a | (m != 0)
    return a


def _words_lsb_iid(words) -> jnp.ndarray:
    """Lowest pending instance id across words (-1 if none)."""
    iid = jnp.full_like(words[0], -1)
    for w in reversed(range(len(words))):
        m = words[w]
        slot = jax.lax.population_count((m & -m) - 1)
        iid = jnp.where(m != 0, w * _INST_WORD_BITS + slot, iid)
    return iid


def _words_clear_lsb(words, do) -> list:
    """Clear the lowest set bit of the first nonzero word, per lane."""
    out = []
    cleared = jnp.zeros_like(do)
    for m in words:
        c = do & jnp.logical_not(cleared) & (m != 0)
        out.append(jnp.where(c, m & (m - 1), m))
        cleared = cleared | c
    return out


def _mat_affine(m, p: Vec3) -> Vec3:
    """Apply gathered (R, 24) matrix rows (cols 0:12 = world->local 3x4)."""
    return Vec3(
        m[:, 0] * p.x + m[:, 1] * p.y + m[:, 2] * p.z + m[:, 3],
        m[:, 4] * p.x + m[:, 5] * p.y + m[:, 6] * p.z + m[:, 7],
        m[:, 8] * p.x + m[:, 9] * p.y + m[:, 10] * p.z + m[:, 11])


def _mat_linear(m, v: Vec3) -> Vec3:
    return Vec3(
        m[:, 0] * v.x + m[:, 1] * v.y + m[:, 2] * v.z,
        m[:, 4] * v.x + m[:, 5] * v.y + m[:, 6] * v.z,
        m[:, 8] * v.x + m[:, 9] * v.y + m[:, 10] * v.z)


def _mat_normal(m, v: Vec3) -> Vec3:
    """Cols 12:21: local->world normal matrix (inverse transpose)."""
    return Vec3(
        m[:, 12] * v.x + m[:, 13] * v.y + m[:, 14] * v.z,
        m[:, 15] * v.x + m[:, 16] * v.y + m[:, 17] * v.z,
        m[:, 18] * v.x + m[:, 19] * v.y + m[:, 20] * v.z)


def _inst_round_cap(total: int) -> int:
    return total if total <= MIN_COMPACT_LANES else max(
        total // 4, MIN_COMPACT_LANES)


def _instances_closest_batched(iset, o: Vec3, d: Vec3, s: dict) -> dict:
    total = jnp.size(s["t"])
    C = _inst_round_cap(total)
    inv_d = _safe_inv(d)
    words = _inst_hit_words(iset, o, inv_d, s["t"],
                            jnp.ones(jnp.shape(s["t"]), bool))
    best_m = jnp.full((total,), -1, jnp.int32)
    best_iid = jnp.full((total,), -1, jnp.int32)

    def cond(c):
        return jnp.any(_words_any(c[0]))

    def body(c):
        ws, t, bm, bi = c
        active = _words_any(ws)
        pos = jnp.cumsum(active.astype(jnp.int32)) - 1
        processed = active & (pos < C)
        perm = _pack_active(processed, C)
        tk = lambda a: jnp.take(a, perm, axis=0)
        o_s, d_s = o.map(tk), d.map(tk)
        act_s = tk(processed)
        iid = jnp.maximum(_words_lsb_iid([tk(m) for m in ws]), 0)
        mt = jnp.take(iset.mats, iid, axis=0)
        o_l = _mat_affine(mt, o_s)
        d_l = _mat_linear(mt, d_s)
        t0 = jnp.where(act_s, tk(t), -1.0)
        r = _walk_closest_raw(iset.geom, o_l, d_l, t0,
                              roots=jnp.take(iset.roots, iid, axis=0))
        # a found hit strictly beats the lane's bound (the walk was bounded
        # by t0); duplicate perm slots recompute lane 0 identically, so the
        # scatter writes are exact (same argument as _compact_finish)
        found = r["best"] >= 0
        t = t.at[perm].set(jnp.where(found, r["t"], tk(t)))
        bm = bm.at[perm].set(jnp.where(found, r["best"], tk(bm)))
        bi = bi.at[perm].set(jnp.where(found, iid, tk(bi)))
        return (_words_clear_lsb(ws, processed), t, bm, bi)

    words, t, best_m, best_iid = jax.lax.while_loop(
        cond, body, (words, s["t"], best_m, best_iid))

    ifound = best_iid >= 0
    iid = jnp.maximum(best_iid, 0)
    mt = jnp.take(iset.mats, iid, axis=0)
    rec = _reconstruct_hit(iset.geom, _mat_affine(mt, o), _mat_linear(mt, d),
                           {"t": t, "best": jnp.where(ifound, best_m, -1)})
    n_w = _mat_normal(mt, rec["nrm"])
    return dict(
        t=t,
        u=jnp.where(ifound, rec["u"], s["u"]),
        v=jnp.where(ifound, rec["v"], s["v"]),
        nrm=where(ifound, n_w, s["nrm"]),
        mesh=jnp.where(ifound, rec["mesh"], s["mesh"]),
    )


def _instances_any_batched(iset, o: Vec3, d: Vec3, t_f, hit) -> jnp.ndarray:
    total = jnp.size(t_f)
    C = _inst_round_cap(total)
    inv_d = _safe_inv(d)
    words = _inst_hit_words(iset, o, inv_d, t_f,
                            jnp.logical_not(hit) & (t_f > 0.0))

    def cond(c):
        return jnp.any(_words_any(c[0]))

    def body(c):
        ws, h = c
        active = _words_any(ws)
        pos = jnp.cumsum(active.astype(jnp.int32)) - 1
        processed = active & (pos < C)
        perm = _pack_active(processed, C)
        tk = lambda a: jnp.take(a, perm, axis=0)
        act_s = tk(processed)
        iid = jnp.maximum(_words_lsb_iid([tk(m) for m in ws]), 0)
        mt = jnp.take(iset.mats, iid, axis=0)
        o_l = _mat_affine(mt, o.map(tk))
        d_l = _mat_linear(mt, d.map(tk))
        hs = _any_state(iset.geom, o_l, d_l,
                        jnp.where(act_s, tk(t_f), -1.0),
                        roots=jnp.take(iset.roots, iid, axis=0))
        h = h.at[perm].set(tk(h) | (hs & act_s))
        ws = _words_clear_lsb(ws, processed)
        # an occluded lane's remaining instances are moot
        ws = [jnp.where(h, 0, m) for m in ws]
        return (ws, h)

    _, hit = jax.lax.while_loop(cond, body, (words, hit))
    return hit


def _finalize_closest(o: Vec3, d: Vec3, s: dict, shape) -> Hit:
    found = s["mesh"] >= 0
    n = s["nrm"].normalized(1e-30)
    front = d.dot(n) < 0.0
    n = where(front, n, -n)
    rs = lambda a: a.reshape(shape)
    return Hit(
        hit=rs(found), t=rs(s["t"]), point=(o + d * s["t"]).map(rs),
        normal=n.map(rs), front_face=rs(front),
        mesh_index=rs(jnp.where(found, s["mesh"], -1)),
        u=rs(s["u"]), v=rs(s["v"]),
    )


# packet closest-hit tile size: 4x4 (P=16) measured 2.0x on 1080p camera
# rays (P=64 loses: the union of leaf visits grows faster than the gather
# amortization); PTRT_PACKET_CLOSEST=0 forces the per-ray walk
PACKET_CLOSEST = _env_int("PTRT_PACKET_CLOSEST", 1, 0, 1)
_PKC_TH = 4
_PKC_TW = 4
# packet-phase handoff: stop the packet walk once unfinished packets fit
# a 1/shrink buffer and finish their RAYS in the per-ray walk (restarted
# with the packet phase's tightened t — exact).  part J: mean packet work
# is ~3.7 iterations but the conservative-interval tail is 400+, which
# the per-ray machine drains far cheaper.  TPU sweep (prof_r3 part K,
# 1080p camera rays, 1M tris): shrink 16 -> 125.7 ms vs per-ray 288.6 /
# shrink 8 261.0 / shrink 32 149.7 — 2.3x per-ray, exact.
_PKC_HANDOFF_SHRINK = _env_int("PTRT_PKC_HANDOFF_SHRINK", 16, 2, 256)


def _grid_packet_ctx(shape, th: int, tw: int):
    """Shared pack/pad/crop helpers for the pixel-grid packet dispatchers:
    ``prep`` broadcasts a (..., H, W) array to packets of th*tw rays
    (padding partial tiles with a fill value); ``unprep`` inverts it back
    to ``shape``.  One implementation for both the closest and any-hit
    paths so their padding/tiling semantics cannot diverge."""
    from ptrt_tpu.render import packet as pk

    h, w = shape[-2], shape[-1]
    ph, pw = -(-h // th) * th, -(-w // tw) * tw
    nlead = 1
    for sdim in shape[:-2]:
        nlead *= sdim

    def prep(a, fill):
        a = jnp.broadcast_to(a, shape).reshape((nlead, h, w))
        if (ph, pw) != (h, w):
            a = jnp.pad(a, ((0, 0), (0, ph - h), (0, pw - w)),
                        constant_values=fill)
        a = pk.tile_to_packets(a, ph, pw, th, tw)
        return a.reshape((nlead * (ph // th) * (pw // tw), th * tw))

    def unprep(a):
        a = a.reshape((nlead, (ph // th) * (pw // tw), th * tw))
        a = pk.packets_to_tile(a, ph, pw, th, tw)
        return a[:, :h, :w].reshape(shape)

    return prep, unprep


def _packet_closest_grid(gs, o: Vec3, d: Vec3, t_max, shape) -> dict:
    """Closest-hit HEAD over a (..., H, W) pixel-grid wavefront via
    4x4-tile packets; returns {t, best, unfinished} FLATTENED back to the
    wavefront's own lane order.  ``unfinished`` marks rays whose packet
    still had pending work at handoff — the caller must finish them with
    the per-ray walk (t already tightened)."""
    from ptrt_tpu.render import packet as pk

    prep, unprep_g = _grid_packet_ctx(shape, _PKC_TH, _PKC_TW)
    unprep = lambda a: unprep_g(a).reshape(-1)

    t_p = prep(jnp.asarray(t_max, jnp.float32), -1.0)
    s, unfin = pk.packet_closest_partial(
        gs, o.map(lambda c: prep(c, 0.0)), d.map(lambda c: prep(c, 1.0)),
        t_p, shrink=_PKC_HANDOFF_SHRINK)
    unfin_rays = jnp.broadcast_to(unfin[:, None], t_p.shape)
    return {"t": unprep(s["t"]), "best": unprep(s["best"]),
            "unfinished": unprep(unfin_rays)}


def _hybrid_closest_state(gs, o: Vec3, d: Vec3, t0, raw_pk: dict) -> dict:
    """Finish the packet head: per-ray walk over the unfinished rays
    (others enter dead), merged with the packet phase's results."""
    t_restart = jnp.where(raw_pk["unfinished"] & (t0 > 0.0),
                          raw_pk["t"], -1.0)
    # the tail front is mostly dead BY CONSTRUCTION (unfinished packets fit
    # a 1/_PKC_HANDOFF_SHRINK buffer): the full-width pass is elided
    # outright whenever that structural bound covers the walk's first
    # compacted stage (effective shrink: camera selection when
    # SCATTER_SHRINK=0 auto, see _walk_closest_raw)
    eff_shrink = SCATTER_SHRINK or max(BIG_COMPACT_SHRINK, COMPACT_SHRINK)
    s_ray = _walk_closest_raw(gs, o, d, t_restart, scattered=True,
                              skip_pass1=_PKC_HANDOFF_SHRINK >= eff_shrink)
    closer = s_ray["best"] >= 0
    return _reconstruct_hit(gs, o, d, {
        "t": jnp.where(closer, s_ray["t"], raw_pk["t"]),
        "best": jnp.where(closer, s_ray["best"], raw_pk["best"]),
    })


# -- sorted-packet scattered walks (round-5 architecture experiment) ---------
#
# Scattered bounce walks are ~81% of a d4 frame and sit near the per-ray
# gather-model floor (TODO.md).  Packets amortize every gathered row over
# 64 rays but need coherent sign/locality — which a bounce wavefront can
# be GIVEN by binning: sort lanes by (direction octant | origin-cell
# Morton), walk 64-lane packets of the sorted order (conservative, exact),
# finish stragglers with the per-ray ladder tail, unsort.
#
# MEASURED (round 5, tools/probe_sortpk_r5.py, TPU v5e, 2.07M bounce-1
# rays / 1M tris): a clear LOSS — baseline per-ray ladder 230 ms;
# jnp.argsort of the 2M keys + one permute alone is 125 ms (lax.sort
# costs as much as the whole walk it was meant to accelerate); and the
# binned packet heads still degenerate (cb=6/shrink=16: 8753 ms, 8: 5472
# — surface-origin packets keep loose intervals even within a bin).
# Exactness verified (0 mismatches) and pinned by
# TestSortedPacketScattered, so the path stays available for future
# hardware where sort is cheap relative to gather, but the default is OFF.
SORTPK = _env_int("PTRT_SORTPK", 0, 0, 1)
SORTPK_MIN_LANES = _env_int("PTRT_SORTPK_MIN", 262144, 0, 1 << 30)
_SPK_SHRINK = _env_int("PTRT_SORTPK_SHRINK", 16, 2, 256)
_SPK_CELL_BITS = _env_int("PTRT_SORTPK_CB", 6, 1, 10)


def _sortpk_key(gs, o: Vec3, d: Vec3, t0, cell_bits: int):
    """(octant | morton(origin cell)) int32 lane key; dead lanes last."""
    root = gs.node_rows[0]
    bmin = [jnp.min(root[a * 8:(a + 1) * 8]) for a in range(3)]
    bmax = [jnp.max(root[24 + a * 8:24 + (a + 1) * 8]) for a in range(3)]
    n = (1 << cell_bits) - 1
    cells = []
    for a, c in enumerate((o.x, o.y, o.z)):
        f = (c - bmin[a]) / jnp.maximum(bmax[a] - bmin[a], 1e-6)
        cells.append(jnp.clip((f * (n + 1)).astype(jnp.int32), 0, n))
    m = jnp.zeros_like(cells[0])
    for b in range(cell_bits):
        m = (m
             | (((cells[0] >> b) & 1) << (3 * b))
             | (((cells[1] >> b) & 1) << (3 * b + 1))
             | (((cells[2] >> b) & 1) << (3 * b + 2)))
    key = (_ray_octant(d) << (3 * cell_bits)) | m
    return jnp.where(t0 > 0.0, key, jnp.int32(2 ** 30))


def _sorted_packet_closest_state(gs, o: Vec3, d: Vec3, t0) -> dict:
    """Closest-hit over a SCATTERED wavefront via binned packets:
    sort -> packet head -> per-ray tail -> unsort.  Exact (packets are
    conservative; the tail restarts pending rays with the tightened t)."""
    from ptrt_tpu.render import packet as pk

    R = jnp.size(t0)
    P = pk.PACKET_SIZE
    # pad to a packet multiple with dead lanes
    Rp = -(-R // P) * P
    if Rp != R:
        padc = lambda c, v: jnp.concatenate(
            [c, jnp.full((Rp - R,), v, c.dtype)])
        o = o.map(lambda c: padc(c, 0.0))
        d = d.map(lambda c: padc(c, 1.0))
        t0p = padc(t0, -1.0)
    else:
        t0p = t0
    perm = jnp.argsort(
        _sortpk_key(gs, o, d, t0p, _SPK_CELL_BITS)).astype(jnp.int32)
    take = lambda a: jnp.take(a, perm, axis=0)
    o_s, d_s, t_s = o.map(take), d.map(take), take(t0p)

    shp = (Rp // P, P)
    rp = lambda a: a.reshape(shp)
    s, unfin = pk.packet_closest_partial(
        gs, o_s.map(rp), d_s.map(rp), rp(t_s), shrink=_SPK_SHRINK)
    t_pk = s["t"].reshape(-1)
    best_pk = s["best"].reshape(-1)
    unfin_rays = jnp.broadcast_to(unfin[:, None], shp).reshape(-1)

    t_restart = jnp.where(unfin_rays & (t_s > 0.0), t_pk, -1.0)
    eff_shrink = SCATTER_SHRINK or max(BIG_COMPACT_SHRINK, COMPACT_SHRINK)
    s_ray = _walk_closest_raw(gs, o_s, d_s, t_restart, scattered=True,
                              skip_pass1=_SPK_SHRINK >= eff_shrink)
    closer = s_ray["best"] >= 0
    t_m = jnp.where(closer, s_ray["t"], t_pk)
    best_m = jnp.where(closer, s_ray["best"], best_pk)
    inv = jnp.zeros((Rp,), jnp.int32).at[perm].set(
        jnp.arange(Rp, dtype=jnp.int32))
    t_u = jnp.take(t_m, inv, axis=0)[:R]
    best_u = jnp.take(best_m, inv, axis=0)[:R]
    o_r = o.map(lambda c: c[:R])
    d_r = d.map(lambda c: c[:R])
    return _reconstruct_hit(gs, o_r, d_r, {"t": t_u, "best": best_u})


def intersect_closest(geom, o: Vec3, d: Vec3, t_max=T_MAX,
                      coherent: bool = False,
                      scattered: bool = False) -> Hit:
    """Closest-hit over the wavefront (``traceRay``,
    ``intersection.cuh:526-605``).  Lanes with t_max <= 0 are dead and exit
    without traversing.  Accepts a flat ``SceneGeometry`` or a two-level
    ``WorldGeometry`` (static pass first to tighten t, then one bounded
    pass per dynamic instance in its local frame).

    ``coherent=True`` marks a pixel-grid wavefront (trailing dims H, W):
    the static walk runs per 4x4-tile packet (``render/packet.py``) —
    exact, measured 2.0x on 1080p camera rays.

    ``scattered=True`` marks a bounce wavefront (mostly-dead, fast-
    collapsing): the walk uses the ladder compaction profile."""
    from ptrt_tpu.geometry.scene_geom import WorldGeometry

    shape = jnp.broadcast_shapes(jnp.shape(o.x), jnp.shape(d.x),
                                 jnp.shape(jnp.asarray(t_max)))
    total = 1
    for sdim in shape:
        total *= sdim
    use_pk = (coherent and PACKET_CLOSEST and len(shape) >= 2
              and total >= _PK_MIN_PIXELS)
    gs = geom.static if isinstance(geom, WorldGeometry) else geom
    raw_pk = (_packet_closest_grid(gs, o, d, t_max, shape) if use_pk
              else None)
    o = o.broadcast_to(shape).map(lambda c: c.reshape(total))
    d = d.broadcast_to(shape).map(lambda c: c.reshape(total))
    t0 = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                          shape).reshape(total)

    if isinstance(geom, WorldGeometry):
        s = (_hybrid_closest_state(gs, o, d, t0, raw_pk) if use_pk
             else _closest_state(geom.static, o, d, t0, scattered=scattered))
        if geom.iset is not None:
            s = _instances_closest_batched(geom.iset, o, d, s)
        else:
            inv_d = _safe_inv(d)
            for inst in geom.instances:
                s = _merge_instance_closest(s, inst, o, d, inv_d,
                                            _closest_state)
    else:
        s = (_hybrid_closest_state(gs, o, d, t0, raw_pk) if use_pk
             else _closest_state(geom, o, d, t0, scattered=scattered))
    return _finalize_closest(o, d, s, shape)


def _make_closest_body(geom, o, d, iota_d):
    """Closest-hit body over explicit ray args (for the compacted tail).
    Leaf action records only (t, packed winner); attributes are
    reconstructed after the walk (``_reconstruct_hit``).

    Both actions are gated by SCALAR any-lane conditions: an iteration
    where no lane in the buffer has a pending leaf (the first iterations
    after the dense root seed; mostly-dead bounce/NEE walks) skips the
    whole leaf gather + MT block (~70%% of the measured full-width body,
    tools/prof_r3.py part D), and a pure-leaf drain phase likewise skips
    the node gather + descend."""
    inv_d = _safe_inv(d)
    octant = _ray_octant(d)
    oe = o.map(lambda c: c[:, None])
    de = d.map(lambda c: c[:, None])

    def leaf_action(st):
        best_t = st["t"]
        has_leaf = st["mask_l"] != 0
        blk = jnp.clip(st["base_l"] + _lsb_slot(st["mask_l"]), 0,
                       geom.num_tri_blocks - 1)
        # one tri-row gather; MT vectorized across the whole block
        if MT_CM:
            v0, e1, e2, mesh_id, _ = _fetch_leaf_cm(geom, blk)
            ok, t, _, _ = _mt_test(v0, e1, e2,
                                   o.map(lambda c: c[None, :]),
                                   d.map(lambda c: c[None, :]),
                                   T_MIN, best_t[None, :])
            ok = ok & has_leaf[None, :] & (mesh_id >= 0)
            tm = jnp.where(ok, t, jnp.inf)
            tbest = jnp.min(tm, axis=0)
            slot = jnp.argmin(tm, axis=0).astype(jnp.int32)
        else:
            v0, e1, e2, mesh_id, _ = _fetch_leaf(geom, blk)
            ok, t, _, _ = _mt_test(v0, e1, e2, oe, de, T_MIN,
                                   best_t[:, None])
            ok = ok & has_leaf[:, None] & (mesh_id >= 0)
            tm = jnp.where(ok, t, jnp.inf)
            tbest = jnp.min(tm, axis=-1)
            slot = jnp.argmin(tm, axis=-1).astype(jnp.int32)
        found = tbest < best_t
        return dict(
            st,
            mask_l=st["mask_l"] & (st["mask_l"] - 1),
            t=jnp.where(found, tbest, best_t),
            best=jnp.where(found, blk * LEAF_SIZE + slot, st["best"]),
        )

    pop = _pop_cur_cm if STACK_CM else _pop_cur

    def body_full(s):
        st, k = s
        st = pop(st, iota_d)
        st = leaf_action(st)
        st = _descend(st, geom, o, inv_d, st["t"], iota_d, octant,
                      cm=bool(STACK_CM))
        return st, k + 1

    def body_node_only(s):
        """Leaf-free variant for the pre-phase while (``_run_walk``): no
        tri-table reference at all, so the 36 ms leaf gather+MT block
        (tools/prof_r3.py part D) never runs during the leaf-free head of
        the walk — and no table ever becomes a cond-branch operand (which
        GSPMD would re-shard and all-gather per iteration on a mesh)."""
        st, k = s
        st = pop(st, iota_d)
        st = _descend(st, geom, o, inv_d, st["t"], iota_d, octant,
                      cm=bool(STACK_CM))
        return st, k + 1

    if LEAF_EVERY > 1:
        # composed body: LEAF_EVERY-1 node-only sub-iterations, then full
        # (see LEAF_EVERY)
        def body_composed(s):
            for _ in range(LEAF_EVERY - 1):
                s = body_node_only(s)
            return body_full(s)
        return body_composed, body_node_only
    return body_full, body_node_only


def _any_state(geom: SceneGeometry, o: Vec3, d: Vec3, t_f,
               roots=None, scattered: bool = False,
               skip_pass1: bool = False) -> jnp.ndarray:
    """Any-hit walk over flat lanes; lanes with t_f <= 0 are dead.  With
    ``roots``, lanes start at per-lane subtree roots (batched instances).
    ``scattered`` selects the ladder compaction profile (see
    SCATTER_SHRINK).  ``skip_pass1``: see ``_walk_closest_raw`` — only
    with a STRUCTURAL live-count bound <= total/shrink."""
    if scattered:
        a_shrink, a_stages = ANY_SCATTER_SHRINK, ANY_SCATTER_STAGES
        leaf_n = ANY_LEAF_EVERY
    else:
        a_shrink, a_stages = ANY_COMPACT_SHRINK, ANY_COMPACT_STAGES
        # coherent any rays find occluders in their FIRST leaf — delaying
        # leaf tests delays the early-out 3.4x (see ANY_LEAF_EVERY)
        leaf_n = ANY_LEAF_EVERY_COH
    total = jnp.size(t_f)
    depth = geom.stack_depth
    iota_d = jnp.arange(depth, dtype=jnp.int32)

    state = _init_walk_state(total, depth, t_f > 0.0)
    state.update(hit=jnp.zeros((total,), bool))
    if roots is None:
        state = _seed_from_root(state, geom, o, d, t_f)
    else:
        state["base_i"] = roots

    def make_body(o_s, d_s, t_s):
        inv_d = _safe_inv(d_s)
        oe = o_s.map(lambda c: c[:, None])
        de = d_s.map(lambda c: c[:, None])

        def leaf_action(st):
            hit = st["hit"]
            has_leaf = st["mask_l"] != 0
            blk = jnp.clip(st["base_l"] + _lsb_slot(st["mask_l"]), 0,
                           geom.num_tri_blocks - 1)
            if MT_CM:
                v0, e1, e2, mesh_id, opaque = _fetch_leaf_cm(geom, blk)
                ok, _, _, _ = _mt_test(v0, e1, e2,
                                       o_s.map(lambda c: c[None, :]),
                                       d_s.map(lambda c: c[None, :]),
                                       T_MIN, t_s[None, :])
                ok = ok & opaque & (mesh_id >= 0)
                hit = hit | (jnp.any(ok, axis=0) & has_leaf)
            else:
                v0, e1, e2, mesh_id, opaque = _fetch_leaf(geom, blk)
                ok, _, _, _ = _mt_test(v0, e1, e2, oe, de, T_MIN,
                                       t_s[:, None])
                ok = ok & opaque & (mesh_id >= 0)
                hit = hit | (jnp.any(ok, axis=-1) & has_leaf)
            return dict(st, mask_l=st["mask_l"] & (st["mask_l"] - 1),
                        hit=hit)

        def _early_out(st):
            # a found occlusion kills the lane's remaining work
            hit = st["hit"]
            return dict(
                st,
                mask_i=jnp.where(hit, 0, st["mask_i"]),
                mask_l=jnp.where(hit, 0, st["mask_l"]),
                sp=jnp.where(hit, 0, st["sp"]),
            )

        pop = _pop_cur_cm if STACK_CM else _pop_cur

        def body_full(s):
            st, k = s
            st = pop(st, iota_d)
            st = leaf_action(st)
            st = _descend(st, geom, o_s, inv_d, t_s, iota_d,
                          cm=bool(STACK_CM))
            return _early_out(st), k + 1

        def body_node(s):
            # leaf-free pre-phase variant (see _run_walk)
            st, k = s
            st = pop(st, iota_d)
            st = _descend(st, geom, o_s, inv_d, t_s, iota_d,
                          cm=bool(STACK_CM))
            return _early_out(st), k + 1

        if leaf_n > 1:
            def body_composed(s):
                for _ in range(leaf_n - 1):
                    s = body_node(s)
                return body_full(s)
            return body_composed, body_node
        return body_full, body_node

    def loop_fac(st, o_s, d_s, t_s, to_completion):
        b, bn = make_body(o_s, d_s, t_s)
        return _run_walk(b, st, to_completion, shrink=a_shrink,
                         body_node=bn)

    if total < MIN_COMPACT_LANES:
        body, body_node = make_body(o, d, t_f)
        s = _run_walk(body, state, True, body_node=body_node)
    elif skip_pass1:
        s = _compact_finish(loop_fac, state, o, d, extras=(t_f,),
                            stages=a_stages, result_keys=("hit",),
                            shrink=a_shrink, stack_cm=bool(STACK_CM))
    else:
        body, body_node = make_body(o, d, t_f)
        s = _run_walk(body, state, False,
                      shrink=a_shrink, body_node=body_node)
        s = _compact_finish(loop_fac, s, o, d, extras=(t_f,),
                            stages=a_stages, result_keys=("hit",),
                            shrink=a_shrink, stack_cm=bool(STACK_CM))
    return s["hit"]


# packet any-hit (render/packet.py): ONE walk per 8x8 pixel tile — measured
# 6.8x on 1080p shadow rays (the gathers amortize across the tile and
# occluded packets early-out).  Enabled for pixel-grid wavefronts via the
# ``coherent`` hint; PTRT_PACKET_ANY=0 forces the per-ray walk.
PACKET_ANY = _env_int("PTRT_PACKET_ANY", 1, 0, 1)
_PK_TH = 8
_PK_TW = 8
# any-hit packet->per-ray handoff (see _PKC_HANDOFF_SHRINK): 0 disables
# (pure packet walk with packet-granularity compaction).  TPU sweep
# (prof_r3 part M, 1080p primary-hit shadow rays, 1M tris): per-ray
# 222.9 ms / pure packet 2004.6 (surface-origin packets have huge
# conservative tails) / handoff 16: 129.6 ms — 1.7x per-ray, exact.
_PKA_HANDOFF_SHRINK = _env_int("PTRT_PKA_HANDOFF_SHRINK", 16, 0, 256)
# below this wavefront size the per-ray walk is used even with
# coherent=True (packet bookkeeping only pays off at scale); tests set
# PTRT_PK_MIN_PIXELS=0 to exercise the packet path on tiny frames
_PK_MIN_PIXELS = _env_int("PTRT_PK_MIN_PIXELS", 16384, 0, 1 << 30)


def _packet_any_grid(gs, o: Vec3, d: Vec3, t_max, shape) -> jnp.ndarray:
    """Any-hit over a (..., H, W) pixel-grid wavefront via tile packets.
    H/W are padded to tile multiples with dead rays (t = -1); the padded
    rays never hit and are cropped away."""
    from ptrt_tpu.render import packet as pk

    prep, unprep = _grid_packet_ctx(shape, _PK_TH, _PK_TW)
    o_p = o.map(lambda c: prep(c, 0.0))
    d_p = d.map(lambda c: prep(c, 1.0))
    t_p = prep(jnp.asarray(t_max, jnp.float32), -1.0)

    if _PKA_HANDOFF_SHRINK:
        # packet HEAD + per-ray tail: rays of unfinished packets that are
        # not yet proven occluded re-run through the per-ray any walk
        hit_p, unfin = pk.packet_any_partial(gs, o_p, d_p, t_p,
                                             shrink=_PKA_HANDOFF_SHRINK)
        pending = unprep(jnp.logical_not(hit_p) & unfin[:, None]
                         & (t_p > 0.0))
        hit = unprep(hit_p)
        return hit | _per_ray_any_tail(gs, o, d, t_max, pending, shape)
    hit = pk.packet_any(gs, o_p, d_p, t_p)
    return unprep(hit)


def _per_ray_any_tail(gs, o: Vec3, d: Vec3, t_max, pending,
                      shape) -> jnp.ndarray:
    """Shared per-ray any-hit tail for packet-handoff rays: walks only the
    ``pending`` lanes (others enter dead with t = -1)."""
    t_ray = jnp.where(pending,
                      jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                                       shape), -1.0)
    hit_ray = _any_state(
        gs, o.broadcast_to(shape).map(jnp.ravel),
        d.broadcast_to(shape).map(jnp.ravel),
        t_ray.reshape(-1), scattered=True,
        skip_pass1=_PKA_HANDOFF_SHRINK >= ANY_SCATTER_SHRINK)
    return hit_ray.reshape(shape)


def _packet_any_heads_routed(gs, o: Vec3, d: Vec3, t_b, li_b,
                             n_groups: int, shape):
    """Per-light packet HEAD walks for routed NEE wavefronts.  Runs ONE
    masked packet head per light group but accumulates the unfinished
    pending lanes across groups so the caller can run a SINGLE shared
    per-ray tail over the union — an n-light scene compiles n packet heads
    + 1 tail instead of n of each (each embedded tail is a full-wavefront
    walk body; program size and compile time scaled with n_light_groups).
    Exact: a lane is pending only in its own group's head (other groups
    mask it dead with t = -1), so the union tail computes the same per-lane
    predicate as per-group tails did."""
    from ptrt_tpu.render import packet as pk

    prep, unprep = _grid_packet_ctx(shape, _PK_TH, _PK_TW)
    o_p = o.map(lambda c: prep(c, 0.0))
    d_p = d.map(lambda c: prep(c, 1.0))
    hit_g = jnp.zeros(shape, bool)
    pending_u = jnp.zeros(shape, bool)
    for ell in range(n_groups):
        sel = li_b == ell
        t_p = prep(jnp.where(sel, t_b, -1.0), -1.0)
        if _PKA_HANDOFF_SHRINK:
            hit_p, unfin = pk.packet_any_partial(gs, o_p, d_p, t_p,
                                                 shrink=_PKA_HANDOFF_SHRINK)
            pend = unprep(jnp.logical_not(hit_p) & unfin[:, None]
                          & (t_p > 0.0))
            pending_u = pending_u | (pend & sel)
        else:
            hit_p = pk.packet_any(gs, o_p, d_p, t_p)
        hit_g = jnp.where(sel, unprep(hit_p), hit_g)
    if _PKA_HANDOFF_SHRINK:
        hit_g = hit_g | _per_ray_any_tail(gs, o, d, t_b, pending_u, shape)
    return hit_g


def intersect_any(geom, o: Vec3, d: Vec3, t_max,
                  coherent: bool = False,
                  scattered: bool = False,
                  light_id=None, n_light_groups: int = 0) -> jnp.ndarray:
    """Shadow any-hit; skips transmissive occluders, matching
    ``bvh_any_hit_tlas`` (``intersection.cuh:481-524``).  Accepts a flat
    ``SceneGeometry`` or a two-level ``WorldGeometry``.

    ``coherent=True`` marks the wavefront as a pixel grid (trailing two
    dims = H, W): the static-world walk then runs per 8x8-tile PACKET
    (``render/packet.py``) — exact, and measured 6.8x faster on 1080p
    shadow rays.

    ``scattered=True`` marks a bounce/env-NEE wavefront: the walk uses
    the ladder compaction profile (ANY_SCATTER_SHRINK).

    ``light_id`` (+ ``n_light_groups``): per-lane target-group index for
    coherent NEE wavefronts.  The packet walk runs once PER GROUP with the
    other lanes masked dead, and each lane takes its own group's result —
    a packet of rays aimed at one shared light has tight direction
    intervals, while a mixed packet degenerates to a near-full-tree sweep
    (round-3 postmortem).  Exact: the union of the masked passes is the
    same per-lane predicate."""
    from ptrt_tpu.geometry.scene_geom import WorldGeometry

    shape = jnp.broadcast_shapes(jnp.shape(o.x), jnp.shape(d.x),
                                 jnp.shape(t_max))
    total = 1
    for sdim in shape:
        total *= sdim
    gs = geom.static if isinstance(geom, WorldGeometry) else geom
    use_pk = (coherent and PACKET_ANY and len(shape) >= 2
              and total >= _PK_MIN_PIXELS)
    if use_pk and light_id is not None and n_light_groups > 1:
        t_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), shape)
        li_b = jnp.broadcast_to(light_id, shape)
        hit_g = _packet_any_heads_routed(gs, o, d, t_b, li_b,
                                         n_light_groups, shape)
    elif use_pk:
        hit_g = _packet_any_grid(gs, o, d, t_max, shape)
    o = o.broadcast_to(shape).map(lambda c: c.reshape(total))
    d = d.broadcast_to(shape).map(lambda c: c.reshape(total))
    t_f = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                           shape).reshape(total)

    hit = (hit_g.reshape(total) if use_pk
           else _any_state(gs, o, d, t_f, scattered=scattered))
    if isinstance(geom, WorldGeometry):
        if geom.iset is not None:
            hit = _instances_any_batched(geom.iset, o, d, t_f, hit)
        else:
            inv_d = _safe_inv(d)
            for inst in geom.instances:
                live = (_slab1(inst.bb_min, inst.bb_max, o, inv_d, t_f)
                        & jnp.logical_not(hit))
                o_l = _affine(inst.inv_rows, o)
                d_l = _linear(inst.inv_rows, d)
                hit = hit | _any_state(inst.geom, o_l, d_l,
                                       jnp.where(live, t_f, -1.0))
    return hit.reshape(shape)


# -- brute-force path (small scenes; gather-free) ---------------------------

_BRUTE_CHUNK = 512


def _brute_closest_state(geom: SceneGeometry, o: Vec3, d: Vec3, t0,
                         chunk: int = _BRUTE_CHUNK) -> dict:
    """All-pairs MT over triangle chunks; same state contract as
    ``_closest_state`` (so the instance merge is shared)."""
    m = geom.num_tri_slots
    n_chunks = max(1, -(-m // chunk))
    pad = n_chunks * chunk

    def padc(a):
        return jnp.pad(a, (0, pad - m))

    pv0 = geom.v0.map(padc)
    pe1 = geom.e1.map(padc)
    pe2 = geom.e2.map(padc)
    pmid = jnp.pad(geom.tri_mesh_id, (0, pad - m), constant_values=-1)

    shape = jnp.shape(t0)
    tri0 = jnp.full(shape, -1, jnp.int32)
    u0 = jnp.zeros(shape, jnp.float32)
    v0_ = jnp.zeros(shape, jnp.float32)

    oe = o.map(lambda c: c[..., None])
    de = d.map(lambda c: c[..., None])

    def body(ci, state):
        best_t, best_tri, best_u, best_v = state
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, ci * chunk, chunk)
        cv0 = pv0.map(sl)
        ce1 = pe1.map(sl)
        ce2 = pe2.map(sl)
        cmid = sl(pmid)
        ok, t, uu, vv = _mt_test(cv0, ce1, ce2, oe, de, T_MIN,
                                 best_t[..., None])
        ok = ok & (cmid >= 0)
        t = jnp.where(ok, t, jnp.inf)
        j = jnp.argmin(t, axis=-1)
        tbest = jnp.take_along_axis(t, j[..., None], axis=-1)[..., 0]
        found = jnp.isfinite(tbest)
        tri_idx = (ci * chunk + j).astype(jnp.int32)
        best_tri = jnp.where(found, tri_idx, best_tri)
        best_u = jnp.where(
            found, jnp.take_along_axis(uu, j[..., None], -1)[..., 0], best_u)
        best_v = jnp.where(
            found, jnp.take_along_axis(vv, j[..., None], -1)[..., 0], best_v)
        best_t = jnp.where(found, tbest, best_t)
        return best_t, best_tri, best_u, best_v

    best_t, best_tri, best_u, best_v = jax.lax.fori_loop(
        0, n_chunks, body, (t0, tri0, u0, v0_)
    )

    found = best_tri >= 0
    idx = jnp.maximum(best_tri, 0)

    def g3(v: Vec3):
        return Vec3(jnp.take(v.x, idx, axis=0), jnp.take(v.y, idx, axis=0),
                    jnp.take(v.z, idx, axis=0))

    nrm = cross(g3(geom.e1), g3(geom.e2))
    mesh = jnp.where(found, jnp.take(geom.tri_mesh_id, idx, axis=0), -1)
    return dict(t=best_t, u=best_u, v=best_v, nrm=nrm, mesh=mesh)


def intersect_closest_brute(geom, o: Vec3, d: Vec3, t_max=T_MAX,
                            chunk: int = _BRUTE_CHUNK) -> Hit:
    """All-pairs MT over triangle chunks; pure elementwise VPU work.

    Equivalent semantics to ``intersect_closest`` (including WorldGeometry
    dispatch); preferred when the scene has few triangles (the (R, C)
    broadcast beats gather-heavy traversal).
    """
    from ptrt_tpu.geometry.scene_geom import WorldGeometry

    shape = jnp.broadcast_shapes(jnp.shape(o.x), jnp.shape(d.x),
                                 jnp.shape(jnp.asarray(t_max)))
    total = 1
    for sdim in shape:
        total *= sdim
    o = o.broadcast_to(shape).map(lambda c: c.reshape(total))
    d = d.broadcast_to(shape).map(lambda c: c.reshape(total))
    t0 = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                          shape).reshape(total)

    runner = lambda g, oo, dd, tt: _brute_closest_state(g, oo, dd, tt, chunk)
    if isinstance(geom, WorldGeometry):
        s = runner(geom.static, o, d, t0)
        inv_d = _safe_inv(d)
        for inst in geom.instances:
            s = _merge_instance_closest(s, inst, o, d, inv_d, runner)
    else:
        s = runner(geom, o, d, t0)
    return _finalize_closest(o, d, s, shape)


def _brute_any_state(geom: SceneGeometry, o: Vec3, d: Vec3, t_f,
                     chunk: int = _BRUTE_CHUNK) -> jnp.ndarray:
    m = geom.num_tri_slots
    n_chunks = max(1, -(-m // chunk))
    pad = n_chunks * chunk

    def padc(a):
        return jnp.pad(a, (0, pad - m))

    pv0 = geom.v0.map(padc)
    pe1 = geom.e1.map(padc)
    pe2 = geom.e2.map(padc)
    popq = jnp.pad(geom.tri_shadow_opaque, (0, pad - m))

    oe = o.map(lambda c: c[..., None])
    de = d.map(lambda c: c[..., None])

    def body(ci, hit):
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, ci * chunk, chunk)
        ok, _, _, _ = _mt_test(pv0.map(sl), pe1.map(sl), pe2.map(sl),
                               oe, de, T_MIN, t_f[..., None])
        ok = ok & sl(popq)
        return hit | jnp.any(ok, axis=-1)

    return jax.lax.fori_loop(0, n_chunks, body,
                             jnp.zeros(jnp.shape(t_f), bool))


def intersect_any_brute(geom, o: Vec3, d: Vec3, t_max,
                        chunk: int = _BRUTE_CHUNK) -> jnp.ndarray:
    from ptrt_tpu.geometry.scene_geom import WorldGeometry

    shape = jnp.broadcast_shapes(jnp.shape(o.x), jnp.shape(d.x),
                                 jnp.shape(t_max))
    total = 1
    for sdim in shape:
        total *= sdim
    o = o.broadcast_to(shape).map(lambda c: c.reshape(total))
    d = d.broadcast_to(shape).map(lambda c: c.reshape(total))
    t_f = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                           shape).reshape(total)

    hit = _brute_any_state(
        geom.static if isinstance(geom, WorldGeometry) else geom,
        o, d, t_f, chunk)
    if isinstance(geom, WorldGeometry):
        inv_d = _safe_inv(d)
        for inst in geom.instances:
            live = (_slab1(inst.bb_min, inst.bb_max, o, inv_d, t_f)
                    & jnp.logical_not(hit))
            o_l = _affine(inst.inv_rows, o)
            d_l = _linear(inst.inv_rows, d)
            hit = hit | (_brute_any_state(inst.geom, o_l, d_l, t_f, chunk)
                         & live)
    return hit.reshape(shape)
