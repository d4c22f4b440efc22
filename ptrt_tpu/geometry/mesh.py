"""Triangle meshes: OBJ loading, primitive generators, vertex-baking edits.

Host-side equivalent of ``pathtracer/scene/mesh.cuh`` and
``raytracer/RTmesh.cuh``: numpy vertex/face storage, the same OBJ parser
semantics (v/f only, fan triangulation, negative indices, centroid
auto-recenter — ``mesh.cuh:238-323``), the same primitive factories
(unit cube default ctor ``mesh.cuh:224-231``; sphere / planeXZ /
checkerboard — ``RTscene.cuh:865-973``), the vertex-baking transform edits
(``RTmesh.cuh:598-656``) and a ``Transform3D`` for dynamic instancing.

Device upload happens at scene-assembly time (geometry/scene_geom.py), where
world-space triangles are packed SoA and the BVH is built.
"""

from __future__ import annotations

import numpy as np

from ptrt_tpu.core.vec import PI, TWO_PI
from ptrt_tpu.geometry.transform import AABB, Transform3D, _rot_xyz


class Mesh:
    # class-level default (some factories build via __new__): True opts a
    # dynamic mesh's per-frame refills into the Morton-sorted DEVICE
    # rebuild (geometry/lbvh.py) instead of a plain AABB refit — keeps
    # tree quality under arbitrary re-shapes, still zero host work
    device_lbvh = False

    def __init__(self, path: str | None = None):
        self.transform = Transform3D()
        self.is_dynamic = False
        self.verts_dirty = True  # topology/vertex change -> BVH rebuild
        if path is None:
            # default: unit cube (mesh.cuh:224-231)
            self.vertices = np.array(
                [[-0.5, -0.5, -0.5], [0.5, -0.5, -0.5], [0.5, 0.5, -0.5],
                 [-0.5, 0.5, -0.5], [-0.5, -0.5, 0.5], [0.5, -0.5, 0.5],
                 [0.5, 0.5, 0.5], [-0.5, 0.5, 0.5]], np.float32)
            self.faces = np.array(
                [[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7], [0, 1, 5],
                 [0, 5, 4], [3, 7, 6], [3, 6, 2], [0, 4, 7], [0, 7, 3],
                 [1, 2, 6], [1, 6, 5]], np.int32)
        else:
            self.vertices, self.faces = load_obj(path, recenter=True)

    # -- factories -----------------------------------------------------------
    @staticmethod
    def from_arrays(vertices: np.ndarray, faces: np.ndarray) -> "Mesh":
        m = Mesh.__new__(Mesh)
        m.transform = Transform3D()
        m.is_dynamic = False
        m.verts_dirty = True
        m.vertices = np.asarray(vertices, np.float32).reshape(-1, 3)
        m.faces = np.asarray(faces, np.int32).reshape(-1, 3)
        return m

    @staticmethod
    def from_triangles(tris: np.ndarray) -> "Mesh":
        """tris: (N, 3, 3) — three vertices per triangle
        (``RTscene.cuh:865-884`` addTriangles)."""
        tris = np.asarray(tris, np.float32).reshape(-1, 3, 3)
        n = tris.shape[0]
        verts = tris.reshape(-1, 3)
        faces = np.arange(n * 3, dtype=np.int32).reshape(n, 3)
        return Mesh.from_arrays(verts, faces)

    @staticmethod
    def cube() -> "Mesh":
        return Mesh()

    @staticmethod
    def plane_xz(plane_y: float, half_size: float) -> "Mesh":
        """Two-triangle ground plane (``RTscene.cuh:886-898``)."""
        A = (-half_size, plane_y, -half_size)
        B = (half_size, plane_y, -half_size)
        C = (half_size, plane_y, half_size)
        D = (-half_size, plane_y, half_size)
        return Mesh.from_triangles(np.array([[A, C, B], [A, D, C]]))

    @staticmethod
    def sphere(segments: int = 32, radius: float = 0.5) -> "Mesh":
        """Lat-long sphere (``RTscene.cuh:900-935``)."""
        rings = sectors = segments
        r = np.arange(rings + 1)
        s = np.arange(sectors + 1)
        phi = PI * r / rings
        theta = TWO_PI * s / sectors
        y = np.cos(phi) * radius
        ring_r = np.sin(phi) * radius
        x = ring_r[:, None] * np.cos(theta)[None, :]
        z = ring_r[:, None] * np.sin(theta)[None, :]
        verts = np.stack(
            [x, np.broadcast_to(y[:, None], x.shape), z], axis=-1
        ).reshape(-1, 3)
        rr, ss = np.meshgrid(np.arange(rings), np.arange(sectors), indexing="ij")
        curr = rr * (sectors + 1) + ss
        nxt = curr + sectors + 1
        # wind so cross(e1, e2) points OUTWARD: front_face must be true for
        # rays arriving from outside (the Beer-Lambert interior gate and the
        # glass eta selection key off it, path_logic.cuh:823-829)
        f1 = np.stack([curr, curr + 1, nxt], axis=-1)
        f2 = np.stack([curr + 1, nxt + 1, nxt], axis=-1)
        faces = np.concatenate([f1.reshape(-1, 3), f2.reshape(-1, 3)], axis=0)
        return Mesh.from_arrays(verts, faces)

    @staticmethod
    def checkerboard_plane_xz(plane_y: float, tiles_per_side: int,
                              tile_size: float):
        """Returns (white_mesh, black_mesh) (``RTscene.cuh:937-973``)."""
        N = tiles_per_side
        start = -N * tile_size
        white, black = [], []
        for iz in range(2 * N):
            for ix in range(2 * N):
                x0 = start + ix * tile_size
                x1 = x0 + tile_size
                z0 = start + iz * tile_size
                z1 = z0 + tile_size
                A = (x0, plane_y, z0)
                B = (x1, plane_y, z0)
                C = (x1, plane_y, z1)
                D = (x0, plane_y, z1)
                bucket = white if ((ix + iz) & 1) == 0 else black
                bucket.append([A, C, B])
                bucket.append([A, D, C])
        return (Mesh.from_triangles(np.array(white)),
                Mesh.from_triangles(np.array(black)))

    # -- vertex-baking edits (``RTmesh.cuh:598-656``) ------------------------
    def scale_verts(self, s) -> "Mesh":
        self.vertices = self.vertices * np.float32(s)
        self.verts_dirty = True
        return self

    def translate_verts(self, dx, dy, dz) -> "Mesh":
        self.vertices = self.vertices + np.array([dx, dy, dz], np.float32)
        self.verts_dirty = True
        return self

    def move_to(self, x, y, z) -> "Mesh":
        centroid = self.vertices.mean(axis=0)
        self.vertices = self.vertices - centroid + np.array([x, y, z], np.float32)
        self.verts_dirty = True
        return self

    def rotate_self_euler_xyz(self, rx, ry, rz) -> "Mesh":
        r = _rot_xyz(rx, ry, rz).astype(np.float32)
        centroid = self.vertices.mean(axis=0)
        self.vertices = (self.vertices - centroid) @ r.T + centroid
        self.verts_dirty = True
        return self

    def set_triangles(self, tris: np.ndarray) -> "Mesh":
        """Replace geometry wholesale — the per-frame procedural-geometry hook
        (fluid surfaces etc., ``PTRTtransfer.cuh:2250-2270``)."""
        tris = np.asarray(tris, np.float32).reshape(-1, 3, 3)
        self.vertices = tris.reshape(-1, 3)
        self.faces = np.arange(len(tris) * 3, dtype=np.int32).reshape(-1, 3)
        self.verts_dirty = True
        return self

    # -- queries -------------------------------------------------------------
    @property
    def num_triangles(self) -> int:
        return int(self.faces.shape[0])

    def local_aabb(self) -> AABB:
        return AABB.of_points(self.vertices)

    def world_aabb(self) -> AABB:
        return self.local_aabb().transformed(self.transform.world_matrix())

    def world_vertices(self) -> np.ndarray:
        m = self.transform.world_matrix()
        return (self.vertices @ m[:3, :3].T + m[:3, 3]).astype(np.float32)

    def triangle_arrays(self, world: bool = True):
        """(v0, v1, v2) arrays of shape (T, 3)."""
        v = self.world_vertices() if world else self.vertices
        f = self.faces
        return v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]


def load_obj(path: str, recenter: bool = True):
    """Minimal OBJ parser with the reference's exact semantics
    (``mesh.cuh:238-323``): only ``v``/``f`` records, fan triangulation,
    1-based and negative indices, ``v/vt/vn`` attribute suffixes ignored,
    centroid recentering."""
    verts: list = []
    faces: list = []
    with open(path, "r", errors="replace") as fh:
        for line in fh:
            if not line or line[0] == "#":
                continue
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "v" and len(parts) >= 4:
                try:
                    verts.append(
                        (float(parts[1]), float(parts[2]), float(parts[3]))
                    )
                except ValueError:
                    continue
            elif parts[0] == "f":
                idx = []
                for tok in parts[1:]:
                    head = tok.split("/")[0]
                    if not head:
                        continue
                    try:
                        i = int(head)
                    except ValueError:
                        continue
                    idx.append(len(verts) + i if i < 0 else i - 1)
                for k in range(1, len(idx) - 1):
                    faces.append((idx[0], idx[k], idx[k + 1]))
    if not verts or not faces:
        raise ValueError(f"Mesh: no valid geometry in {path}")
    v = np.asarray(verts, np.float32)
    f = np.asarray(faces, np.int32)
    if recenter:
        v = v - v.mean(axis=0, dtype=np.float64).astype(np.float32)
    return v, f
