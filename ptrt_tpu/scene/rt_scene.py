"""RT Scene — the fast one-bounce ray-tracer backend.

Host rebuild of ``raytracer/RTscene.cuh``'s ``Scene`` class
(``RTscene.cuh:765-1236``): meshes + materials + lights + camera + ambient +
sky gradient; ``upload_to_gpu`` assembles device geometry; the frame is the
megakernel equivalent (``render_kernel``, ``RTscene.cuh:1240-1293``):
primary ray -> one-bounce PBR shade (render/rt_shading.py) -> Reinhard +
gamma 2.2 -> RGB8.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ptrt_tpu.core.vec import Vec3, clamp, lerp
from ptrt_tpu.geometry.mesh import Mesh
from ptrt_tpu.geometry.scene_geom import assemble_geometry
from ptrt_tpu.render import rt_shading, traverse
from ptrt_tpu.scene.camera import Camera, pixel_grid
from ptrt_tpu.scene.lights import Light, LightTable
from ptrt_tpu.scene.materials import Material, MaterialTable
from ptrt_tpu.utils.imageio import save_ppm

BRUTE_FORCE_TRI_THRESHOLD = 192


class RTScene:
    def __init__(self, width: int, height: int):
        self.width = int(width)
        self.height = int(height)
        self.meshes: list[Mesh] = []
        self.mesh_materials: list[Material] = []
        self.lights: list[Light] = []
        self.camera = Camera.make((0.0, 0.0, 0.0), (0.0, 0.0, -1.0),
                                  aspect_ratio=width / height)
        self.ambient_light = (0.03, 0.03, 0.03)
        self.sky_color_top = (0.5, 0.7, 1.0)
        self.sky_color_bottom = (1.0, 1.0, 1.0)
        self.use_sky = True
        self._geom = None
        self._mat_table = None
        self._light_table = None
        self._dirty = True

    # -- scene building (same factory surface as the PT scene) --------------
    def add_mesh(self, mesh_or_path, material: Material | None = None) -> Mesh:
        mesh = (mesh_or_path if isinstance(mesh_or_path, Mesh)
                else Mesh(mesh_or_path))
        self.meshes.append(mesh)
        self.mesh_materials.append(material or Material())
        self._dirty = True
        return mesh

    def add_triangles(self, tris, material: Material | None = None) -> Mesh:
        return self.add_mesh(Mesh.from_triangles(np.asarray(tris)), material)

    def add_plane_xz(self, plane_y, half_size,
                     material: Material | None = None) -> Mesh:
        return self.add_mesh(Mesh.plane_xz(plane_y, half_size),
                             material or Material.make((0.8, 0.8, 0.8)))

    def add_sphere(self, segments: int = 32,
                   material: Material | None = None) -> Mesh:
        return self.add_mesh(Mesh.sphere(segments),
                             material or Material.make((1.0, 0.0, 0.0)))

    def add_cube(self, material: Material | None = None) -> Mesh:
        return self.add_mesh(Mesh.cube(),
                             material or Material.make((1.0, 0.0, 0.0)))

    def add_checkerboard_plane_xz(self, plane_y, tiles_per_side, tile_size,
                                  white_mat: Material, black_mat: Material):
        w, b = Mesh.checkerboard_plane_xz(plane_y, tiles_per_side, tile_size)
        self.add_mesh(w, white_mat)
        self.add_mesh(b, black_mat)

    def add_point_light(self, position, color=(1, 1, 1), intensity=1.0,
                        range=100.0) -> Light:
        lt = Light.point(position, color, intensity, range)
        self.lights.append(lt)
        self._dirty = True
        return lt

    def add_directional_light(self, direction, color=(1, 1, 1),
                              intensity=1.0) -> Light:
        lt = Light.directional(direction, color, intensity)
        self.lights.append(lt)
        self._dirty = True
        return lt

    def add_spot_light(self, position, direction, color=(1, 1, 1),
                       intensity=1.0, inner_cone=0.5,
                       outer_cone=0.7, range=100.0) -> Light:
        """Cone angles in radians, like the reference API."""
        lt = Light.spot(position, direction, color, intensity, range,
                        inner_cone, outer_cone)
        self.lights.append(lt)
        self._dirty = True
        return lt

    def set_camera(self, lookfrom, lookat, vup=(0, 1, 0), fov=60.0,
                   aperture=0.0, focus_dist=None) -> None:
        if focus_dist is None:
            lf = np.asarray(lookfrom, np.float64)
            la = np.asarray(lookat, np.float64)
            focus_dist = float(np.linalg.norm(la - lf))
        self.camera = Camera.make(lookfrom, lookat, vup, fov,
                                  self.width / self.height, aperture,
                                  focus_dist)

    def set_ambient_light(self, color) -> None:
        self.ambient_light = tuple(color)

    def set_sky_gradient(self, top, bottom) -> None:
        self.sky_color_top = tuple(top)
        self.sky_color_bottom = tuple(bottom)
        self.use_sky = True

    # -- device assembly -----------------------------------------------------
    def upload_to_gpu(self) -> None:
        """``uploadToGPU`` (``RTscene.cuh:1022-1095``).

        RT shadow rays skip any mesh with transmission > 0
        (``RTscene.cuh:593-595``), hence threshold 0.0 here.
        """
        # assemble treats transmission<=0.5 as shadow-opaque; RT skips ANY
        # transmission>0 occluder, so remap to 1.0/0.0 before the threshold
        self._geom = assemble_geometry(
            self.meshes,
            [1.0 if m.transmission > 0.0 else 0.0
             for m in self.mesh_materials])
        self._mat_table = MaterialTable.from_materials(self.mesh_materials)
        self._light_table = LightTable.from_lights(self.lights)
        self._dirty = False

    def _ensure(self):
        if self._dirty or self._geom is None:
            self.upload_to_gpu()

    def _has_glass(self) -> bool:
        return any(m.transmission > 0.0 and m.metallic < 0.1
                   for m in self.mesh_materials)

    def _use_brute(self) -> bool:
        return sum(m.num_triangles for m in self.meshes) <= \
            BRUTE_FORCE_TRI_THRESHOLD

    # -- rendering -----------------------------------------------------------
    def render_frame_device(self):
        self._ensure()
        fn = _rt_frame_program(self.width, self.height, len(self.lights),
                               self._use_brute(), self._has_glass())
        return fn(self._geom, self._mat_table, self._light_table,
                  self.camera,
                  Vec3(*[jnp.float32(c) for c in self.ambient_light]),
                  Vec3(*[jnp.float32(c) for c in self.sky_color_top]),
                  Vec3(*[jnp.float32(c) for c in self.sky_color_bottom]),
                  jnp.float32(1.0 if self.use_sky else 0.0))

    def render_frame(self) -> np.ndarray:
        return np.asarray(jax.device_get(self.render_frame_device()))

    def render(self, out_path: str | None = None) -> np.ndarray:
        """``Scene::render`` host-buffer path (``RTscene.cuh:1097-1127``)."""
        img = self.render_frame()
        if out_path:
            save_ppm(out_path, img)
        return img

    def save_as_ppm(self, path: str, img: np.ndarray | None = None) -> None:
        """``saveAsPPM`` ASCII P3 (``RTscene.cuh:1213-1228``)."""
        if img is None:
            img = self.render_frame()
        save_ppm(path, img)


_rt_cache: dict = {}


def _rt_frame_program(width: int, height: int, n_lights: int, use_brute: bool,
                      has_glass: bool):
    key = (width, height, n_lights, use_brute, has_glass)
    if key in _rt_cache:
        return _rt_cache[key]

    def fn(geom, mats, lights, camera, ambient, sky_top, sky_bottom, use_sky):
        if use_brute:
            closest = lambda o, d: traverse.intersect_closest_brute(geom, o, d)
            any_hit = lambda o, d, t: traverse.intersect_any_brute(geom, o, d, t)
        else:
            closest = lambda o, d: traverse.intersect_closest(geom, o, d)
            any_hit = lambda o, d, t: traverse.intersect_any(geom, o, d, t)

        s, t = pixel_grid(width, height)
        ray = camera.get_ray_simple(s, t)
        hit = closest(ray.origin, ray.direction)

        shaded = rt_shading.shade_primary(
            geom, mats, lights, n_lights, ambient, sky_top, sky_bottom,
            use_sky, hit, ray.direction, closest, any_hit, has_glass)
        sky = rt_shading.sample_sky_rt(ray.direction, sky_top, sky_bottom,
                                       use_sky)
        from ptrt_tpu.core.vec import where as vwhere

        color = vwhere(hit.hit, shaded, sky)

        # Reinhard + gamma 2.2 (RTscene.cuh:1274-1283)
        color = color / (color + 1.0)
        g = 0.4545454545
        color = Vec3(jnp.power(jnp.maximum(color.x, 0.0), g),
                     jnp.power(jnp.maximum(color.y, 0.0), g),
                     jnp.power(jnp.maximum(color.z, 0.0), g))
        arr = jnp.stack([color.x, color.y, color.z], axis=-1)
        rgb8 = jnp.clip(arr * 255.0, 0, 255).astype(jnp.uint8)
        return rgb8[::-1]  # bottom-up t -> top-down image rows

    from ptrt_tpu.utils.aotcache import aot_jit

    _rt_cache[key] = aot_jit(("rt_frame",) + key, fn)
    return _rt_cache[key]
