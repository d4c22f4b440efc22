"""Unit tests for the math substrate vs analytic values (SURVEY.md §4a)."""

import jax
import jax.numpy as jnp
import numpy as np

from ptrt_tpu.core import mat, rng as prng
from ptrt_tpu.core.vec import (
    Vec3,
    clamp_vector_soft,
    cross,
    dot,
    lerp,
    normalize,
    reflect,
    refract,
    vec3,
)
from ptrt_tpu.core import color
from ptrt_tpu.core.taa import halton, r2_jitter, taa_jitter
from ptrt_tpu.core.bluenoise import blue_noise_table, next_blue_noise


def v(x, y, z):
    return Vec3(jnp.float32(x), jnp.float32(y), jnp.float32(z))


class TestVec3:
    def test_dot_cross(self):
        a, b = v(1, 2, 3), v(4, 5, 6)
        assert np.isclose(float(dot(a, b)), 32.0)
        c = cross(a, b)
        assert np.allclose([float(c.x), float(c.y), float(c.z)], [-3, 6, -3])

    def test_normalize(self):
        n = normalize(v(3, 0, 4))
        assert np.allclose([float(n.x), float(n.y), float(n.z)], [0.6, 0, 0.8])

    def test_batched_soa(self):
        a = Vec3(jnp.arange(8.0), jnp.zeros(8), jnp.ones(8))
        b = a * 2.0 + vec3(1.0)
        assert b.x.shape == (8,)
        assert np.allclose(np.asarray(b.y), np.ones(8))

    def test_reflect(self):
        r = reflect(v(1, -1, 0), v(0, 1, 0))
        assert np.allclose([float(r.x), float(r.y), float(r.z)], [1, 1, 0])

    def test_refract_tir(self):
        # grazing entry from dense medium -> total internal reflection
        i = normalize(v(1, -0.05, 0))
        _, ok = refract(i, v(0, 1, 0), 1.5)
        assert not bool(ok)
        # normal incidence refracts
        _, ok2 = refract(v(0, -1, 0), v(0, 1, 0), 1.0 / 1.5)
        assert bool(ok2)

    def test_lerp(self):
        l = lerp(vec3(0.0), vec3(1.0), 0.25)
        assert np.isclose(float(l.x), 0.25)

    def test_clamp_vector_soft(self):
        c = clamp_vector_soft(v(100.0, 100.0, 100.0), 1.0)
        assert np.isclose(float(c.luminance()), 1.0, atol=1e-5)
        small = clamp_vector_soft(v(0.1, 0.2, 0.3), 1.0)
        assert np.isclose(float(small.y), 0.2)

    def test_pytree(self):
        a = v(1, 2, 3)
        out = jax.jit(lambda q: q * 2.0)(a)
        assert np.isclose(float(out.z), 6.0)


class TestMat:
    def test_trs_roundtrip(self):
        m = mat.trs(vec3(1.0, 2.0, 3.0), vec3(0.3, -0.2, 0.9), vec3(2.0, 2.0, 2.0))
        inv = mat.inverse(m)
        p = v(0.5, -1.0, 2.0)
        q = mat.transform_point(inv, mat.transform_point(m, p))
        assert np.allclose(
            [float(q.x), float(q.y), float(q.z)], [0.5, -1.0, 2.0], atol=1e-5
        )

    def test_look_at_maps_eye_to_origin(self):
        vm = mat.look_at(v(0, 0, 5), v(0, 0, 0), v(0, 1, 0))
        p = mat.transform_point(vm, v(0, 0, 5))
        assert np.allclose([float(p.x), float(p.y), float(p.z)], [0, 0, 0], atol=1e-6)
        # a point in front of the camera has negative view-space z (GL style)
        q = mat.transform_point(vm, v(0, 0, 0))
        assert float(q.z) < 0

    def test_perspective_projects_center(self):
        pm = mat.perspective(jnp.radians(60.0), 16 / 9, 0.1, 100.0)
        vm = mat.look_at(v(0, 0, 5), v(0, 0, 0), v(0, 1, 0))
        ndc, w = mat.project_point(pm @ vm, v(0, 0, 0))
        assert np.allclose([float(ndc.x), float(ndc.y)], [0, 0], atol=1e-6)
        assert float(w) > 0

    def test_normal_matrix_nonuniform_scale(self):
        m = mat.scale((2.0, 1.0, 1.0))
        nm = mat.normal_matrix(m)
        # normal of a plane x=const under x-stretch must stay along x
        n = mat.transform_normal(nm, v(1, 1, 0))
        # inverse-transpose shrinks the x component relative to y
        assert abs(float(n.x)) < abs(float(n.y))


class TestRNG:
    def test_uniform_range_and_determinism(self):
        s = prng.seed(jnp.arange(1024), jnp.zeros(1024, jnp.int32), 7)
        s2, u = prng.uniform(s)
        assert u.shape == (1024,)
        assert float(u.min()) >= 0.0 and float(u.max()) < 1.0
        _, u_again = prng.uniform(s)
        assert np.allclose(np.asarray(u), np.asarray(u_again))
        # advancing produces different numbers
        _, u2 = prng.uniform(s2)
        assert not np.allclose(np.asarray(u), np.asarray(u2))

    def test_uniform_mean(self):
        s = prng.seed(jnp.arange(1 << 14), jnp.zeros(1 << 14, jnp.int32), 0)
        _, u = prng.uniform(s)
        assert abs(float(u.mean()) - 0.5) < 0.01

    def test_cosine_hemisphere_distribution(self):
        s = prng.seed(jnp.arange(1 << 14), jnp.zeros(1 << 14, jnp.int32), 3)
        _, d = prng.sample_cosine_hemisphere(s)
        lens = np.asarray(d.length())
        assert np.allclose(lens, 1.0, atol=1e-4)
        assert float(d.z.min()) >= 0.0
        # E[cos(theta)] = 2/3 for cosine-weighted
        assert abs(float(d.z.mean()) - 2.0 / 3.0) < 0.01

    def test_onb_orthonormal(self):
        n = normalize(Vec3(jnp.linspace(-1, 1, 64), jnp.linspace(1, -1, 64), jnp.ones(64)))
        t, b = prng.ortho_normal_basis(n)
        assert np.allclose(np.asarray(dot(t, n)), 0.0, atol=1e-5)
        assert np.allclose(np.asarray(dot(b, n)), 0.0, atol=1e-5)
        assert np.allclose(np.asarray(t.length()), 1.0, atol=1e-4)

    def test_cone_sampling_within_cone(self):
        s = prng.seed(jnp.arange(4096), jnp.zeros(4096, jnp.int32), 1)
        axis = normalize(v(1, 2, 3)).broadcast_to((4096,))
        _, d = prng.sample_cone_direction(s, axis, jnp.float32(0.9))
        cosangle = np.asarray(dot(d, axis))
        assert cosangle.min() >= 0.9 - 1e-4

    def test_ggx_roughness_zero_is_normal(self):
        s = prng.seed(jnp.arange(64), jnp.zeros(64, jnp.int32), 2)
        n = v(0, 0, 1).broadcast_to((64,))
        _, h = prng.importance_sample_ggx(s, n, jnp.float32(0.001))
        assert float(np.asarray(dot(h, n)).min()) > 0.999


class TestColor:
    def test_aces_monotone_and_bounded(self):
        xs = Vec3(jnp.linspace(0, 20, 64), jnp.linspace(0, 20, 64), jnp.linspace(0, 20, 64))
        out = color.aces_tonemap(xs)
        o = np.asarray(out.x)
        assert o.min() >= 0.0 and o.max() <= 1.0
        assert np.all(np.diff(o) >= -1e-6)

    def test_reinhard(self):
        out = color.reinhard_tonemap(vec3(1.0))
        assert np.isclose(float(out.x), 0.5)

    def test_rgb8(self):
        img = color.to_rgb8(Vec3(jnp.ones((4, 4)), jnp.zeros((4, 4)), jnp.full((4, 4), 0.5)))
        assert img.shape == (4, 4, 3) and img.dtype == jnp.uint8
        assert int(img[0, 0, 0]) == 255 and int(img[0, 0, 1]) == 0


class TestSequences:
    def test_halton_matches_table(self):
        # runtime Halton must reproduce the precomputed entries (taa.cuh)
        assert np.isclose(float(halton(1, 2)), 0.5)
        assert np.isclose(float(halton(3, 3)), 1.0 / 9.0, atol=1e-6)
        assert np.isclose(float(halton(3, 2)), 0.75)
        jx, jy = taa_jitter(0)
        assert np.isclose(float(jx), 0.0) and np.isclose(float(jy), -0.166667, atol=1e-5)

    def test_r2(self):
        x0, y0 = r2_jitter(0)
        assert np.isclose(float(x0), 0.0) and np.isclose(float(y0), 0.0)

    def test_blue_noise(self):
        table = blue_noise_table()
        assert table.shape == (64, 64, 2)
        u, v_ = next_blue_noise(table, jnp.arange(128), jnp.arange(128), 5)
        assert float(u.min()) >= 0 and float(u.max()) < 1
        u2, _ = next_blue_noise(table, jnp.arange(128), jnp.arange(128), 6)
        assert not np.allclose(np.asarray(u), np.asarray(u2))
