"""HDRI importance sampling (alias-method env NEE) + camera-NEE fix tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ptrt_tpu.core import rng as prng
from ptrt_tpu.core.vec import Vec3
from ptrt_tpu.render.sky import (SkyConfig, build_env_sampling, env_pdf_dir,
                                 sample_env, sample_sky)
from ptrt_tpu.scene.materials import Material
from ptrt_tpu.scene.pt_scene import Scene


def make_env(h=32, w=64, spot=200.0):
    rng = np.random.default_rng(1)
    env = (rng.random((h, w, 3)).astype(np.float32) ** 2) * 0.2
    env[5:8, 10:14] = spot
    return env


class TestAliasTables:
    def test_probabilities_reconstruct(self):
        """Alias tables must reproduce the target distribution exactly:
        p[j] = (prob[j] + sum_{k: alias[k]==j} (1-prob[k])) / n."""
        env = make_env(8, 16)
        packed, pdf, (sh, sw) = build_env_sampling(env)
        n = sh * sw
        prob = packed[:, 0].astype(np.float64)
        alias = packed[:, 1].astype(np.int32)  # float-encoded index
        recon = prob.copy()
        np.add.at(recon, alias, 1.0 - prob)
        recon /= n
        lum = (0.2126 * env[..., 0] + 0.7152 * env[..., 1]
               + 0.0722 * env[..., 2]).astype(np.float64)
        # same 3x3 footprint blur as build_env_sampling
        lum = np.maximum(lum, 0.0)
        lx = (lum + np.roll(lum, 1, 1) + np.roll(lum, -1, 1)) / 3.0
        pad = np.pad(lx, ((1, 1), (0, 0)), mode="edge")
        lum = (pad[:-2] + pad[1:-1] + pad[2:]) / 3.0
        theta = (np.arange(sh) + 0.5) * (np.pi / sh)
        p = lum * np.sin(theta)[:, None]
        p = (p / p.sum()).reshape(-1)
        assert np.allclose(recon, p, atol=1e-9)

    def test_pdf_normalizes_over_sphere(self):
        env = make_env()
        sky = SkyConfig.hdri(env)
        rng = np.random.default_rng(3)
        d = rng.normal(size=(200000, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        dirs = Vec3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]),
                    jnp.asarray(d[:, 2]))
        pdfs = np.asarray(env_pdf_dir(sky, dirs))
        integral = pdfs.mean() * 4.0 * np.pi
        assert abs(integral - 1.0) < 0.05

    def test_sampler_pdf_consistency(self):
        """pdf returned by sample_env must equal env_pdf_dir(l)."""
        env = make_env()
        sky = SkyConfig.hdri(env)
        ys, xs = np.mgrid[0:64, 0:128]
        state = prng.seed(jnp.asarray(xs), jnp.asarray(ys), 0)
        state, l, pdf, rad = jax.jit(lambda s: sample_env(s, sky))(state)
        lookup = np.asarray(env_pdf_dir(sky, l))
        assert np.allclose(np.asarray(pdf), lookup, rtol=1e-4)

    def test_importance_estimator_matches_uniform(self):
        """E[lum/pdf] over alias samples == integral of env luminance."""
        env = make_env()
        sky = SkyConfig.hdri(env)
        ys, xs = np.mgrid[0:256, 0:512]
        state = prng.seed(jnp.asarray(xs), jnp.asarray(ys), 0)
        state, l, pdf, rad = jax.jit(lambda s: sample_env(s, sky))(state)
        lum = (0.2126 * np.asarray(rad.x) + 0.7152 * np.asarray(rad.y)
               + 0.0722 * np.asarray(rad.z))
        est = (lum / np.maximum(np.asarray(pdf), 1e-12)).mean()

        rng = np.random.default_rng(5)
        d = rng.normal(size=(300000, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        dirs = Vec3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]),
                    jnp.asarray(d[:, 2]))
        ru = sample_sky(dirs, sky)
        lu = (0.2126 * np.asarray(ru.x) + 0.7152 * np.asarray(ru.y)
              + 0.0722 * np.asarray(ru.z))
        ref = lu.mean() * 4.0 * np.pi
        assert abs(est - ref) / ref < 0.1

    def test_variance_reduction(self):
        env = make_env(spot=500.0)
        sky = SkyConfig.hdri(env)
        ys, xs = np.mgrid[0:128, 0:256]
        state = prng.seed(jnp.asarray(xs), jnp.asarray(ys), 0)
        state, l, pdf, rad = jax.jit(lambda s: sample_env(s, sky))(state)
        lum = lambda v: (0.2126 * np.asarray(v.x) + 0.7152 * np.asarray(v.y)
                         + 0.0722 * np.asarray(v.z))
        var_is = (lum(rad) / np.maximum(np.asarray(pdf), 1e-12)).var()

        rng = np.random.default_rng(7)
        d = rng.normal(size=(128 * 256, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        dirs = Vec3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]),
                    jnp.asarray(d[:, 2]))
        var_uni = (lum(sample_sky(dirs, sky)) * 4.0 * np.pi).var()
        assert var_is < var_uni / 3.0  # at least 3x variance reduction


class TestCameraNEEFix:
    def test_light_only_scene_is_lit(self):
        """Reference defect (docstring in render/integrator.py): camera rays
        marked specular suppressed bounce-0 NEE, so a scene lit only by an
        analytic light rendered BLACK.  The fix must light it."""
        sc = Scene(48, 32)
        sc.set_sky_enabled(False)
        sc.add_plane_xz(-0.5, 10.0, Material.make((0.8, 0.8, 0.8)))
        sc.add_point_light((0, 3, 3), (1, 1, 1), 10.0)
        sc.set_camera((0, 1, 0), (0, -0.5, 4))
        sc.perf.enable_denoiser = False
        sc.perf.enable_bloom = False
        sc.perf.samples_per_pixel = 2
        sc.perf.max_bounce_depth = 2
        img = sc.render_frame()
        assert img.mean() > 20.0


class TestEnvNEEIntegration:
    def test_hdri_render_uses_env_nee_and_reduces_noise(self):
        """Raw-HDR comparison (tonemapped uint8 hides the difference: the
        non-IS render is mostly-dark floor + rare clipped fireflies)."""
        import jax.numpy as jnp
        from ptrt_tpu.scene.pt_scene import _trace_only

        env = 0.05 * np.ones((32, 64, 3), np.float32)
        env[4:7, 20:24] = 50.0  # small sun

        def build(importance):
            sc = Scene(48, 32)
            sc.add_plane_xz(-0.5, 10.0, Material.make((0.8, 0.8, 0.8)))
            sc.set_environment_map(env)
            sc.set_camera((0, 1, 0), (0, 0, 4))
            sc.perf.enable_denoiser = False
            sc.perf.enable_bloom = False
            sc.perf.samples_per_pixel = 2
            sc.perf.max_bounce_depth = 2
            if not importance:
                sky = SkyConfig.hdri(env, importance_sampling=False)
                sc._sky = lambda: sky
            return sc

        def hdr_frames(sc, n):
            sc._ensure_device_state()
            rh, rw = sc.render_size
            fn = _trace_only(rw, rh, 2, 2, len(sc.lights), sc._use_brute(),
                             True)
            out = []
            for i in range(n):
                state, bufs = fn(sc._geom, sc._mat_table, sc._light_table,
                                 sc._sky(), sc.camera, sc._rng_state,
                                 jnp.int32(i), sc._blue_noise)
                sc._rng_state = state
                out.append(np.stack([np.asarray(bufs.color.x),
                                     np.asarray(bufs.color.y),
                                     np.asarray(bufs.color.z)], -1))
            return np.stack(out).astype(np.float64)

        F = hdr_frames(build(True), 10)
        G = hdr_frames(build(False), 10)
        std_is = F.std(axis=0).mean()
        std_uni = G.std(axis=0).mean()
        assert std_is < std_uni / 2.0  # >=2x noise reduction
        # unbiasedness: means agree within MC tolerance
        assert abs(F.mean() - G.mean()) / max(G.mean(), 1e-9) < 0.4
