"""Rect area-light sampling tests (render/nee.py) — the improvement over
the reference's Area->Point degradation (PTRTtransfer.cuh:1833,2178,2359)."""
import jax
import jax.numpy as jnp
import numpy as np

from ptrt_tpu.core import rng as prng
from ptrt_tpu.core.vec import Vec3
from ptrt_tpu.render.nee import sample_light
from ptrt_tpu.scene.lights import Light, LightTable


def _sample_many(light, point, n=20000):
    t = LightTable.from_lights([light])
    xs, ys = np.meshgrid(np.arange(200), np.arange(n // 200))
    state = prng.seed(jnp.asarray(xs.ravel()), jnp.asarray(ys.ravel()), 7)
    p = Vec3(jnp.full((n,), point[0]), jnp.full((n,), point[1]),
             jnp.full((n,), point[2]))
    state, l, pdf, radiance, att, dist, _li = jax.jit(
        lambda s, pp: sample_light(s, t, 1, pp))(state, p)
    return (np.stack([np.asarray(l.x), np.asarray(l.y), np.asarray(l.z)], 1),
            np.asarray(pdf), np.asarray(dist))


def test_pdf_integrates_to_solid_angle():
    """E[1/pdf] over the sampler = the light's subtended solid angle; for a
    small distant rect that is A*cos(theta)/d^2 to high accuracy."""
    w, h, d = 0.4, 0.3, 10.0
    light = Light.area((0.0, d, 0.0), (0.0, -1.0, 0.0), w, h)
    _, pdf, _ = _sample_many(light, (0.0, 0.0, 0.0))
    omega_mc = float(np.mean(1.0 / pdf))
    omega_true = w * h / (d * d)  # cos(theta)=1 directly below
    assert abs(omega_mc - omega_true) / omega_true < 0.02

    # off-axis: cos factor shrinks the solid angle
    _, pdf2, _ = _sample_many(light, (d, 0.0, 0.0))
    omega_mc2 = float(np.mean(1.0 / pdf2))
    r2 = 2.0 * d * d
    cos_t = d / np.sqrt(r2)
    omega_true2 = w * h * cos_t / r2
    assert abs(omega_mc2 - omega_true2) / omega_true2 < 0.05


def test_direction_spread_grows_with_area():
    """Soft shadows widen with the light area: the sampled direction cone
    must be wider for a bigger rect."""
    small = Light.area((0, 5, 0), (0, -1, 0), 0.05, 0.05)
    big = Light.area((0, 5, 0), (0, -1, 0), 3.0, 3.0)
    ls, _, _ = _sample_many(small, (0.0, 0.0, 0.0))
    lb, _, _ = _sample_many(big, (0.0, 0.0, 0.0))
    assert ls.std(axis=0).max() < 0.01
    assert lb.std(axis=0).max() > 0.1


def test_single_sided_emission():
    """Behind the rect (against its emission direction) the pdf gates to 0
    -> no contribution."""
    light = Light.area((0, 5, 0), (0, -1, 0), 1.0, 1.0)
    _, pdf, _ = _sample_many(light, (0.0, 10.0, 0.0))  # above: back side
    assert np.all(pdf == 0.0)
    _, pdf2, _ = _sample_many(light, (0.0, 0.0, 0.0))  # below: front side
    assert np.all(pdf2 > 0.0)


def test_area_light_renders_penumbra():
    """End-to-end: a bigger area light blurs the shadow edge of an
    occluder (render through the public Scene API)."""
    from ptrt_tpu.scene.pt_scene import Scene
    from ptrt_tpu.scene.materials import Material

    def render(wh):
        sc = Scene(64, 48)
        sc.set_performance_preset("fast")
        sc.perf.samples_per_pixel = 8
        sc.perf.max_bounce_depth = 2
        sc.add_plane_xz(0.0, 8.0, Material.make((0.8, 0.8, 0.8), 0.9))
        blocker = sc.add_cube(Material.make((0.3, 0.3, 0.3), 0.9))
        blocker.transform.set_position(0.0, 1.0, 4.0).set_scale(1.0)
        sc.add_area_light((0.0, 4.0, 4.0), (0.0, -1.0, 0.0), wh, wh,
                          intensity=4.0)
        sc.set_camera((0, 3.0, -2.5), (0, 0, 4), fov=60)
        return np.asarray(sc.render_frame()).astype(np.float32).mean(axis=2)

    img_small = render(0.05)
    img_big = render(3.0)
    # gradient magnitude concentrated at the shadow edge drops when the
    # penumbra widens
    gs = np.abs(np.diff(img_small, axis=1)).max()
    gb = np.abs(np.diff(img_big, axis=1)).max()
    assert gb < gs
