"""Device-side transforms + fused step/render tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ptrt_tpu.geometry.transform import Transform3D
from ptrt_tpu.geometry import dtransform as dt


@pytest.mark.parametrize("trs", [
    ((1.0, 2.0, -0.5), (0.3, -0.8, 1.2), (1.0, 1.0, 1.0)),
    ((0.0, 0.0, 0.0), (0.0, 0.0, 0.0), (2.0, 0.5, 1.5)),
    ((-3.0, 1.0, 4.0), (2.1, 0.4, -0.9), (0.7, 1.3, 2.2)),
])
def test_device_matrices_match_host(trs):
    pos, rot, scale = trs
    t = Transform3D(position=pos, rotation=rot, scale=scale)
    inv_host = t.inverse_matrix()[:3, :4]
    nrm_host = t.normal_matrix()[:3, :3]

    mats = dt.instance_mats(jnp.asarray([pos], jnp.float32),
                            jnp.asarray([rot], jnp.float32),
                            jnp.asarray([scale], jnp.float32))
    inv_dev = np.asarray(mats[0, 0:12]).reshape(3, 4)
    nrm_dev = np.asarray(mats[0, 12:21]).reshape(3, 3)
    assert np.allclose(inv_dev, inv_host, atol=1e-5)
    assert np.allclose(nrm_dev, nrm_host, atol=1e-5)


def test_fused_cube_slider_smoke():
    """The north-star loop compiles and runs: step + instance TLAS +
    trace + tonemap as one program, zero host scene edits."""
    from ptrt_tpu.games.cube_slider import run_fused

    state, fps, rgb8 = run_fused(n_frames=2, width=96, height=64,
                                 preset="fast")
    assert rgb8.shape == (64, 96, 3) and rgb8.dtype == np.uint8
    assert fps > 0
    assert float(state.t) > 0


def test_fused_fluid_refit_smoke():
    """Fluid fused loop: step + DEVICE BVH refit of the heightfield BLAS +
    trace + tonemap as one program (the refit itself is unit-tested in
    test_refit; this drives it end-to-end inside the jitted frame)."""
    from ptrt_tpu.games.fluid import run_fused

    state, fps, rgb8 = run_fused(n_frames=2, width=96, height=64, grid=8,
                                 preset="fast")
    assert rgb8.shape == (64, 96, 3)
    assert fps > 0
    assert np.isfinite(np.asarray(state.height)).all()


def test_fused_fluid_lbvh_smoke():
    """Same fused fluid loop with the heightfield flagged device_lbvh:
    the in-frame rebuild is the Morton-sorted device build
    (geometry/lbvh.py) — VERDICT r4 #4's zero-host-rebuild dynamic
    topology, driven end-to-end inside the jitted frame."""
    from ptrt_tpu.games import fluid as fl
    from ptrt_tpu.games.fused import FusedRunner

    u, scene, state = fl.build_scene(96, 64, 8)
    scene.set_performance_preset("fast")
    for m in scene.meshes:
        if m.is_dynamic:
            m.device_lbvh = True
    runner = FusedRunner(
        scene,
        step_fn=lambda s, dt_: fl.step(s, dt_, jnp.float32(6.0),
                                       jnp.float32(0.995)),
        derive_fn=fl.derive_scene)
    dt_ = jnp.float32(1.0 / 30.0)
    state, fps, rgb8 = runner.run(state, lambda i: dt_, 2)
    assert rgb8.shape == (64, 96, 3)
    assert np.isfinite(np.asarray(state.height)).all()
    assert rgb8.max() > 0


def test_fused_tycoon_placement(monkeypatch):
    """Fused tycoon: placement/demolition are device-side actions inside
    the jitted frame — economy and visibility must respond without any
    host scene edit."""
    import ptrt_tpu.games.tycoon as ty

    monkeypatch.setattr(ty, "GRID", 3)  # 27 slots keeps the test light
    from ptrt_tpu.games.fused import FusedRunner

    u, scene, centers = ty.build_fused_scene(96, 64)
    scene.set_performance_preset("fast")
    runner = FusedRunner(
        scene, step_fn=ty.fused_step,
        derive_fn=lambda s: ty.derive_fused_scene(s, centers))
    dt = jnp.float32(1.0)

    s0 = ty.init_fused_state(start_money=200.0)
    # frame 1: place a tower (cost 400 > money) -> must be REJECTED
    script = [(ty.ACT_PLACE, 1, 1, 2), (ty.ACT_PLACE, 1, 1, 0),
              (ty.ACT_DEMOLISH, 1, 1, 0), (ty.ACT_NONE, 0, 0, 0)]
    inputs = lambda i: tuple(jnp.int32(v) for v in script[i]) + (dt,)
    state, fps, rgb8 = runner.run(s0, inputs, 3)
    assert rgb8.shape == (64, 96, 3)
    g = np.asarray(state.grid)
    assert g[1, 1] == -1  # tower rejected (too expensive), hut demolished
    # hut was placed on frame 1 (cost 50) and demolished on frame 2:
    # money decreased by 50 then accrued hut income for one tick
    hut_cost, hut_income = ty.BUILDING_TYPES[0][1], ty.BUILDING_TYPES[0][2]
    assert float(state.money) == pytest.approx(
        200.0 - hut_cost + hut_income, abs=1e-3)
    assert float(state.income) == pytest.approx(0.0, abs=1e-5)


def test_device_world_aabb_matches_host():
    pos, rot, scale = (1.0, -2.0, 3.0), (0.5, 1.1, -0.3), (1.5, 0.5, 2.0)
    t = Transform3D(position=pos, rotation=rot, scale=scale)
    lo_l = np.array([-0.5, -0.25, -1.0], np.float32)
    hi_l = np.array([0.5, 0.75, 1.0], np.float32)

    from ptrt_tpu.geometry.transform import AABB
    host = AABB(lo_l.astype(np.float64),
                hi_l.astype(np.float64)).transformed(t.world_matrix())

    lo, hi = dt.instance_world_aabbs(
        jnp.asarray([pos], jnp.float32), jnp.asarray([rot], jnp.float32),
        jnp.asarray([scale], jnp.float32), jnp.asarray([lo_l]),
        jnp.asarray([hi_l]))
    assert np.allclose(np.asarray(lo[0]), host.lo, atol=1e-4)
    assert np.allclose(np.asarray(hi[0]), host.hi, atol=1e-4)
