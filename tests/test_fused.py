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
