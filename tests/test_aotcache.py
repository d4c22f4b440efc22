"""Unit tests for the exported-program disk cache (utils/aotcache.py).

The cache must be invisible: identical results whether a program is built
fresh, exported, or restored from disk — and a plain-jit fallback on any
export failure.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ptrt_tpu.core.vec import Vec3
from ptrt_tpu.utils import aotcache


def _fn(v: Vec3, s):
    return (v * 2.0 + Vec3.full(1.0)).dot(Vec3(s, s, s))


class TestAotCache:
    def test_roundtrip_identical_and_persisted(self, tmp_path, monkeypatch):
        monkeypatch.setenv("PTRT_AOT_CACHE", str(tmp_path))
        monkeypatch.setenv("PTRT_AOT", "1")
        v = Vec3(jnp.arange(4.0), jnp.ones(4), jnp.zeros(4))
        s = jnp.float32(3.0)

        w1 = aotcache.aot_jit(("test", 1), _fn)
        r1 = np.asarray(w1(v, s))
        files = list(tmp_path.glob("*.jaxexport"))
        assert len(files) == 1, files

        # fresh wrapper, same config: must RESTORE from disk (poison the
        # export path to prove the disk entry is what served the call)
        monkeypatch.setattr(
            jax.export, "export",
            lambda *a, **k: (_ for _ in ()).throw(RuntimeError("no export")))
        w2 = aotcache.aot_jit(("test", 1), _fn)
        r2 = np.asarray(w2(v, s))
        np.testing.assert_array_equal(r1, r2)

    def test_shape_change_re_resolves(self, tmp_path, monkeypatch):
        monkeypatch.setenv("PTRT_AOT_CACHE", str(tmp_path))
        monkeypatch.setenv("PTRT_AOT", "1")
        w = aotcache.aot_jit(("test", 2), _fn)
        a = np.asarray(w(Vec3(jnp.ones(4), jnp.ones(4), jnp.ones(4)),
                         jnp.float32(1.0)))
        b = np.asarray(w(Vec3(jnp.ones(8), jnp.ones(8), jnp.ones(8)),
                         jnp.float32(1.0)))
        assert a.shape == (4,) and b.shape == (8,)
        assert len(list(tmp_path.glob("*.jaxexport"))) == 2

    def test_export_failure_falls_back_to_jit(self, tmp_path, monkeypatch):
        monkeypatch.setenv("PTRT_AOT_CACHE", str(tmp_path))
        monkeypatch.setenv("PTRT_AOT", "1")
        monkeypatch.setattr(
            jax.export, "export",
            lambda *a, **k: (_ for _ in ()).throw(RuntimeError("boom")))
        w = aotcache.aot_jit(("test", 3), _fn)
        v = Vec3(jnp.ones(4), jnp.zeros(4), jnp.zeros(4))
        out = np.asarray(w(v, jnp.float32(2.0)))
        # (1,0,0)*2+1 = (3,1,1); dot (2,2,2) = 10
        np.testing.assert_allclose(out, np.full(4, 10.0), rtol=1e-6)
        assert list(tmp_path.glob("*.jaxexport")) == []

    def test_disabled_env(self, tmp_path, monkeypatch):
        monkeypatch.setenv("PTRT_AOT_CACHE", str(tmp_path))
        monkeypatch.setenv("PTRT_AOT", "0")
        w = aotcache.aot_jit(("test", 4), _fn)
        v = Vec3(jnp.ones(2), jnp.ones(2), jnp.ones(2))
        np.asarray(w(v, jnp.float32(1.0)))
        assert list(tmp_path.glob("*.jaxexport")) == []
