"""Disk cache of EXPORTED (traced+lowered) XLA programs.

Why: the persistent XLA compilation cache only skips the *compile* stage —
every new process still pays Python tracing + StableHLO lowering of the
full fused frame program (measured 17.7 s + 7.7 s for the 1080p d4 trace
program, tools/prof_compile_r5.py).  ``jax.export`` serializes the lowered
module; deserializing it skips both stages, and the XLA compile of the
restored module still hits the persistent compile cache.  Warm process
start therefore drops from ~25 s of re-trace/re-lower to loading one blob.

Safety: a stale artifact served after a code change would silently compute
the OLD program, so the cache key includes
  * the call site's full static config key,
  * the pytree structure + shape/dtype avals of the actual arguments,
  * ``jax.__version__`` and the target platform,
  * a fingerprint of the whole ``ptrt_tpu`` source tree (path, size,
    mtime of every .py file).
Any edit anywhere in the package invalidates every entry.  All failures
fall back to the plain jitted function.

Opt-out: ``PTRT_AOT=0``.  Directory: ``PTRT_AOT_CACHE``
(default ``/tmp/ptrt_aot_cache``).
"""

from __future__ import annotations

import hashlib
import os
import threading

import jax

_FP_LOCK = threading.Lock()
_FP_CACHE: list = []


def _enabled() -> bool:
    return os.environ.get("PTRT_AOT", "1") == "1"


def _cache_dir() -> str:
    return os.environ.get("PTRT_AOT_CACHE", "/tmp/ptrt_aot_cache")


def _source_fingerprint() -> str:
    """Hash of (relpath, size, mtime) for every .py in the package —
    cheap (no content reads) and invalidated by any edit."""
    with _FP_LOCK:
        if _FP_CACHE:
            return _FP_CACHE[0]
        import pathlib

        import ptrt_tpu

        root = pathlib.Path(ptrt_tpu.__file__).parent
        h = hashlib.sha256()
        for p in sorted(root.rglob("*.py")):
            st = p.stat()
            h.update(str(p.relative_to(root)).encode())
            h.update(repr((st.st_size, int(st.st_mtime))).encode())
        _FP_CACHE.append(h.hexdigest()[:20])
        return _FP_CACHE[0]


def _leaf_aval(a):
    # weak_type participates: it is part of the jit/export signature, and
    # two entries differing only in it must not share a disk key
    return (getattr(a, "shape", ()),
            str(getattr(a, "dtype", type(a).__name__)),
            bool(getattr(a, "weak_type", False)))


def _entry_key(config_key, args) -> str:
    leaves, treedef = jax.tree_util.tree_flatten(args)
    avals = tuple(_leaf_aval(a) for a in leaves)
    platform = jax.devices()[0].platform
    # every PTRT_* env knob can change the TRACED program (ladder shapes,
    # packet gates, unroll mode, ...) without touching the config key or
    # the source tree — they must partition the disk entries
    knobs = tuple(sorted((k, v) for k, v in os.environ.items()
                         if k.startswith("PTRT_")
                         and k not in ("PTRT_AOT", "PTRT_AOT_CACHE")))
    raw = repr((config_key, str(treedef), avals, jax.__version__, platform,
                knobs, _source_fingerprint()))
    return hashlib.sha256(raw.encode()).hexdigest()


def aot_jit(config_key, fn):
    """``jax.jit(fn)`` with a disk-backed export cache.

    The returned callable resolves its program on the FIRST call (the
    export key needs the concrete argument avals): disk hit -> deserialize
    the lowered module (no trace, no lower); miss -> export once (one
    trace+lower, same cost as plain jit) and persist.  Per-process the
    resolved program is cached like any jit."""
    jitted = jax.jit(fn)
    if not _enabled():
        return jitted
    state: dict = {}

    def wrapper(*args):
        # resolved per argument-aval signature: a plain jit silently
        # recompiles when shapes change (scene grows, resolution changes);
        # an exported call is aval-strict, so each signature gets its own
        # resolution (and its own disk entry)
        sig = _aval_sig(args)
        call = state.get(sig)
        if call is None:
            call = _resolve(config_key, jitted, args)
            state[sig] = call
        return call(*args)

    return wrapper


def _aval_sig(args):
    leaves, treedef = jax.tree_util.tree_flatten(args)
    return (treedef, tuple(_leaf_aval(a) for a in leaves))


_SER_REGISTERED: list = []


def _ensure_serialization_registered() -> None:
    """Register export-serialization handlers for every custom pytree class
    that can appear in a cached program's arguments or outputs.  Auxdata is
    pickled — the cache directory is a local, same-user performance cache
    (same trust domain as the persistent XLA compile cache)."""
    if _SER_REGISTERED:
        return
    import pickle

    from jax import export as jexport

    from ptrt_tpu.core.vec import Vec3
    from ptrt_tpu.geometry import scene_geom as sg
    from ptrt_tpu.render import denoiser as dn
    from ptrt_tpu.render.pipeline import FrameBuffers
    from ptrt_tpu.render.ray import RayBatch
    from ptrt_tpu.render.sky import SkyConfig
    from ptrt_tpu.render.traverse import Hit
    from ptrt_tpu.scene.camera import Camera
    from ptrt_tpu.scene.lights import LightTable
    from ptrt_tpu.scene import materials as mt

    classes = [Vec3, Camera, LightTable, SkyConfig, RayBatch, Hit]
    for mod in (sg, dn, mt):
        for name in dir(mod):
            obj = getattr(mod, name)
            if isinstance(obj, type) and hasattr(obj, "tree_flatten") \
                    and obj.__module__ == mod.__name__:
                classes.append(obj)
    for cls in classes:
        try:
            jexport.register_pytree_node_serialization(
                cls,
                serialized_name="ptrt." + cls.__module__ + "." + cls.__name__,
                serialize_auxdata=pickle.dumps,
                deserialize_auxdata=pickle.loads,
            )
        except ValueError:
            pass  # already registered (idempotence across reloads)
    try:
        jexport.register_namedtuple_serialization(
            FrameBuffers, serialized_name="ptrt.FrameBuffers")
    except ValueError:
        pass
    _SER_REGISTERED.append(True)


def _resolve(config_key, jitted, args):
    try:
        from jax import export as jexport

        _ensure_serialization_registered()

        key = _entry_key(config_key, args)
        path = os.path.join(_cache_dir(), key + ".jaxexport")
        if os.path.exists(path):
            with open(path, "rb") as f:
                exp = jexport.deserialize(f.read())
            return jax.jit(exp.call)
        exp = jexport.export(jitted)(*args)
        os.makedirs(_cache_dir(), exist_ok=True)
        tmp = path + ".%d.tmp" % os.getpid()
        with open(tmp, "wb") as f:
            f.write(exp.serialize())
        os.replace(tmp, path)
        return jax.jit(exp.call)
    except Exception:  # noqa: BLE001 — any export failure -> plain jit
        return jitted
