"""Test config: run everything on a virtual 8-device CPU mesh.

The same JAX code that runs on TPU runs on the ``cpu`` platform — this is the
"fake backend" of SURVEY.md §4: no TPU needed for CI, and multi-chip sharding
is exercised with ``xla_force_host_platform_device_count=8``.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

# NOTE: this environment's sitecustomize force-registers the 'axon' TPU
# platform and ignores the JAX_PLATFORMS env var; the config update below is
# what actually pins tests to the virtual 8-device CPU backend.
jax.config.update("jax_platforms", "cpu")
# CPU-only cache, NOT the shared /tmp/ptrt_jax_cache the TPU bench/tools
# use: with PALLAS_AXON_REMOTE_COMPILE=1 every XLA compile (CPU included)
# is served by the remote compile service, whose XLA:CPU AOT results
# carry the REMOTE host's machine features; mixing those entries across
# compiler versions/hosts in one dir produced a hard SIGILL loading the
# sharded full-frame executable mid-suite.  A dedicated dir keeps test
# entries self-consistent (same same-session compiler for write + read).
# PTRT_TEST_CACHE overrides the cache dir — needed when switching between
# remote-compiled (PALLAS_AXON_REMOTE_COMPILE=1) and locally-compiled runs:
# entries from the two compilers must not share a directory (see below).
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("PTRT_TEST_CACHE",
                                 "/tmp/ptrt_jax_cache_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# The exported-program disk cache (utils/aotcache.py) is keyed on a
# source-tree fingerprint, so during development every edit invalidates
# every entry and each test run would re-pay export serialization on top
# of the unavoidable re-trace.  Tests exercise the jit path by default;
# tests/test_aotcache.py opts back in explicitly.
os.environ.setdefault("PTRT_AOT", "0")


# Test tiers (pytest.ini): modules whose tests build FULL-FRAME XLA programs
# (trace+denoise+bloom pipelines, fused game loops, golden renders, viewers)
# compile for minutes each on a 1-core CPU host and form the opt-in `slow`
# tier; everything else is the `fast` pre-commit gate.
_SLOW_MODULES = {"test_pipeline", "test_fused", "test_viewer", "test_golden"}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if any(m.name in ("fast", "slow") for m in item.iter_markers()):
            continue  # explicit per-test tier wins over the module default
        mod = item.module.__name__.rsplit(".", 1)[-1]
        tier = "slow" if mod in _SLOW_MODULES else "fast"
        item.add_marker(getattr(pytest.mark, tier))


@pytest.fixture
def rtol():
    return 1e-5


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)
