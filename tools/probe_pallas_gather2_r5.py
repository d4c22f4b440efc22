"""Round-5 probe #2: same-leading-dim take_along_axis formulations in-kernel
(the round-1 assertion said indices shape must match input shape) + timing of
the in-kernel one-hot MXU fetch vs the XLA gather baseline.
"""
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("PTRT_JAX_CACHE", "/tmp/ptrt_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run_probe(name, fn):
    try:
        out = fn()
        out.block_until_ready()
        print(f"[OK]   {name} -> sum {float(np.asarray(out).sum()):.3e}")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:140]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}")
        return False


K, W = 2048, 128


def mk(kernel, out_shape=None):
    table = jnp.arange(K * W, dtype=jnp.float32).reshape(K, W) * 1e-4
    idx = (jnp.arange(K, dtype=jnp.int32)[::-1] * 7) % K
    return pl.pallas_call(
        kernel,
        out_shape=out_shape or jax.ShapeDtypeStruct((K, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(table, idx)


def probe_taa_same_shape():
    # out[i, j] = t[idx[i], j]  with leading dims equal (R == K)
    def kernel(t_ref, i_ref, o_ref):
        idx2 = jnp.broadcast_to(i_ref[:][:, None], (K, W))
        o_ref[:] = jnp.take_along_axis(t_ref[:], idx2, axis=0)
    return mk(kernel)


def probe_taa_axis1():
    # out[i, j] = t[i, idx2[i, j]] — lane-dimension gather
    def kernel(t_ref, i_ref, o_ref):
        idx2 = jnp.broadcast_to((i_ref[:] % W)[None, :W], (K, W))
        o_ref[:] = jnp.take_along_axis(t_ref[:], idx2, axis=1)
    return mk(kernel)


def probe_take_same_n():
    def kernel(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(t_ref[:], i_ref[:], axis=0)
    return mk(kernel)


def _steps():
    import os
    return os.environ.get("STEP", "all")


if __name__ == "__main__":
    import os
    step = os.environ.get("STEP", "all")
    print("jax", jax.__version__, jax.devices(), "STEP:", step, flush=True)
    ok1 = False
    if step in ("all", "taa0"):
        ok1 = run_probe("take_along_axis axis=0, R==K", probe_taa_same_shape)
    if step in ("all", "taa1"):
        run_probe("take_along_axis axis=1 (lane gather)", probe_taa_axis1)
    if step in ("all", "take"):
        run_probe("jnp.take axis=0, R==K", probe_take_same_n)
    if step not in ("all", "time"):
        raise SystemExit(0)

    # ---- timing: XLA gather baseline vs in-kernel variants -------------
    R = 1 << 20  # 1M lanes
    KT = 2048    # table rows
    table = jax.random.normal(jax.random.PRNGKey(0), (KT, 64), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (R,), 0, KT, jnp.int32)

    def timeit(name, f, *a):
        f(*a)[0].block_until_ready() if isinstance(f(*a), tuple) else None
        out = jax.block_until_ready(f(*a))
        t0 = time.perf_counter()
        N = 10
        for _ in range(N):
            out = f(*a)
        jax.block_until_ready(out)
        # force host fetch (axon block_until_ready can return early)
        np.asarray(jnp.sum(out if not isinstance(out, tuple) else out[0]))
        dt = (time.perf_counter() - t0) / N
        print(f"{name}: {dt*1e3:.2f} ms  ({dt/R*1e9:.2f} ns/idx)")
        return dt

    xla_gather = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    timeit("XLA gather       (1M idx, 2048x64 tbl)", xla_gather, table, idx)

    # XLA one-hot, TILED via scan so the (R, KT) one-hot never materializes
    # at full R (8 GB); per-tile (8192, 2048) bf16 = 32 MB
    TT = 8192

    def _oh_tile(c, it):
        oh = (jax.lax.broadcasted_iota(jnp.int32, (TT, KT), 1)
              == it[:, None]).astype(jnp.bfloat16)
        return c, jnp.dot(oh, c, preferred_element_type=jnp.float32)

    xla_onehot = jax.jit(lambda t, i: jax.lax.scan(
        _oh_tile, t.astype(jnp.bfloat16), i.reshape(R // TT, TT))[1])
    timeit("XLA one-hot bf16 (1M idx, 2048x64 tbl)", xla_onehot, table, idx)

    # tiled in-kernel one-hot: grid over lane tiles, table resident in VMEM
    TR = 2048  # lanes per tile

    def oh_kernel(t_ref, i_ref, o_ref):
        rows = jax.lax.broadcasted_iota(jnp.int32, (TR, KT), 1)
        oh = (rows == i_ref[:][:, None]).astype(jnp.bfloat16)
        o_ref[:] = jnp.dot(oh, t_ref[:].astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)

    pallas_onehot = jax.jit(lambda t, i: pl.pallas_call(
        oh_kernel,
        grid=(R // TR,),
        out_shape=jax.ShapeDtypeStruct((R, 64), jnp.float32),
        in_specs=[pl.BlockSpec((KT, 64), lambda g: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((TR,), lambda g: (g,),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TR, 64), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
    )(t, i))
    run_probe("pallas tiled one-hot compile", lambda: pallas_onehot(table, idx))
    try:
        timeit("Pallas one-hot   (1M idx, 2048x64 tbl)", pallas_onehot,
               table, idx)
    except Exception as e:  # noqa: BLE001
        print("pallas one-hot timing failed:", str(e)[:120])

    if ok1 or os.environ.get("FORCE_TAA"):
        # timing for the same-shape take_along_axis in-kernel gather
        def taa_kernel(t_ref, i_ref, o_ref):
            idx2 = jnp.broadcast_to(i_ref[:][:, None], (TR, 64))
            o_ref[:] = jnp.take_along_axis(t_ref[:], idx2, axis=0)

        # NOTE: table must have TR rows for the same-shape rule; use TR==KT
        pallas_taa = jax.jit(lambda t, i: pl.pallas_call(
            taa_kernel,
            grid=(R // TR,),
            out_shape=jax.ShapeDtypeStruct((R, 64), jnp.float32),
            in_specs=[pl.BlockSpec((KT, 64), lambda g: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((TR,), lambda g: (g,),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TR, 64), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
        )(t, i))
        if run_probe("pallas taa same-shape compile",
                     lambda: pallas_taa(table, idx)):
            timeit("Pallas taa-gather(1M idx, 2048x64 tbl)", pallas_taa,
                   table, idx)
