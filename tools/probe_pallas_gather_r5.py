"""Round-5 probe: which per-lane dynamic-indexing formulations does Mosaic
accept inside a TPU Pallas kernel (jax 0.9.0), and how fast are they?

VERDICT r4 #1 demands a re-test of the round-1 negative result before
reattempting a VMEM-resident walk kernel.  Each probe compiles + runs a
kernel that fetches table rows by a per-lane index vector; failures print
the first line of the compiler error.

Run:  python tools/probe_pallas_gather_r5.py
"""
import functools
import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 2048          # table rows
W = 128           # row width (lane dim)
R = 1024          # lanes (indices)


def run_probe(name, fn):
    try:
        out = fn()
        out.block_until_ready()
        print(f"[OK]   {name}  -> {np.asarray(out).ravel()[:3]}")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:160]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}")
        return False


def mk(kernel):
    table = jnp.arange(K * W, dtype=jnp.float32).reshape(K, W)
    idx = jnp.arange(R, dtype=jnp.int32)[::-1] % K
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(table, idx)


def probe_vector_index():
    def kernel(t_ref, i_ref, o_ref):
        o_ref[:] = t_ref[i_ref[:], :]
    return mk(kernel)


def probe_take():
    def kernel(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(t_ref[:], i_ref[:], axis=0)
    return mk(kernel)


def probe_take_clip():
    def kernel(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(t_ref[:], i_ref[:], axis=0, mode="clip")
    return mk(kernel)


def probe_take_along_axis():
    def kernel(t_ref, i_ref, o_ref):
        idx2 = jnp.broadcast_to(i_ref[:][:, None], (R, W))
        o_ref[:] = jnp.take_along_axis(t_ref[:], idx2, axis=0)
    return mk(kernel)


def probe_adv_indexing():
    def kernel(t_ref, i_ref, o_ref):
        cols = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
        o_ref[:] = t_ref[:][i_ref[:][:, None], cols]
    return mk(kernel)


def probe_lax_gather():
    def kernel(t_ref, i_ref, o_ref):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,),
            start_index_map=(0,))
        o_ref[:] = jax.lax.gather(
            t_ref[:], i_ref[:][:, None], dn, slice_sizes=(1, W))
    return mk(kernel)


def probe_onehot_matmul():
    def kernel(t_ref, i_ref, o_ref):
        rows = jax.lax.broadcasted_iota(jnp.int32, (R, K), 1)
        oh = (rows == i_ref[:][:, None]).astype(jnp.float32)
        o_ref[:] = jnp.dot(oh, t_ref[:], preferred_element_type=jnp.float32)
    return mk(kernel)


def probe_scalar_loop():
    def kernel(t_ref, i_ref, o_ref):
        def body(r, _):
            o_ref[pl.ds(r, 1), :] = t_ref[pl.ds(i_ref[r], 1), :]
            return 0
        jax.lax.fori_loop(0, R, body, 0)
    return mk(kernel)


def probe_dynamic_slice():
    def kernel(t_ref, i_ref, o_ref):
        def body(r, _):
            row = jax.lax.dynamic_slice(t_ref[:], (i_ref[r], 0), (1, W))
            o_ref[pl.ds(r, 1), :] = row
            return 0
        jax.lax.fori_loop(0, R, body, 0)
    return mk(kernel)


PROBES = [
    ("t_ref[idx_vec, :]        (vector ref index)", probe_vector_index),
    ("jnp.take axis=0          ", probe_take),
    ("jnp.take mode=clip       ", probe_take_clip),
    ("jnp.take_along_axis 2D   ", probe_take_along_axis),
    ("advanced int indexing 2D ", probe_adv_indexing),
    ("lax.gather explicit dnums", probe_lax_gather),
    ("one-hot matmul (MXU)     ", probe_onehot_matmul),
    ("fori scalar pl.ds loop   ", probe_scalar_loop),
    ("fori dynamic_slice loop  ", probe_dynamic_slice),
]

if __name__ == "__main__":
    print("jax", jax.__version__, "devices", jax.devices())
    ok = {}
    for name, fn in PROBES:
        ok[name] = run_probe(name, fn)
    print()
    print("working:", [n.strip() for n, v in ok.items() if v])
