#!/usr/bin/env python
"""Probe Mosaic (Pallas TPU) support + speed for per-lane gather formulations.

Round-1 finding (jax 0.9): no usable per-lane gather. Re-verify and measure
the alternatives that DO compile:
  a. jnp.take(tbl, idx, axis=0) inside kernel (VMEM table)
  b. jnp.take_along_axis 2D forms
  c. one-hot matmul (MXU) with fused one-hot generation
  d. scalar fori_loop of dynamic slices (1 row per step)
Each runs K times in a dependent chain inside the kernel so we measure
device-side marginal cost, not dispatch.
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ptrt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1024  # node-table rows (pad to power of 2)
W = 64
R = 230400
K = 8  # chained gathers per kernel


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


rng = np.random.default_rng(0)
tbl_np = rng.normal(size=(N, W)).astype(np.float32)
tbl = jnp.asarray(tbl_np)
idx = jnp.asarray(rng.integers(0, N, R).astype(np.int32))

BLK = 2048  # rays per pallas block


def bench(name, make_call):
    try:
        fn = jax.jit(make_call())
        ms = timeit(fn, idx) * 1e3
        per = ms * 1e6 / (R * K)
        print(f"{name:44s} {ms:8.3f} ms  ({per:6.2f} ns/idx)")
    except Exception as e:
        msg = str(e).replace("\n", " ")[:110]
        print(f"{name:44s} FAIL {type(e).__name__}: {msg}")


# -- a: jnp.take in kernel ---------------------------------------------------
def make_take():
    def kernel(idx_ref, tbl_ref, out_ref):
        i = idx_ref[:]
        acc = jnp.zeros((BLK,), jnp.float32)
        def body(k, carry):
            i, acc = carry
            rows = jnp.take(tbl_ref[:], i, axis=0)
            s = rows.sum(axis=1)
            return ((i + s.astype(jnp.int32)) % N, acc + s)
        _, acc = jax.lax.fori_loop(0, K, body, (i, acc))
        out_ref[:] = acc

    def call(i):
        return pl.pallas_call(
            kernel,
            grid=(R // BLK,),
            in_specs=[pl.BlockSpec((BLK,), lambda g: (g,),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((N, W), lambda g: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((BLK,), lambda g: (g,),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R,), jnp.float32),
        )(i, tbl)
    return call


# -- b: take_along_axis sublane form ----------------------------------------
def make_taa():
    def kernel(idx_ref, tbl_ref, out_ref):
        i = idx_ref[:]
        acc = jnp.zeros((BLK,), jnp.float32)
        def body(k, carry):
            i, acc = carry
            rows = jnp.take_along_axis(tbl_ref[:], i[:, None], axis=0)
            s = rows[:, 0]
            return ((i + s.astype(jnp.int32)) % N, acc + s)
        _, acc = jax.lax.fori_loop(0, K, body, (i, acc))
        out_ref[:] = acc

    def call(i):
        return pl.pallas_call(
            kernel,
            grid=(R // BLK,),
            in_specs=[pl.BlockSpec((BLK,), lambda g: (g,),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((N, W), lambda g: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((BLK,), lambda g: (g,),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R,), jnp.float32),
        )(i, tbl)
    return call


# -- c: one-hot matmul (MXU) -------------------------------------------------
def make_onehot(dtype):
    def kernel(idx_ref, tbl_ref, out_ref):
        i = idx_ref[:]
        tblv = tbl_ref[:].astype(dtype)
        iota = jax.lax.broadcasted_iota(jnp.int32, (BLK, N), 1)
        acc = jnp.zeros((BLK,), jnp.float32)
        def body(k, carry):
            i, acc = carry
            oh = (iota == i[:, None]).astype(dtype)
            rows = jnp.dot(oh, tblv, preferred_element_type=jnp.float32)
            s = rows.sum(axis=1)
            return ((i + s.astype(jnp.int32)) % N, acc + s)
        _, acc = jax.lax.fori_loop(0, K, body, (i, acc))
        out_ref[:] = acc

    def call(i):
        return pl.pallas_call(
            kernel,
            grid=(R // BLK,),
            in_specs=[pl.BlockSpec((BLK,), lambda g: (g,),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((N, W), lambda g: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((BLK,), lambda g: (g,),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R,), jnp.float32),
        )(i, tbl)
    return call


# -- d: scalar loop of dynamic slices ---------------------------------------
def make_scalar_loop():
    def kernel(idx_ref, tbl_ref, out_ref, srows):
        def outer(k, _):
            def inner(j, _):
                r = idx_ref[j]
                srows[j % 8, :] = tbl_ref[pl.ds(r, 1), :][0, :]
                return 0
            jax.lax.fori_loop(0, BLK, inner, 0)
            return 0
        jax.lax.fori_loop(0, K, outer, 0)
        out_ref[:] = jnp.zeros((BLK,), jnp.float32) + srows[0, 0]

    def call(i):
        return pl.pallas_call(
            kernel,
            grid=(R // BLK,),
            in_specs=[pl.BlockSpec((BLK,), lambda g: (g,),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((N, W), lambda g: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((BLK,), lambda g: (g,),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R,), jnp.float32),
            scratch_shapes=[pltpu.VMEM((8, W), jnp.float32)],
        )(i, tbl)
    return call


# -- XLA baseline for comparison ---------------------------------------------
def make_xla():
    def f(i):
        def body(k, carry):
            i, acc = carry
            s = jnp.take(tbl, i, axis=0).sum(axis=1)
            return ((i + s.astype(jnp.int32)) % N, acc + s)
        _, acc = jax.lax.fori_loop(0, K, body, (i, jnp.zeros(R)))
        return acc
    return lambda: f


if __name__ == "__main__":
    bench("XLA take (HBM) baseline", make_xla)
    bench("pallas jnp.take VMEM", make_take)
    bench("pallas take_along_axis VMEM", make_taa)
    bench("pallas one-hot matmul f32", partial(make_onehot, jnp.float32))
    bench("pallas one-hot matmul bf16", partial(make_onehot, jnp.bfloat16))
    bench("pallas scalar-loop dynamic slice", make_scalar_loop)
