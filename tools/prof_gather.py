#!/usr/bin/env python
"""Gather-formulation experiments on TPU.

The traversal per-iteration cost is ~2 ms at 230k lanes — dominated by two
packed-row gathers at ~8 ns/lane each, ~20x over the HBM-bandwidth floor
(and the tables even fit VMEM).  This probes every alternative formulation
XLA can express; the winner becomes the traversal fetch path.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ptrt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def main():
    R = int(os.environ.get("R", 230400))
    N = int(os.environ.get("N", 685))  # node-table rows
    W = int(os.environ.get("W", 64))  # row width

    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.normal(size=(N, W)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, R).astype(np.int32))

    def report(name, fn, *args, reps=20):
        try:
            ms = timeit(jax.jit(fn), *args, reps=reps) * 1e3
            print(f"{name:48s} {ms:8.3f} ms  ({ms*1e6/R:6.2f} ns/idx)")
            return ms
        except Exception as e:
            print(f"{name:48s} FAIL {type(e).__name__}: {str(e)[:80]}")
            return None

    print(f"R={R} N={N} W={W}")
    report("take axis0 (baseline)",
           lambda i: jnp.take(tbl, i, axis=0).sum(axis=1), idx)
    report("take axis0, no reduce (materialize)",
           lambda i: jnp.take(tbl, i, axis=0), idx)

    tblT = tbl.T  # (W, N)
    report("take axis1 transposed (W,R) out",
           lambda i: jnp.take(tblT, i, axis=1).sum(axis=0), idx)

    tbl16 = tbl.astype(jnp.bfloat16)
    report("take axis0 bf16",
           lambda i: jnp.take(tbl16, i, axis=0).sum(axis=1), idx)

    # one-hot matmul (MXU)
    def onehot_mm(i):
        oh = jax.nn.one_hot(i, N, dtype=jnp.bfloat16)
        return (oh @ tbl16).sum(axis=1)
    report("one-hot matmul bf16 (MXU)", onehot_mm, idx, reps=5)

    # narrow rows: per-index vs per-byte
    for w2 in (8, 16, 32):
        t2 = tbl[:, :w2]
        report(f"take axis0 width {w2}",
               lambda i, t2=t2: jnp.take(t2, i, axis=0).sum(axis=1), idx)

    # index count scaling
    for r2 in (28800, 57600, 115200):
        i2 = idx[:r2]
        report(f"take axis0 R={r2}",
               lambda i: jnp.take(tbl, i, axis=0).sum(axis=1), i2)

    # table size scaling (same R)
    for n2 in (128, 2048, 16384, 131072):
        t2 = jnp.asarray(rng.normal(size=(n2, W)).astype(np.float32))
        i2 = jnp.asarray(rng.integers(0, n2, R).astype(np.int32))
        report(f"take axis0 N={n2}",
               lambda i, t2=t2: jnp.take(t2, i, axis=0).sum(axis=1), i2)

    # 2D take_along_axis on lane dim with small table (<=128 entries)
    t128 = jnp.asarray(rng.normal(size=(1, 128)).astype(np.float32))
    i128 = (idx % 128).reshape(-1, 1)
    report("take_along_axis lane-dim table128 (1 col)",
           lambda i: jnp.take_along_axis(
               jnp.broadcast_to(t128, (R, 128)), i, axis=1), i128)

    # gather 8 rows per index (block gather) — does coalescing help?
    idx8 = (idx // 8) * 8
    def block8(i):
        rows = jnp.take(tbl, i[:, None] + jnp.arange(8)[None, :], axis=0)
        return rows.sum(axis=(1, 2))
    report("take 8 consecutive rows per idx", block8, idx, reps=5)

    # sorted indices — is the gather layout-sensitive?
    idx_sorted = jnp.sort(idx)
    report("take axis0 PRESORTED idx",
           lambda i: jnp.take(tbl, i, axis=0).sum(axis=1), idx_sorted)

    # iota (perfectly coalesced)
    idx_iota = (jnp.arange(R) % N).astype(jnp.int32)
    report("take axis0 iota idx",
           lambda i: jnp.take(tbl, i, axis=0).sum(axis=1), idx_iota)

    # dynamic_slice loop over 64-wide chunks via scan (DMA-ish)
    def ds_scan(i):
        i2 = i.reshape(-1, 256)

        def body(c, ii):
            return c, jnp.take(tbl, ii, axis=0).sum(axis=1)
        _, out = jax.lax.scan(body, 0, i2)
        return out.reshape(-1)
    report("take in scan chunks of 256", ds_scan, idx, reps=5)


if __name__ == "__main__":
    main()
