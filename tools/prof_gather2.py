#!/usr/bin/env python
"""Isolate fixed-vs-marginal gather cost INSIDE one program.

prof_gather.py showed ~2 ms per gather at 230k indices but 1.6 ms at 29k —
suggesting a big fixed per-op cost.  This chains K gathers inside one jitted
fori_loop (dependent indices, so they serialize like traversal) and varies
K and R: the slope over K is the true device-side per-gather cost.
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


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def main():
    N = 685
    W = 64
    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.normal(size=(N, W)).astype(np.float32))

    for R in (28800, 115200, 230400, 921600):
        idx0 = jnp.asarray(rng.integers(0, N, R).astype(np.int32))
        res = {}
        for K in (4, 16):
            def prog(i0, K=K):
                def body(k, carry):
                    i, acc = carry
                    row = jnp.take(tbl, i, axis=0)
                    s = row.sum(axis=1)
                    # dependent next index (serializes like traversal)
                    i = (i + s.astype(jnp.int32)) % N
                    return (i, acc + s)
                _, acc = jax.lax.fori_loop(0, K, body, (i0, jnp.zeros(R)))
                return acc
            ms = timeit(jax.jit(prog), idx0) * 1e3
            res[K] = ms
        marg = (res[16] - res[4]) / 12.0
        print(f"R={R:7d}: K=4 {res[4]:8.3f} ms  K=16 {res[16]:8.3f} ms  "
              f"-> {marg:7.3f} ms/gather ({marg*1e6/R:6.2f} ns/idx)")


if __name__ == "__main__":
    main()
