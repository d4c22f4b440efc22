#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line.

Metric: Mrays/s on the canonical showcase-scale scene (app/bench_scene.py),
counting every traced ray (camera + bounce + NEE shadow), plus FPS at the
BASELINE interactive config (1080p, 4 spp, depth 4, no denoiser).

vs_baseline is measured Mrays/s divided by the BASELINE.json north-star
target of 1000 Mrays/s (>=1.0 means target met).

Env overrides: PTRT_BENCH_W/H, PTRT_BENCH_SPP, PTRT_BENCH_DEPTH,
PTRT_BENCH_TRIS, PTRT_BENCH_FRAMES.
"""

import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("PTRT_JAX_CACHE", "/tmp/ptrt_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402


def _run_measured(sc, spp, depth, frames):
    """Compile + time the trace-only frame; returns (compile_s, dt, rays).
    Split out so a transient device fault can be retried (round-3's bench
    died once with UNAVAILABLE mid-run through the axon tunnel and the
    driver recorded no value at all)."""
    from ptrt_tpu.scene.pt_scene import _trace_only
    import jax.numpy as jnp

    rh, rw = sc.render_size
    fn = _trace_only(rw, rh, spp, depth, len(sc.lights), sc._use_brute(),
                     sc._sky().has_env_sampling)

    def one_frame(i):
        state, bufs = fn(sc._geom, sc._mat_table, sc._light_table, sc._sky(),
                         sc.camera, sc._rng_state, jnp.int32(i),
                         sc._blue_noise)
        sc._rng_state = state
        return bufs

    t0 = time.time()
    bufs = one_frame(0)
    jax.block_until_ready(bufs.color.x)
    compile_s = time.time() - t0

    t0 = time.time()
    total_rays = 0.0
    for i in range(frames):
        bufs = one_frame(i + 1)
        total_rays += float(bufs.rays_traced)
    jax.block_until_ready(bufs.color.x)
    return compile_s, time.time() - t0, total_rays


def _time_fn(call, frames=2):
    """Time `call(i)` for `frames` frames (after one warm/compile call),
    forcing a host fetch so axon's early block_until_ready can't lie."""
    import jax.numpy as jnp

    out = call(0)
    jax.block_until_ready(out)
    t0 = time.time()
    for i in range(frames):
        out = call(i + 1)
    jax.block_until_ready(out)
    np.asarray(jnp.sum(out if not isinstance(out, tuple) else out[0]))
    return (time.time() - t0) / frames


def _phase_probes(sc, depth):
    """Per-phase device-time attribution + roofline anchors (VERDICT r4 #2).

    The frame is ONE fused XLA program, so phases are attributed by
    differencing a ladder of spp=1 trace programs:
      d1 camera_nee=False  = camera closest walk + primary shade
      d1                   = + bounce-0 NEE (camera shadow any walk)
      d2                   = + 1 scattered bounce (closest+NEE+BSDF)
      d<depth>             = + remaining bounces
    Roofline anchors measured on the live device:
      hbm_copy_gbps   — achieved HBM bandwidth of a big elementwise op
                        (read+write), the practical bandwidth peak;
      gather_ns_idx   — per-index cost of a random row gather from the
                        scene's real node table (the walk's currency: one
                        walk iteration = 1 node-row + ~1/3 leaf-row gather).
    Together with the phase table these place each walk against the gather
    issue-rate floor: phase_ms / rays ~= indices/ray x gather_ns_idx.
    """
    import jax.numpy as jnp
    from ptrt_tpu.scene.pt_scene import _trace_only

    rh, rw = sc.render_size
    has_env = sc._sky().has_env_sampling
    nl = len(sc.lights)
    brute = sc._use_brute()

    def trace_ms(d, camera_nee=True):
        fn = _trace_only(rw, rh, 1, d, nl, brute, has_env, camera_nee)

        def call(i):
            _, bufs = fn(sc._geom, sc._mat_table, sc._light_table, sc._sky(),
                         sc.camera, sc._rng_state, jnp.int32(1000 + i),
                         sc._blue_noise)
            return bufs.color.x
        return _time_fn(call) * 1e3

    phases = {}
    d1n = trace_ms(1, camera_nee=False)
    d1 = trace_ms(1)
    d2 = trace_ms(min(2, depth))
    dfull = trace_ms(depth) if depth > 2 else d2
    phases["spp1_camera_ms"] = round(d1n, 1)
    phases["spp1_camera_nee_ms"] = round(max(d1 - d1n, 0.0), 1)
    phases["spp1_bounce1_ms"] = round(max(d2 - d1, 0.0), 1)
    phases["spp1_deep_bounces_ms"] = round(max(dfull - d2, 0.0), 1)
    phases["spp1_total_ms"] = round(dfull, 1)

    # roofline anchors
    big = jnp.zeros((64, 1024, 1024), jnp.float32)  # 256 MB
    cp = jax.jit(lambda x: x + 1.0)
    dt = _time_fn(lambda i: cp(big))
    phases["hbm_copy_gbps"] = round(2 * big.size * 4 / dt / 1e9, 1)

    nrows = int(sc_node_rows(sc).shape[0])
    idx = jnp.asarray((np.random.default_rng(0)
                       .integers(0, nrows, 1 << 20)).astype(np.int32))
    ga = jax.jit(lambda i: jnp.sum(jnp.take(sc_node_rows(sc), i, axis=0)))
    dt = _time_fn(lambda k: ga(idx))
    phases["gather_ns_idx"] = round(dt / idx.size * 1e9, 2)
    # achieved gather bandwidth vs copy peak: one gathered node row is
    # 64 floats = 256 B
    phases["gather_gbps"] = round(idx.size * 256 / dt / 1e9, 1)
    return phases


def sc_node_rows(sc):
    g = sc._geom
    return (g.static if hasattr(g, "static") else g).node_rows


def main() -> None:
    # Watchdog: if the device backend never comes up (e.g. the axon TPU
    # tunnel is down, jax.devices() blocks forever inside the PJRT dial
    # loop), emit an honest error line instead of hanging the driver.
    # A thread (not SIGALRM) because the block is inside a C call.
    import threading

    init_done = threading.Event()

    def _watchdog():
        if not init_done.wait(900):
            print(json.dumps({
                "metric": "Mrays/s (BENCH FAILED: device backend init "
                          "timed out after 900s — TPU tunnel down?)",
                "value": 0.0, "unit": "Mrays/s", "vs_baseline": 0.0,
                "extra": {"error": "backend_init_timeout"},
            }), flush=True)
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    init_done.set()

    # Second watchdog: backend init can succeed while the REMOTE COMPILE
    # service is dead (observed round 5: execution of cached programs
    # worked, every fresh compile blocked forever).  If no measurement
    # completes within the budget, emit an honest error line.
    run_done = threading.Event()
    budget = int(os.environ.get("PTRT_BENCH_TOTAL_TIMEOUT", 3000))

    def _run_watchdog():
        if not run_done.wait(budget):
            print(json.dumps({
                "metric": "Mrays/s (BENCH FAILED: no measurement within "
                          "%ds — remote compile service down?)" % budget,
                "value": 0.0, "unit": "Mrays/s", "vs_baseline": 0.0,
                "extra": {"error": "compile_or_run_timeout"},
            }), flush=True)
            os._exit(4)

    threading.Thread(target=_run_watchdog, daemon=True).start()
    # Default: the BASELINE interactive config at reference scale — 1080p,
    # 4 spp, depth 4 on the ~1M-triangle showcase stand-in.  Compile through
    # the dev tunnel can take minutes cold (the persistent cache makes
    # repeat runs fast); scale down via env for quick checks
    # (PTRT_BENCH_W=640 PTRT_BENCH_H=360 PTRT_BENCH_TRIS=20000).
    w = int(os.environ.get("PTRT_BENCH_W", 1920 if on_tpu else 256))
    h = int(os.environ.get("PTRT_BENCH_H", 1080 if on_tpu else 144))
    spp = int(os.environ.get("PTRT_BENCH_SPP", 4))
    depth = int(os.environ.get("PTRT_BENCH_DEPTH", 4))
    tris = int(os.environ.get("PTRT_BENCH_TRIS",
                              1_000_000 if on_tpu else 20_000))
    frames = int(os.environ.get("PTRT_BENCH_FRAMES", 4 if on_tpu else 4))

    from ptrt_tpu.app.bench_scene import build_bench_scene

    t_setup = time.time()
    sc = build_bench_scene(w, h, target_tris=tris)
    sc.perf.enable_denoiser = False
    sc.perf.enable_bloom = False
    sc.perf.enable_motion_vectors = False
    sc.perf.samples_per_pixel = spp
    sc.perf.max_bounce_depth = depth
    sc.perf.resolution_scale = 1.0
    n_tris = sum(m.num_triangles for m in sc.meshes)
    sc._ensure_device_state()
    setup_s = time.time() - t_setup

    # One retry on transient device faults (axon tunnel flake / device
    # UNAVAILABLE): rebuild device state and re-run; if the retry also
    # fails, emit an honest error JSON line so the driver records a value.
    retried = False
    try:
        compile_s, dt, total_rays = _run_measured(sc, spp, depth, frames)
    except Exception as e:  # noqa: BLE001 — any runtime/device error
        retried = True
        err1 = f"{type(e).__name__}: {e}"
        sys.stderr.write(f"bench attempt 1 failed, retrying once: {err1}\n")
        try:
            time.sleep(10.0)
            sc._geom_dirty = True  # force device tables to re-upload
            sc._ensure_device_state()
            compile_s, dt, total_rays = _run_measured(sc, spp, depth, frames)
        except Exception as e2:  # noqa: BLE001
            print(json.dumps({
                "metric": "Mrays/s (BENCH FAILED twice: %s)"
                          % f"{type(e2).__name__}"[:80],
                "value": 0.0, "unit": "Mrays/s", "vs_baseline": 0.0,
                "extra": {"error": str(e2)[:400], "first_error": err1[:400]},
            }), flush=True)
            return

    run_done.set()  # measurement landed; phase probes may still take time
    phases = None
    if int(os.environ.get("PTRT_BENCH_PHASES", 1)):
        try:
            phases = _phase_probes(sc, depth)
        except Exception as e:  # noqa: BLE001 — attribution must not kill
            sys.stderr.write(f"phase probes failed: {e}\n")
            phases = {"error": str(e)[:200]}

    fps = frames / dt
    mrays = total_rays / dt / 1e6
    result = {
        "metric": "Mrays/s (all traced rays, showcase scene, %dx%d@%dspp d%d, %d tris)"
                  % (w, h, spp, depth, n_tris),
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 1000.0, 4),
        "extra": {
            "fps": round(fps, 2),
            "platform": jax.devices()[0].platform,
            "setup_s": round(setup_s, 2),
            "compile_s": round(compile_s, 2),
            "frames": frames,
            "rays_per_frame": round(total_rays / frames / 1e6, 2),
            "retried": retried,
        },
    }
    if phases is not None:
        result["extra"]["phases"] = phases
    print(json.dumps(result))


if __name__ == "__main__":
    main()
