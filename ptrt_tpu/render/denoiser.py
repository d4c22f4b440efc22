"""SVGF-style spatiotemporal denoiser.

Functional rebuild of the reference ``Denoiser``
(``pathtracer/rendering/denoiser.cuh``): per-channel (diffuse/specular)
pipeline of

1. firefly suppression — neighborhood max-clamp x1.25 + hard 10-radiance cap
   (``denoiser.cuh:376-424``)
2. temporal accumulation — motion-vector reprojection with edge-aware
   bilinear history fetch, depth/normal/objectId rejection, neighborhood
   soft min/max clamp, variance-adaptive alpha, history length caps
   (``denoiser.cuh:426-584``)
3. variance estimation — temporal moments boosted by short history + 3x3
   spatial (``denoiser.cuh:586-648``)
4. a-trous wavelet iterations — 5x5 B-spline kernel, luminance-sigma edge
   stop, hard depth/normal/objectId rejection, dilation 1,2,4,8,16
   (``denoiser.cuh:650-749``)

then split-channel recombine with emission (``denoiser.cuh:765-779``).

All neighborhood ops are static shifts (conv-shaped — ideal for TPU); the
only gather is the history reprojection fetch.  State is a pytree threaded
through the jitted frame program.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ptrt_tpu.core.vec import Vec3, vmax, vmin, where

SKY_DEPTH_THRESHOLD = 1e9  # denoiser.cuh:63


@dataclass(frozen=True)
class ChannelSettings:
    tau: float
    min_alpha: float
    max_history: float
    sigma_luminance: float
    sigma_normal: float
    sigma_depth: float
    atrous_iterations: int
    clamp_scale: float
    firefly_threshold: float


@dataclass(frozen=True)
class DenoiserSettings:
    """``DenoiserSettings`` (``denoiser.cuh:36-73``)."""

    diffuse: ChannelSettings = ChannelSettings(
        tau=0.06, min_alpha=0.05, max_history=32.0, sigma_luminance=4.0,
        sigma_normal=64.0, sigma_depth=0.5, atrous_iterations=5,
        clamp_scale=1.2, firefly_threshold=3.0)
    specular: ChannelSettings = ChannelSettings(
        tau=0.12, min_alpha=0.2, max_history=6.0, sigma_luminance=1.0,
        sigma_normal=128.0, sigma_depth=0.2, atrous_iterations=2,
        clamp_scale=2.0, firefly_threshold=8.0)
    depth_reject_absolute: float = 0.1
    depth_reject_relative: float = 0.005
    normal_reject_threshold: float = 0.95
    sky_depth_threshold: float = 1e9
    edge_depth_threshold: float = 0.01
    edge_normal_threshold: float = 0.95
    use_edge_aware_sampling: bool = True
    use_object_ids: bool = True
    enable_firefly_suppression: bool = True
    enable_split_denoising: bool = True
    # Specular history control from the roughness/transmission G-buffers
    # (the reference carries them for exactly this, ``scene.cuh:118-127``):
    # mirror-like surfaces see view-dependent radiance that surface motion
    # vectors do NOT reproject, so their history cap shrinks toward 1 as
    # roughness -> 0 (full cap at roughness >= spec_roughness_ref); the
    # temporal alpha floor 1/(cap+1) then blends new frames in fast enough
    # that moving-camera reflections stop ghosting.  Transmissive surfaces
    # (refraction, also view-dependent) are capped at
    # transmissive_history_cap.  Diffuse history is untouched.
    spec_roughness_history: bool = True
    spec_roughness_ref: float = 0.35
    transmissive_history_cap: float = 2.0


DEFAULT_SETTINGS = DenoiserSettings()


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class ChannelHistory:
    mean: Vec3
    m2: Vec3
    length: jnp.ndarray

    def tree_flatten(self):
        return (self.mean, self.m2, self.length), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class DenoiserState:
    diffuse: ChannelHistory
    specular: ChannelHistory
    normal: Vec3
    depth: jnp.ndarray
    object_id: jnp.ndarray
    first_frame: jnp.ndarray  # bool scalar

    def tree_flatten(self):
        return (self.diffuse, self.specular, self.normal, self.depth,
                self.object_id, self.first_frame), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def init_denoiser_state(height: int, width: int) -> DenoiserState:
    z3 = Vec3.zeros((height, width))
    z = jnp.zeros((height, width))
    hist = ChannelHistory(mean=z3, m2=z3, length=z)
    return DenoiserState(
        diffuse=hist, specular=hist, normal=z3,
        # strong-typed f32 (jnp.full with a Python scalar is WEAK-typed,
        # which mismatches the frame program's output avals and forces a
        # full retrace+recompile of the frame program on frame 2)
        depth=jnp.full((height, width), 1e30, jnp.float32),
        object_id=jnp.full((height, width), -1, jnp.int32),
        first_frame=jnp.asarray(True),
    )


# -- small vector-image helpers ---------------------------------------------


def _is_sky(depth, normal: Vec3, threshold):
    """``denoiser.cuh:118-122``."""
    return (depth > threshold) | (normal.dot(normal) < 0.1)


def _shift(a, dy: int, dx: int):
    """Shifted copy with zero pad + validity mask (skip-OOB semantics).
    Shifts >= the image extent (à-trous dilation 16 -> ±32-pixel taps on a
    sub-32-pixel image) are fully out of bounds -> all zeros."""
    h, w = a.shape[-2], a.shape[-1]
    out = jnp.zeros_like(a)
    ys0, ys1 = max(0, dy), min(h, h + dy)
    xs0, xs1 = max(0, dx), min(w, w + dx)
    if ys0 >= ys1 or xs0 >= xs1:
        return out
    src = a[..., ys0 - dy: ys1 - dy, xs0 - dx: xs1 - dx]
    out = out.at[..., ys0:ys1, xs0:xs1].set(src)
    return out


def _shift_mask(shape, dy: int, dx: int):
    h, w = shape
    m = jnp.zeros((h, w), bool)
    ys0, ys1 = max(0, dy), min(h, h + dy)
    xs0, xs1 = max(0, dx), min(w, w + dx)
    if ys0 >= ys1 or xs0 >= xs1:
        return m
    return m.at[ys0:ys1, xs0:xs1].set(True)


def _shift3(v: Vec3, dy: int, dx: int) -> Vec3:
    return v.map(lambda c: _shift(c, dy, dx))


def _edge_discontinuity(d0, d1, n0: Vec3, n1: Vec3, o0, o1, depth_thr,
                        normal_thr, use_obj: bool):
    """``is_edge_discontinuity`` (``denoiser.cuh:196-216``)."""
    edge = jnp.zeros_like(d0, bool)
    if use_obj:
        edge = edge | ((o0 != o1) & (o0 >= 0) & (o1 >= 0))
    max_d = jnp.maximum(d0, d1)
    edge = edge | ((max_d > 1e-6) & (jnp.abs(d0 - d1) / jnp.maximum(max_d, 1e-6)
                                     > depth_thr))
    edge = edge | (n0.dot(n1) < normal_thr)
    return edge


def firefly_suppression(img: Vec3, depth, normal: Vec3, threshold,
                        sky_threshold) -> Vec3:
    """``firefly_suppression_kernel`` (``denoiser.cuh:376-424``)."""
    shape = img.x.shape
    max_n = Vec3.zeros(shape)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            max_n = vmax(max_n, _shift3(img, dy, dx))
    clamped = vmin(img, max_n * 1.25)
    clamped = vmin(clamped, Vec3.full(10.0))
    sky = _is_sky(depth, normal, sky_threshold)
    return where(sky, img, clamped)


def _gather2d(a, yi, xi):
    w = a.shape[-1]
    flat = a.reshape(a.shape[:-2] + (-1,))
    return jnp.take(flat, yi * w + xi, axis=-1)


def _gather3(v: Vec3, yi, xi) -> Vec3:
    return Vec3(_gather2d(v.x, yi, xi), _gather2d(v.y, yi, xi),
                _gather2d(v.z, yi, xi))


def _edge_aware_bilinear(bufs, prev_depth, prev_normal: Vec3, prev_obj,
                         px, py, center_d, center_n: Vec3, center_obj,
                         cfg: DenoiserSettings):
    """Edge-aware bilinear history fetch (``denoiser.cuh:229-311``).

    ``bufs`` is a list of (Vec3 | array); returns fetched values in order.
    """
    h, w = prev_depth.shape
    fx = px - 0.5
    fy = py - 0.5
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    sx = fx - x0
    sy = fy - y0
    x0c = jnp.clip(x0, 0, w - 1)
    y0c = jnp.clip(y0, 0, h - 1)
    x1c = jnp.clip(x0 + 1, 0, w - 1)
    y1c = jnp.clip(y0 + 1, 0, h - 1)

    corners = [(y0c, x0c, (1 - sx) * (1 - sy)), (y0c, x1c, sx * (1 - sy)),
               (y1c, x0c, (1 - sx) * sy), (y1c, x1c, sx * sy)]

    weights = []
    for yy, xx, wgt in corners:
        dd = _gather2d(prev_depth, yy, xx)
        nn = _gather3(prev_normal, yy, xx)
        oo = _gather2d(prev_obj, yy, xx) if cfg.use_object_ids else None
        invalid = _edge_discontinuity(
            center_d, dd, center_n, nn, center_obj, oo,
            cfg.edge_depth_threshold, cfg.edge_normal_threshold,
            cfg.use_object_ids)
        weights.append(jnp.where(invalid, 0.0, wgt))

    total_w = sum(weights)
    fallback = total_w < 1e-6
    # nearest fallback (denoiser.cuh:296-305)
    nx = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, w - 1)
    ny = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, h - 1)
    inv_w = 1.0 / jnp.maximum(total_w, 1e-6)

    out = []
    for buf in bufs:
        if isinstance(buf, Vec3):
            acc = Vec3.zeros(px.shape)
            for (yy, xx, _), wgt in zip(corners, weights):
                acc = acc + _gather3(buf, yy, xx) * wgt
            blended = acc * inv_w
            near = _gather3(buf, ny, nx)
            out.append(where(fallback, near, blended))
        else:
            acc = jnp.zeros(px.shape)
            for (yy, xx, _), wgt in zip(corners, weights):
                acc = acc + _gather2d(buf, yy, xx) * wgt
            blended = acc * inv_w
            near = _gather2d(buf, ny, nx)
            out.append(jnp.where(fallback, near, blended))
    return out


def temporal_accumulation(cur: Vec3, hist: ChannelHistory, mvx, mvy, depth,
                          normal: Vec3, obj_id, state: DenoiserState,
                          ch: ChannelSettings, cfg: DenoiserSettings,
                          hist_cap=None):
    """``temporal_accumulation_kernel`` (``denoiser.cuh:426-584``).

    ``hist_cap``: optional per-pixel history-length cap (the specular
    channel passes a roughness/transmission-derived cap, see
    ``DenoiserSettings.spec_roughness_history``); defaults to the
    channel's scalar ``max_history``."""
    h, w = depth.shape
    shape = (h, w)

    # 3x3 neighborhood statistics of the current frame (same-surface only)
    n_mean = Vec3.zeros(shape)
    n_m2 = Vec3.zeros(shape)
    n_cnt = jnp.zeros(shape)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            # clamped shifts (reference clamps indices here)
            nc = _shift3_clamp(cur, dy, dx)
            nd = _shift_clamp(depth, dy, dx)
            nn = _shift3_clamp(normal, dy, dx)
            no = _shift_clamp(obj_id, dy, dx) if cfg.use_object_ids else None
            same = jnp.logical_not(_edge_discontinuity(
                depth, nd, normal, nn, obj_id, no, cfg.edge_depth_threshold,
                cfg.edge_normal_threshold, cfg.use_object_ids))
            wgt = jnp.where(same, 1.0, 0.0)
            n_mean = n_mean + nc * wgt
            n_m2 = n_m2 + nc * nc * wgt
            n_cnt = n_cnt + wgt

    empty = n_cnt == 0
    n_cnt = jnp.maximum(n_cnt, 1.0)
    inv = 1.0 / n_cnt
    n_mean = where(empty, cur, n_mean * inv)
    n_m2 = where(empty, cur * cur, n_m2 * inv)
    n_var = vmax(n_m2 - n_mean * n_mean, Vec3.full(0.0))
    n_std = n_var.sqrt()
    soft_min = n_mean - n_std * ch.clamp_scale
    soft_max = n_mean + n_std * ch.clamp_scale

    # reproject (denoiser.cuh:509-513)
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    prev_u = xs + 0.5 - mvx * w
    prev_v = ys + 0.5 - mvy * h
    prev_u = jnp.broadcast_to(prev_u, shape) if prev_u.shape != shape else prev_u
    prev_v = jnp.broadcast_to(prev_v, shape) if prev_v.shape != shape else prev_v

    in_bounds = ((prev_u >= 0.5) & (prev_v >= 0.5) & (prev_u < w - 0.5)
                 & (prev_v < h - 0.5))

    hist_mean, hist_m2, hist_len, hist_d = _edge_aware_bilinear(
        [hist.mean, hist.m2, hist.length, state.depth],
        state.depth, state.normal, state.object_id, prev_u, prev_v, depth,
        normal, obj_id, cfg)

    valid = in_bounds
    if cfg.use_object_ids:
        nxp = jnp.clip(jnp.floor(prev_u).astype(jnp.int32), 0, w - 1)
        nyp = jnp.clip(jnp.floor(prev_v).astype(jnp.int32), 0, h - 1)
        hist_obj = _gather2d(state.object_id, nyp, nxp)
        valid = valid & (hist_obj == obj_id)

    dd = jnp.abs(depth - hist_d)
    valid = valid & jnp.logical_not(
        (dd > cfg.depth_reject_absolute)
        | (dd > cfg.depth_reject_relative * jnp.maximum(1e-6, depth)))

    nxp = jnp.clip(jnp.floor(prev_u).astype(jnp.int32), 0, w - 1)
    nyp = jnp.clip(jnp.floor(prev_v).astype(jnp.int32), 0, h - 1)
    hist_n = _gather3(state.normal, nyp, nxp)
    valid = valid & (normal.dot(hist_n) >= cfg.normal_reject_threshold)

    hist_mean = where(valid, vmin(vmax(hist_mean, soft_min), soft_max),
                      hist_mean)

    # variance-adaptive alpha (denoiser.cuh:566-578)
    cap = ch.max_history if hist_cap is None else hist_cap
    # clamp BEFORE the alpha so a shrunken per-pixel cap (camera swung onto
    # a mirror, material edit) raises the alpha floor 1/(cap+1) immediately
    hist_len = jnp.minimum(hist_len, cap)
    var = vmax(hist_m2 - hist_mean * hist_mean, Vec3.full(0.0))
    std_approx = (jnp.sqrt(var.x) + jnp.sqrt(var.y) + jnp.sqrt(var.z)) / 3.0
    variance_alpha = std_approx / (std_approx + ch.tau)
    history_alpha = 1.0 / (hist_len + 1.0)
    alpha = jnp.clip(jnp.maximum(variance_alpha, history_alpha), ch.min_alpha,
                     1.0)
    alpha = jnp.where(valid, alpha, 1.0)
    new_len = jnp.where(valid, jnp.minimum(hist_len + 1.0, cap), 1.0)

    out_mean = hist_mean * (1.0 - alpha) + cur * alpha
    out_m2 = hist_m2 * (1.0 - alpha) + cur * cur * alpha

    sky = _is_sky(depth, normal, cfg.sky_depth_threshold)
    out_mean = where(sky, cur, out_mean)
    out_m2 = where(sky, cur * cur, out_m2)
    new_len = jnp.where(sky, 1.0, new_len)
    return ChannelHistory(mean=out_mean, m2=out_m2, length=new_len)


def _shift_clamp(a, dy: int, dx: int):
    """Edge-clamped shift (reference clamps coords in the 3x3 loops)."""
    h, w = a.shape[-2], a.shape[-1]
    pad_width = [(0, 0)] * (a.ndim - 2) + [(1, 1), (1, 1)]
    p = jnp.pad(a, pad_width, mode="edge")
    return p[..., 1 - dy: 1 - dy + h, 1 - dx: 1 - dx + w]


def _shift3_clamp(v: Vec3, dy: int, dx: int) -> Vec3:
    return v.map(lambda c: _shift_clamp(c, dy, dx))


def estimate_variance(hist: ChannelHistory, depth, normal: Vec3, obj_id,
                      cfg: DenoiserSettings):
    """``estimate_variance_kernel`` (``denoiser.cuh:586-648``)."""
    c = hist.mean
    var = vmax(hist.m2 - c * c, Vec3.full(0.0))
    reliability = jnp.minimum(hist.length * 0.25, 1.0)
    boost = 1.0 + (1.0 - reliability) * 3.0

    sp_mean = Vec3.zeros(depth.shape)
    sp_m2 = Vec3.zeros(depth.shape)
    cnt = jnp.zeros(depth.shape)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            nc = _shift3_clamp(c, dy, dx)
            keep = jnp.ones(depth.shape, bool)
            if cfg.use_object_ids:
                keep = _shift_clamp(obj_id, dy, dx) == obj_id
            wgt = jnp.where(keep, 1.0, 0.0)
            sp_mean = sp_mean + nc * wgt
            sp_m2 = sp_m2 + nc * nc * wgt
            cnt = cnt + wgt
    inv = 1.0 / jnp.maximum(cnt, 1.0)
    sp_mean = sp_mean * inv
    sp_m2 = sp_m2 * inv
    sp_var = vmax(sp_m2 - sp_mean * sp_mean, Vec3.full(0.0))

    combined = vmax(var * boost, sp_var)
    out = combined.luminance()
    sky = _is_sky(depth, normal, cfg.sky_depth_threshold)
    return jnp.where(sky, 0.0, out)


_ATROUS_W = [1.0 / 256, 4.0 / 256, 6.0 / 256, 4.0 / 256, 1.0 / 256]


def atrous_iteration(img: Vec3, variance, depth, normal: Vec3, obj_id,
                     step: int, ch: ChannelSettings, cfg: DenoiserSettings):
    """One ``atrous_filter_kernel`` pass (``denoiser.cuh:650-749``)."""
    shape = depth.shape
    center_lum = img.luminance()
    var_scale = jnp.sqrt(jnp.maximum(variance, 1e-6))
    adaptive_sigma = ch.sigma_luminance * (1.0 + var_scale * 2.0)
    inv_sigma_sq = 1.0 / (2.0 * adaptive_sigma * adaptive_sigma + 1e-6)

    acc = Vec3.zeros(shape)
    acc_var = jnp.zeros(shape)
    total_w = jnp.zeros(shape)
    sky_c = _is_sky(depth, normal, cfg.sky_depth_threshold)

    for dy in (-2, -1, 0, 1, 2):
        for dx in (-2, -1, 0, 1, 2):
            # 5x5 B-spline kernel entry: outer((1,4,6,4,1))/256
            # (denoiser.cuh:141-148)
            k_w = _ATROUS_W[dy + 2] * _ATROUS_W[dx + 2] * 256.0
            sy, sx = dy * step, dx * step
            valid = _shift_mask(shape, sy, sx)
            n_c = _shift3(img, sy, sx)
            n_var = _shift(variance, sy, sx)
            n_d = _shift(depth, sy, sx)
            n_n = _shift3(normal, sy, sx)

            keep = valid
            if cfg.use_object_ids:
                n_o = _shift(obj_id, sy, sx)
                keep = keep & jnp.logical_not(
                    (obj_id != n_o) & (obj_id >= 0) & (n_o >= 0))
            max_d = jnp.maximum(depth, n_d)
            keep = keep & jnp.logical_not(
                (max_d > 1e-6)
                & (jnp.abs(depth - n_d) / jnp.maximum(max_d, 1e-6)
                   > cfg.edge_depth_threshold))
            keep = keep & (normal.dot(n_n) >= cfg.edge_normal_threshold)
            keep = keep & jnp.logical_not(
                _is_sky(n_d, n_n, cfg.sky_depth_threshold))

            lum_diff = jnp.abs(center_lum - n_c.luminance())
            w_l = jnp.exp(-lum_diff * lum_diff * inv_sigma_sq)
            wgt = jnp.where(keep, k_w * w_l, 0.0)

            acc = acc + n_c * wgt
            acc_var = acc_var + n_var * wgt
            total_w = total_w + wgt

    ok = total_w >= 1e-6
    inv_w = 1.0 / jnp.maximum(total_w, 1e-6)
    out = where(ok & jnp.logical_not(sky_c), acc * inv_w, img)
    out_var = jnp.where(ok & jnp.logical_not(sky_c), acc_var * inv_w, variance)
    return out, out_var


def denoise_channel(src: Vec3, hist: ChannelHistory, mvx, mvy, depth,
                    normal: Vec3, obj_id, state: DenoiserState,
                    ch: ChannelSettings, cfg: DenoiserSettings,
                    hist_cap=None):
    """``Denoiser::denoiseChannel`` (``denoiser.cuh:884-971``)."""
    if cfg.enable_firefly_suppression:
        src = firefly_suppression(src, depth, normal, ch.firefly_threshold,
                                  cfg.sky_depth_threshold)

    # first frame: history = current (denoiser.cuh:913-919)
    first = state.first_frame
    hist = ChannelHistory(
        mean=where(first, src, hist.mean),
        m2=where(first, src * src, hist.m2),
        length=jnp.where(first, 1.0, hist.length),
    )

    new_hist = temporal_accumulation(src, hist, mvx, mvy, depth, normal,
                                     obj_id, state, ch, cfg,
                                     hist_cap=hist_cap)
    variance = estimate_variance(new_hist, depth, normal, obj_id, cfg)

    img = new_hist.mean
    steps = [1, 2, 4, 8, 16]
    for i in range(min(ch.atrous_iterations, 5)):
        img, variance = atrous_iteration(img, variance, depth, normal, obj_id,
                                         steps[i], ch, cfg)
    return img, new_hist


def denoise_frame(bufs, mv, state: DenoiserState, camera, frame_idx,
                  settings: DenoiserSettings = DEFAULT_SETTINGS):
    """``Denoiser::denoise`` (``denoiser.cuh:973-1057``): split-channel
    denoise + recombine with emission.  Returns (color, new_state)."""
    mvx, mvy = mv
    depth = bufs.depth
    normal = bufs.normal
    obj_id = bufs.object_id

    spec_cap = None
    if settings.spec_roughness_history:
        # roughness/transmission-driven specular history cap
        # (``scene.cuh:118-127`` G-buffers, consumed here): mirror-like or
        # transmissive pixels keep almost no history because their radiance
        # is view-dependent and surface motion vectors mis-reproject it
        rf = jnp.clip(bufs.roughness / max(settings.spec_roughness_ref,
                                           1e-3), 0.0, 1.0)
        spec_cap = 1.0 + rf * (settings.specular.max_history - 1.0)
        spec_cap = jnp.where(
            bufs.transmission > 0.5,
            jnp.minimum(spec_cap, settings.transmissive_history_cap),
            spec_cap)

    if settings.enable_split_denoising:
        out_d, hist_d = denoise_channel(
            bufs.diffuse, state.diffuse, mvx, mvy, depth, normal, obj_id,
            state, settings.diffuse, settings)
        out_s, hist_s = denoise_channel(
            bufs.specular, state.specular, mvx, mvy, depth, normal, obj_id,
            state, settings.specular, settings, hist_cap=spec_cap)
        out = out_d + out_s + bufs.emission
    else:
        out, hist_d = denoise_channel(
            bufs.color, state.diffuse, mvx, mvy, depth, normal, obj_id,
            state, settings.diffuse, settings)
        hist_s = state.specular

    new_state = DenoiserState(
        diffuse=hist_d, specular=hist_s, normal=normal, depth=depth,
        object_id=obj_id, first_frame=jnp.asarray(False),
    )
    return out, new_state
