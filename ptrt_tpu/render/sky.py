"""Sky sampling: vertical gradient or equirectangular HDRI environment.

Equivalent of ``sampleSky``/``sampleSkyDir`` (``render_utils.cuh:115-158``).
The HDRI is a (H, W, 3) float32 array sampled bilinearly (the reference uses
a CUDA texture object with HW bilinear filtering, ``scene.cuh:958-1026``).
Whether an env map exists is static per compiled program.

**Improvement over the reference** (SURVEY.md §7 defect list: the env map is
never importance-sampled, ``pdf.cuh:33-70`` has no env pdf): this module
also builds an **alias-method** sampler over a luminance×sin(θ) importance
map so NEE can draw env directions in O(1) — two packed-row gathers per
sample, no binary search — with an exact solid-angle pdf for MIS.  The
importance map is capped at 512×256 (sampling resolution only; radiance is
still fetched from the full-res map, so the estimator stays unbiased: the
pdf describes exactly the procedure used to sample).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ptrt_tpu.core.vec import PI, TWO_PI, Vec3, lerp

# importance-map resolution cap (alias build is O(H*W) on host)
ENV_SAMPLE_W = 512
ENV_SAMPLE_H = 256


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class SkyConfig:
    top: Vec3
    bottom: Vec3
    use_sky: jnp.ndarray  # float 0/1 multiplier
    env: Optional[jnp.ndarray] = None  # (H, W, 3) linear HDR
    env_rotation: jnp.ndarray = 0.0  # radians, yaw around +y
    # alias-method importance sampler over a (SH, SW) luminance map:
    # env_alias (SH*SW, 2): [keep_prob, bitcast(alias_idx)]
    # env_pdf   (SH*SW,):   solid-angle pdf of each importance texel
    env_alias: Optional[jnp.ndarray] = None
    env_pdf: Optional[jnp.ndarray] = None
    env_sample_hw: tuple = (0, 0)  # static (SH, SW)

    def tree_flatten(self):
        return (self.top, self.bottom, self.use_sky, self.env,
                self.env_rotation, self.env_alias,
                self.env_pdf), self.env_sample_hw

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, env_sample_hw=aux)

    @staticmethod
    def gradient(top=(0.5, 0.7, 1.0), bottom=(1.0, 1.0, 1.0)) -> "SkyConfig":
        return SkyConfig(
            top=Vec3(*[jnp.float32(c) for c in top]),
            bottom=Vec3(*[jnp.float32(c) for c in bottom]),
            use_sky=jnp.float32(1.0),
        )

    @staticmethod
    def off() -> "SkyConfig":
        return SkyConfig(
            top=Vec3.full(jnp.float32(0.0)), bottom=Vec3.full(jnp.float32(0.0)),
            use_sky=jnp.float32(0.0),
        )

    @staticmethod
    def hdri(env_map, rotation: float = 0.0,
             importance_sampling: bool = True) -> "SkyConfig":
        env_np = np.asarray(env_map, np.float32)
        alias = pdf = None
        shw = (0, 0)
        if importance_sampling:
            alias_np, pdf_np, shw = build_env_sampling(env_np)
            alias = jnp.asarray(alias_np)
            pdf = jnp.asarray(pdf_np)
        return SkyConfig(
            top=Vec3.full(jnp.float32(0.0)), bottom=Vec3.full(jnp.float32(0.0)),
            use_sky=jnp.float32(1.0), env=jnp.asarray(env_np),
            env_rotation=jnp.float32(rotation),
            env_alias=alias, env_pdf=pdf, env_sample_hw=shw,
        )

    @property
    def has_env_sampling(self) -> bool:
        return self.env_alias is not None


def build_env_sampling(env: np.ndarray,
                       max_h: int = ENV_SAMPLE_H,
                       max_w: int = ENV_SAMPLE_W):
    """Host-side alias-table build (Vose's method) over the luminance×sinθ
    importance of a (possibly downsampled) copy of the env map.

    Returns (alias (S, 2) f32 [prob | bitcast idx], pdf_sa (S,) f32 in
    1/steradian, (SH, SW)).  The pdf is EXACT for the sampling procedure
    (uniform within the chosen importance texel), so MIS stays unbiased even
    though the importance map is coarser than the radiance map.
    """
    h, w = env.shape[0], env.shape[1]
    sh, sw = min(h, max_h), min(w, max_w)
    # box-downsample luminance to the importance resolution
    lum = (0.2126 * env[..., 0] + 0.7152 * env[..., 1]
           + 0.0722 * env[..., 2]).astype(np.float64)
    if (sh, sw) != (h, w):
        ys = (np.arange(h) * sh // h)
        xs = (np.arange(w) * sw // w)
        ds = np.zeros((sh, sw))
        cnt = np.zeros((sh, sw))
        np.add.at(ds, (ys[:, None], xs[None, :]), lum)
        np.add.at(cnt, (ys[:, None], xs[None, :]), 1.0)
        lum = ds / np.maximum(cnt, 1.0)
    # blur the importance by one texel (3×3 box, wrap in x / clamp in y) so
    # the pdf covers the BILINEAR radiance footprint — texels bordering a
    # bright source otherwise get a near-zero pdf while the bilinear fetch
    # still smears source energy into them (f/p spikes -> variance)
    lum = np.maximum(lum, 0.0)
    lx = (lum + np.roll(lum, 1, axis=1) + np.roll(lum, -1, axis=1)) / 3.0
    pad = np.pad(lx, ((1, 1), (0, 0)), mode="edge")
    lum = (pad[:-2] + pad[1:-1] + pad[2:]) / 3.0

    # solid-angle weight: equirect texel dΩ = (2π/SW)(π/SH) sinθ
    theta = (np.arange(sh) + 0.5) * (np.pi / sh)
    sin_t = np.sin(theta)
    p = lum * sin_t[:, None]
    total = p.sum()
    if total <= 0.0:
        p = np.ones_like(p)
        total = p.sum()
    p = (p / total).reshape(-1)
    n = p.size

    # Vose alias method, O(n)
    scaled = p * n
    alias = np.arange(n, dtype=np.int64)
    prob = np.ones(n, dtype=np.float64)
    small = [i for i in range(n) if scaled[i] < 1.0]
    large = [i for i in range(n) if scaled[i] >= 1.0]
    while small and large:
        s = small.pop()
        l = large.pop()
        prob[s] = scaled[s]
        alias[s] = l
        scaled[l] = scaled[l] - (1.0 - scaled[s])
        (small if scaled[l] < 1.0 else large).append(l)

    d_omega = (2.0 * np.pi / sw) * (np.pi / sh) * sin_t
    pdf_sa = (p.reshape(sh, sw) /
              np.maximum(d_omega[:, None], 1e-12)).reshape(-1)

    if n >= (1 << 24):
        raise ValueError(
            f"env map has {n} texels; alias indices are float-encoded and "
            f"must stay < 2^24 — downsample the importance resolution")
    packed = np.empty((n, 2), np.float32)
    packed[:, 0] = prob.astype(np.float32)
    # alias index as an exact small-float VALUE (not a bit pattern: TPU
    # fusions flush denormal f32 loads of argument tables to zero — see
    # geometry/bvh8.pack_node_rows)
    packed[:, 1] = alias.astype(np.float32)
    return packed, pdf_sa.astype(np.float32), (sh, sw)


def sample_env(state, sky: SkyConfig):
    """Draw an env direction via the alias table (two uniforms, one packed
    gather + one pdf gather).  Returns (state, l, pdf_sa, radiance).

    The direction is jittered uniformly within the chosen importance texel;
    radiance is the full-res bilinear env fetch along l (exact).  The pdf
    of this procedure varies WITHIN the texel as 1/sin(theta) (uniform in
    (u, v), not in solid angle), so the tabulated row-center pdf is
    corrected by sin(theta_center)/sin(theta_sampled) — the same formula
    ``env_pdf_dir`` applies, keeping both MIS strategies consistent.
    """
    from ptrt_tpu.core import rng as prng

    sh, sw = sky.env_sample_hw
    n = sh * sw
    state, u1 = prng.uniform(state)
    state, u2 = prng.uniform(state)
    state, ju = prng.uniform(state)
    state, jv = prng.uniform(state)

    k = jnp.minimum((u1 * n).astype(jnp.int32), n - 1)
    row = jnp.take(sky.env_alias, k, axis=0)
    keep = u2 < row[..., 0]
    alias_idx = row[..., 1].astype(jnp.int32)
    j = jnp.where(keep, k, alias_idx)

    ty = j // sw
    tx = j - ty * sw
    # jittered direction inside the texel
    v = (ty.astype(jnp.float32) + jv) * (1.0 / sh)
    u = (tx.astype(jnp.float32) + ju) * (1.0 / sw)
    theta = v * PI
    phi = u * TWO_PI - PI - sky.env_rotation
    sin_t = jnp.sin(theta)
    l = Vec3(sin_t * jnp.cos(phi), jnp.cos(theta), sin_t * jnp.sin(phi))

    # texel-center sin (the tabulated pdf's normalization) -> per-direction
    sin_c = jnp.sin((ty.astype(jnp.float32) + 0.5) * (PI / sh))
    pdf = (jnp.take(sky.env_pdf, j, axis=0)
           * sin_c / jnp.maximum(sin_t, 1e-6))
    radiance = sample_sky(l, sky)
    return state, l, pdf, radiance


def env_pdf_dir(sky: SkyConfig, dir: Vec3) -> jnp.ndarray:
    """Solid-angle pdf the env sampler assigns to direction ``dir`` (for
    MIS-weighting BSDF-sampled sky hits)."""
    sh, sw = sky.env_sample_hw
    phi = jnp.arctan2(dir.z, dir.x) + sky.env_rotation
    theta = jnp.arccos(jnp.clip(dir.y, -1.0, 1.0))
    u = jnp.mod((phi + PI) * (1.0 / TWO_PI), 1.0)
    v = theta * (1.0 / PI)
    tx = jnp.clip((u * sw).astype(jnp.int32), 0, sw - 1)
    ty = jnp.clip((v * sh).astype(jnp.int32), 0, sh - 1)
    # same within-texel 1/sin(theta) correction as sample_env
    sin_c = jnp.sin((ty.astype(jnp.float32) + 0.5) * (PI / sh))
    sin_t = jnp.sqrt(jnp.maximum(1.0 - dir.y * dir.y, 0.0))
    return (jnp.take(sky.env_pdf, ty * sw + tx, axis=0)
            * sin_c / jnp.maximum(sin_t, 1e-6))


def sample_sky(dir: Vec3, sky: SkyConfig) -> Vec3:
    """Radiance for rays escaping to the environment."""
    if sky.env is None:
        t = 0.5 * (dir.y + 1.0)
        c = lerp(sky.bottom, sky.top, t)
        return c * sky.use_sky

    h, w = sky.env.shape[0], sky.env.shape[1]
    phi = jnp.arctan2(dir.z, dir.x) + sky.env_rotation
    theta = jnp.arccos(jnp.clip(dir.y, -1.0, 1.0))
    u = jnp.mod((phi + PI) * (1.0 / TWO_PI), 1.0)
    v = theta * (1.0 / PI)

    # bilinear fetch with wrap in u, clamp in v
    fx = u * w - 0.5
    fy = v * h - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = fx - x0
    ty = fy - y0
    x0i = jnp.mod(x0.astype(jnp.int32), w)
    x1i = jnp.mod(x0i + 1, w)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)

    def fetch(yy, xx):
        c = sky.env[yy, xx]
        return Vec3(c[..., 0], c[..., 1], c[..., 2])

    c00 = fetch(y0i, x0i)
    c01 = fetch(y0i, x1i)
    c10 = fetch(y1i, x0i)
    c11 = fetch(y1i, x1i)
    top_row = lerp(c00, c01, tx)
    bot_row = lerp(c10, c11, tx)
    return lerp(top_row, bot_row, ty) * sky.use_sky
