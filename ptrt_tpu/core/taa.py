"""Temporal anti-aliasing sub-pixel jitter sequences.

Equivalent of ``pathtracer/rendering/taa.cuh``: a 16-entry Halton(2,3)
jitter table, runtime Halton, and the R2 (plastic-constant) sequence.  Jitter
is returned in [-0.5, 0.5] pixel units, centered like the reference.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

TAA_SEQUENCE_LENGTH = 16

# Halton(2,3) first 16 entries (``taa.cuh:19-37``).
#
# Deliberately a NUMPY constant, not a jnp array: a module-level jax.Array
# closed over by a jitted function is embedded into the program as an MLIR
# constant via a DEVICE->HOST fetch of its value at LOWERING time.  Through
# the axon dev tunnel that one fetch measured 547 s of a 557 s lowering of
# the d2 bench trace program (tools/prof_compile_r5.py, round 5) — the
# entire mystery "compile time" of every frame program.  A numpy constant
# lowers through the fast host-side handler instead.
_HALTON_16 = np.array(
    [
        [0.500000, 0.333333],
        [0.250000, 0.666667],
        [0.750000, 0.111111],
        [0.125000, 0.444444],
        [0.625000, 0.777778],
        [0.375000, 0.222222],
        [0.875000, 0.555556],
        [0.062500, 0.888889],
        [0.562500, 0.037037],
        [0.312500, 0.370370],
        [0.812500, 0.703704],
        [0.187500, 0.148148],
        [0.687500, 0.481481],
        [0.437500, 0.814815],
        [0.937500, 0.259259],
        [0.062500, 0.592593],
    ],
    dtype=np.float32,
)


def taa_jitter(frame_index):
    """Centered sub-pixel jitter for a frame (``taa.cuh:41-63``).

    ``frame_index`` may be a traced scalar; the 16-entry table lookup is a
    tiny gather, jit-safe.
    """
    idx = jnp.asarray(frame_index, jnp.int32) % TAA_SEQUENCE_LENGTH
    h = jnp.asarray(_HALTON_16)[idx]
    return h[..., 0] - 0.5, h[..., 1] - 0.5


def taa_jitter_ndc(frame_index, width: int, height: int):
    """Jitter scaled to NDC (``taa.cuh:66-75``)."""
    jx, jy = taa_jitter(frame_index)
    return jx / float(width), jy / float(height)


def halton(index, base: int):
    """Runtime Halton radical inverse (``taa.cuh:78-90``).

    Static-unrolled to 32 digits so it traces under jit.
    """
    i = jnp.asarray(index, jnp.int32)
    result = jnp.zeros(jnp.shape(i), jnp.float32)
    f = jnp.float32(1.0 / base)
    for _ in range(32):
        result = result + f * (i % base).astype(jnp.float32)
        i = i // base
        f = f / base
    return result


def taa_jitter_extended(frame_index):
    """Extended Halton jitter beyond 16 samples (``taa.cuh:94-98``)."""
    x = halton(frame_index + 1, 2)
    y = halton(frame_index + 1, 3)
    return x - 0.5, y - 0.5


def r2_jitter(frame_index):
    """R2 plastic-constant sequence (``taa.cuh:102-110``)."""
    g = 1.32471795724
    a1 = 1.0 / g
    a2 = 1.0 / (g * g)
    f = jnp.asarray(frame_index, jnp.float32)
    x = jnp.mod(0.5 + a1 * f, 1.0)
    y = jnp.mod(0.5 + a2 * f, 1.0)
    return x - 0.5, y - 0.5
