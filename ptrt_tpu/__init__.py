"""ptrt_tpu — a TPU-native path-tracing / ray-tracing game engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the CUDA engine
Mark-Rindler/PTRT-game-engine: two renderers (a progressive path tracer with
NEE + MIS + SVGF-style denoiser, and a fast one-bounce PBR ray tracer), a
shared scene layer (meshes + BVH, 17-parameter PBR materials, lights, keyframe
animation, handle-based editing) and an interactive app layer.

Design stance (see SURVEY.md §7): the reference's warp-divergent CUDA
megakernel becomes a wavefront integrator over SoA ray batches; every frame
phase is one fused XLA program; vectors are structure-of-arrays so the ray
batch dimension maps onto TPU vector lanes.
"""

__version__ = "0.1.0"

from ptrt_tpu.core.vec import Vec3  # noqa: F401
