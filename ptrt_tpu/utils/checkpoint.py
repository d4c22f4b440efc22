"""Render-state checkpoint / resume.

The reference has no checkpointing (SURVEY.md §5); its closest mechanism is
the progressive accumulation state + PPM export.  In the rebuild the render
state is a pytree, so save/restore is trivial: denoiser history, RNG states,
frame counters and camera go into one ``.npz``; a resumed session continues
temporal accumulation exactly where it left off.
"""

from __future__ import annotations

import json

import jax
import numpy as np


def _flatten_state(scene) -> dict:
    out = {
        "frame_count": np.asarray(scene.frame_count),
        "prev_view_proj": np.asarray(scene.prev_view_proj),
    }
    if scene._rng_state is not None:
        out["rng_state"] = np.asarray(scene._rng_state)
    if scene._denoiser_state is not None:
        leaves, treedef = jax.tree_util.tree_flatten(scene._denoiser_state)
        for i, leaf in enumerate(leaves):
            out[f"den_{i}"] = np.asarray(leaf)
        out["den_count"] = np.asarray(len(leaves))
    if getattr(scene, "_accum_state", None) is not None:
        # progressive accumulation (round-5): radiance sum + frame count
        leaves, _ = jax.tree_util.tree_flatten(scene._accum_state)
        for i, leaf in enumerate(leaves):
            out[f"acc_{i}"] = np.asarray(leaf)
        out["acc_count"] = np.asarray(len(leaves))
        if scene._accum_cam_sig is not None:
            out["acc_cam_sig"] = np.asarray(scene._accum_cam_sig)
    return out


def save_render_state(scene, path: str) -> None:
    """Persist a PT Scene's progressive/temporal state."""
    np.savez_compressed(path, **_flatten_state(scene))


def load_render_state(scene, path: str) -> None:
    """Restore state saved by ``save_render_state`` into a scene with the
    same resolution/configuration."""
    import jax.numpy as jnp

    from ptrt_tpu.render.denoiser import init_denoiser_state

    data = np.load(path)
    scene.frame_count = int(data["frame_count"])
    scene.prev_view_proj = jnp.asarray(data["prev_view_proj"])
    if "rng_state" in data:
        scene._rng_state = jnp.asarray(data["rng_state"])
        scene._rng_res = scene._rng_state.shape
    if "den_count" in data:
        n = int(data["den_count"])
        rh, rw = scene.render_size
        template = init_denoiser_state(rh, rw)
        leaves, treedef = jax.tree_util.tree_flatten(template)
        new_leaves = [jnp.asarray(data[f"den_{i}"]) for i in range(n)]
        scene._denoiser_state = jax.tree_util.tree_unflatten(
            treedef, new_leaves)
    if "acc_count" in data:
        from ptrt_tpu.scene.pt_scene import _accum_init

        n = int(data["acc_count"])
        rh, rw = scene.render_size
        _, treedef = jax.tree_util.tree_flatten(_accum_init(rh, rw))
        scene._accum_state = jax.tree_util.tree_unflatten(
            treedef, [jnp.asarray(data[f"acc_{i}"]) for i in range(n)])
        if "acc_cam_sig" in data:
            scene._accum_cam_sig = np.asarray(data["acc_cam_sig"])
