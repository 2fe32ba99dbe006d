"""Checkpoint/resume for progressive renders and inverse-rendering params.

The reference has NO persistence at all — accumulation state lives in RAM/GL
textures and dies on exit or camera cut (SURVEY.md §5). Here the render state
(accumulated radiance + frame counter) and trainable parameters round-trip
through npz files, so long progressive renders and optimizations survive
restarts and can resume exactly (the counter-based RNG continues the stream
deterministically from the saved frame index).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tracy_tpu.render.renderer import RenderState


def save_render_state(path: str, state: RenderState):
    np.savez(path, accum=np.asarray(state.accum), frame=np.asarray(state.frame))


def load_render_state(path: str) -> RenderState:
    data = np.load(path)
    return RenderState(
        accum=jnp.asarray(data["accum"]),
        frame=jnp.asarray(data["frame"], jnp.int32),
    )


def save_params(path: str, params):
    """Save a TrainableParams (or any flat NamedTuple of arrays)."""
    np.savez(path, **{k: np.asarray(v) for k, v in params._asdict().items()})


def load_params(path: str, cls):
    data = np.load(path)
    return cls(**{k: jnp.asarray(data[k]) for k in data.files})
