"""Film: progressive accumulation, tonemapping, quantization.

Equivalents of reference CPUDetails::UpdateOutput (running average
`lerp(color, old, n/(n+1))`, cpu_details.cpp:187-199) and
CPUDetails::Tonemap (exposure -> operator -> `clamp(255.99 * x, 0, 255)`,
cpu_details.cpp:218-243).
"""

from __future__ import annotations

import jax.numpy as jnp

from tracy_tpu.config import RenderConfig
from tracy_tpu.core import math as tm


def accumulate(prev: jnp.ndarray, new: jnp.ndarray, frame_counter) -> jnp.ndarray:
    """Progressive running average; frame_counter counts *completed* frames."""
    blend = frame_counter / (frame_counter + 1.0)
    return tm.lerp(new, prev, blend)


def tonemap(color: jnp.ndarray, cfg: RenderConfig) -> jnp.ndarray:
    """HDR -> display. Returns float in [0, 1] (quantize with to_u8)."""
    x = color * cfg.exposure
    if cfg.tonemap == "reinhard":
        out = tm.srgb_from_linear(tm.reinhard(x))
    elif cfg.tonemap == "aces":
        out = tm.srgb_from_linear(tm.aces(x))
    elif cfg.tonemap == "srgb":
        out = tm.srgb_from_linear(x)
    else:
        out = color
    return jnp.clip(out, 0.0, 1.0)


def to_u8(display: jnp.ndarray) -> jnp.ndarray:
    """Reference quantization: u8(clamp(255.99 * x, 0, 255))."""
    return jnp.clip(display * 255.99, 0.0, 255.0).astype(jnp.uint8)
