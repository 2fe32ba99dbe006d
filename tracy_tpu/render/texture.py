"""Device-side texture sampling from the flat atlas.

Matches reference Texture::GetPixel (src/texture.h:50-57): nearest-neighbor,
repeat wrap via frac(), v flipped (`frac(1 - v)`), indices clamped to the
texture bounds. One computed gather per lookup; texture id -1 lanes read texel
0 and the caller selects the fallback value, keeping everything branch-free.
"""

from __future__ import annotations

import jax.numpy as jnp


def sample_nearest(
    tex_data: jnp.ndarray,  # [P, 4]
    tex_table: jnp.ndarray,  # [K, 4] int32 (offset, width, height, 0)
    tex_id: jnp.ndarray,  # [N] int32 (-1 allowed)
    uv: jnp.ndarray,  # [N, 2]
) -> jnp.ndarray:
    """Returns RGBA [N, 4]."""
    tid = jnp.maximum(tex_id, 0)
    entry = tex_table[tid]  # [N, 4]
    offset = entry[..., 0]
    width = entry[..., 1]
    height = entry[..., 2]
    wf = width.astype(uv.dtype)
    hf = height.astype(uv.dtype)

    u = uv[..., 0]
    v = uv[..., 1]
    fu = u - jnp.floor(u)
    fv = (1.0 - v) - jnp.floor(1.0 - v)
    i = jnp.clip(fu * wf, 0.0, wf - 1.0).astype(jnp.int32)
    j = jnp.clip(fv * hf, 0.0, hf - 1.0).astype(jnp.int32)

    flat = offset + j * width + i
    return tex_data[flat]
