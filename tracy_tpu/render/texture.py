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


def sample_bilinear(
    tex_data: jnp.ndarray,  # [P, 4]
    tex_table: jnp.ndarray,  # [K, 4] int32 (offset, width, height, 0)
    tex_id: jnp.ndarray,  # [N] int32 (-1 allowed)
    uv: jnp.ndarray,  # [N, 2]
) -> jnp.ndarray:
    """GL_LINEAR + GL_REPEAT sampling (the raster preview's filter).

    The reference raster kernel uploads textures with MIN/MAG filter
    GL_LINEAR and REPEAT wrap (opengl_render.cpp:476-480). It also calls
    glGenerateMipmap, but with a non-MIPMAP min filter GL never samples
    the generated levels — the effective reference behavior is plain
    bilinear from level 0, which is what this implements: texel centers
    at half-integers, 2x2 footprint wrapped modulo the texture size.
    Keeps the path tracer's nearest/v-flip convention for the v axis so
    both samplers address the same texel grid.
    """
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

    # GL texel addressing: sample point in texel space, centers at +0.5.
    x = fu * wf - 0.5
    y = fv * hf - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    ax = (x - x0)[..., None]
    ay = (y - y0)[..., None]

    def wrap(i, n):
        # repeat wrap: true modulo (i can be -1 or n after the +1)
        return jnp.where(i < 0, i + n, jnp.where(i >= n, i - n, i))

    i0 = wrap(x0.astype(jnp.int32), width)
    j0 = wrap(y0.astype(jnp.int32), height)
    i1 = wrap(i0 + 1, width)
    j1 = wrap(j0 + 1, height)

    def texel(i, j):
        return tex_data[offset + j * width + i]

    top = texel(i0, j0) * (1.0 - ax) + texel(i1, j0) * ax
    bot = texel(i0, j1) * (1.0 - ax) + texel(i1, j1) * ax
    return top * (1.0 - ay) + bot * ay
