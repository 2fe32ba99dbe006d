"""Pallas TPU texture fetch: full-resolution nearest sampling on-core.

The reference CUDA kernel shades textures on-device
(src/kernels/raytracing/cuda/cuda_trace.cu:73-135, Texture::GetPixel
src/texture.h:50-57). On TPU the blocker is random access: XLA gathers
serialize (~600ns/element) and VMEM (~16MB) cannot hold a full-res atlas
(helmet: five 2048x2048 maps + an HDR sky, src/material.h:104-117). So
this module re-uses the machinery that already made BVH leaf readback
fast — per-DISTINCT-page DMA from HBM plus cheap in-row Mosaic gathers:

* Build time: each textured material's maps (which the .scn format keys to
  ONE uv set, and which in practice share dimensions) are interleaved into
  16-row x 128-lane *texel pages*, one page per 16x8 texel tile (2D tiles,
  so a coherent packet's uv footprint touches few pages). Rows 0-10 hold
  basecolor RGB, normal RGB, roughness, metalness, emissive RGB of 128
  texels — ONE page DMA serves all five material slots of a lane. The sky
  equirect gets its own pages (emissive rows). Absent slots are zero rows;
  the shade kernel selects table constants via per-material flags.
* Render time, XLA glue (pure elementwise, gather-free): the EXACT
  render/texture.py::sample_nearest index math — frac/flip/clip in f32 —
  turned into a (page, lane-in-page) pair per ray; miss lanes address the
  sky pages by their direction (integrator.py::sky_emission uv formula).
* Kernel: a drain loop DMAs each distinct page once ([16,128] HBM->VMEM)
  and extracts per-lane texels with in-row take_along_axis gathers
  (measured nearly free inside Mosaic, unlike XLA-level gathers).

Texel values are bit-identical to the XLA path's `tex_data[flat]` — the
pages are a relayout of the same f32 atlas, and the index math is the
same f32 ops — so the textured shade stage stays exactly comparable.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tracy_tpu.scene.scene import (
    SKY_MATERIAL_ID,
    TEX_BASECOLOR,
    TEX_EMISSIVE,
    TEX_METALNESS,
    TEX_NORMAL,
    TEX_ROUGHNESS,
)

PACKET = 1024
PAGE_ROWS = 16  # DMA block height (sublane multiple of 8)
PAGE_TEXELS = 128  # one lane per texel
TILE_W, TILE_H = 16, 8  # 2D texel tile covered by one page
BIGF = 3.0e38

# Page row layout (rows 11-15 zero padding).
TX_BCR, TX_BCG, TX_BCB = 0, 1, 2
TX_NMR, TX_NMG, TX_NMB = 3, 4, 5
TX_ROUGH, TX_METAL = 6, 7
TX_EMR, TX_EMG, TX_EMB = 8, 9, 10
TEXEL_ROWS = 11

_SLOT_ROWS = {
    TEX_BASECOLOR: (TX_BCR, 3),
    TEX_NORMAL: (TX_NMR, 3),
    TEX_ROUGHNESS: (TX_ROUGH, 1),
    TEX_METALNESS: (TX_METAL, 1),
    TEX_EMISSIVE: (TX_EMR, 3),
}


class TexturePages(NamedTuple):
    """Device page store + host-side per-material addressing constants."""

    pages: jnp.ndarray  # [NPAGES*16, 128] f32 (HBM)
    base: np.ndarray  # [M] int64 first page of material m, -1 = untextured
    width: np.ndarray  # [M] int64 texture width (texels)
    height: np.ndarray  # [M] int64
    tiles_x: np.ndarray  # [M] int64 pages per texel row
    flags: np.ndarray  # [M, 5] uint8 slot-present flags (TEX_* order)


def build_texture_pages(scene) -> TexturePages | None:
    """Interleave the scene's textures into per-material texel pages.

    Returns None (caller keeps the XLA shading path) when a material's
    textured slots disagree on dimensions (the page grid is shared by all
    slots of a material) or the scene has >128 materials.
    """
    tex_index = np.asarray(scene.materials.tex_index)  # [M, 5]
    num_m = tex_index.shape[0]
    if num_m > 128:
        return None
    tex_table = np.asarray(scene.tex_table)  # [K, 4] (offset, w, h, 0)
    tex_data = np.asarray(scene.tex_data, np.float32)  # [P, 4]

    base = np.full(num_m, -1, np.int64)
    width = np.zeros(num_m, np.int64)
    height = np.zeros(num_m, np.int64)
    tiles_x = np.zeros(num_m, np.int64)
    flags = np.zeros((num_m, 5), np.uint8)
    blocks = []
    next_page = 0
    for m in range(num_m):
        slots = tex_index[m]
        used = np.where(slots >= 0)[0]
        if used.size == 0:
            continue
        dims = {(int(tex_table[slots[s], 1]), int(tex_table[slots[s], 2]))
                for s in used}
        if len(dims) != 1:
            return None  # mixed dims within one material: XLA path
        w, h = dims.pop()
        tx = -(-w // TILE_W)
        ty = -(-h // TILE_H)
        npages = tx * ty
        block = np.zeros((npages, PAGE_ROWS, PAGE_TEXELS), np.float32)
        jj, ii = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        page = (jj >> 3) * tx + (ii >> 4)
        lane = (jj & 7) * TILE_W + (ii & 15)
        for s in used:
            off = int(tex_table[slots[s], 0])
            texels = tex_data[off : off + w * h].reshape(h, w, 4)
            r0, nch = _SLOT_ROWS[s]
            for c in range(nch):
                block[page, r0 + c, lane] = texels[:, :, c]
        base[m] = next_page
        width[m], height[m], tiles_x[m] = w, h, tx
        flags[m, used] = 1
        next_page += npages
        blocks.append(block.reshape(npages * PAGE_ROWS, PAGE_TEXELS))
    if next_page == 0:
        return None
    pages = np.concatenate(blocks, axis=0)
    return TexturePages(
        pages=jnp.asarray(pages), base=base, width=width, height=height,
        tiles_x=tiles_x, flags=flags,
    )


def _texel_ij(u, v, wf, hf):
    """The EXACT sample_nearest address math (render/texture.py:29-35):
    repeat wrap via frac, v flipped, clipped to bounds. Returns int32."""
    fu = u - jnp.floor(u)
    fv = (1.0 - v) - jnp.floor(1.0 - v)
    i = jnp.clip(fu * wf, 0.0, wf - 1.0).astype(jnp.int32)
    j = jnp.clip(fv * hf, 0.0, hf - 1.0).astype(jnp.int32)
    return i, j


def lane_page_indices(tp: TexturePages, mat_id, uv, direction, hit_mask,
                      alive):
    """Per-lane (page, lane-in-page) addressing — pure elementwise XLA.

    Hit lanes address their material's pages at the interpolated uv; miss
    lanes address the sky material's pages at the equirect direction uv
    (integrator.py::sky_emission). Lanes with nothing to fetch get
    page = -1. Returns (page f32, lanepos f32) ready for plane packing.
    """
    num_m = tp.base.shape[0]
    oh = (mat_id[:, None]
          == jnp.arange(num_m, dtype=mat_id.dtype)[None, :]).astype(
              jnp.float32)

    def pick(v):
        return oh @ jnp.asarray(v, jnp.float32)

    basef = pick(tp.base)
    wf = pick(tp.width)
    hf = pick(tp.height)
    txf = pick(tp.tiles_x)
    anyflag = pick(tp.flags.any(axis=1).astype(np.float32))

    u, v = uv[..., 0], uv[..., 1]
    i, j = _texel_ij(u, v, jnp.maximum(wf, 1.0), jnp.maximum(hf, 1.0))
    page_hit = basef + ((j >> 3).astype(jnp.float32) * txf
                        + (i >> 4).astype(jnp.float32))
    lane_hit = ((j & 7) * TILE_W + (i & 15)).astype(jnp.float32)
    needs_hit = hit_mask & alive & (anyflag > 0.0) & (basef >= 0.0)

    # Sky: material slot 0's emissive equirect — addressing constants are
    # STATIC (host values), the uv comes from the ray direction.
    sky_has = bool(tp.base[SKY_MATERIAL_ID] >= 0
                   and tp.flags[SKY_MATERIAL_ID, TEX_EMISSIVE])
    if sky_has:
        d = direction
        uv_sky = jnp.stack(
            [
                jnp.arctan2(d[..., 2], d[..., 0]) / (2.0 * jnp.pi) + 0.5,
                jnp.arcsin(jnp.clip(d[..., 1], -1.0, 1.0)) / jnp.pi + 0.5,
            ],
            axis=-1,
        )
        sw = float(tp.width[SKY_MATERIAL_ID])
        sh = float(tp.height[SKY_MATERIAL_ID])
        si, sj = _texel_ij(uv_sky[..., 0], uv_sky[..., 1], sw, sh)
        page_sky = (float(tp.base[SKY_MATERIAL_ID])
                    + ((sj >> 3) * int(tp.tiles_x[SKY_MATERIAL_ID])
                       + (si >> 4)).astype(jnp.float32))
        lane_sky = ((sj & 7) * TILE_W + (si & 15)).astype(jnp.float32)
        needs_sky = alive & jnp.logical_not(hit_mask)
    else:
        page_sky = jnp.zeros_like(basef)
        lane_sky = jnp.zeros_like(basef)
        needs_sky = jnp.zeros_like(hit_mask)

    page = jnp.where(needs_hit, page_hit,
                     jnp.where(needs_sky, page_sky, -1.0))
    lanepos = jnp.where(needs_hit, lane_hit, lane_sky)
    return page, lanepos


FETCH_BATCH = 8  # default batched mode: candidate pages per drained iter


def _norm_batch(batch) -> int:
    """Normalize the batch knob: False/0 = simple drain loop, True = 8,
    else an int multiple of 8 (candidates per drained iteration)."""
    if batch is True:
        b = FETCH_BATCH
    elif batch is False or batch is None:
        b = 0
    else:
        b = int(batch)
    assert b % 8 == 0 and 0 <= b <= 64, b
    return b


def _fetch_kernel(idx_ref, pages_ref, out_ref, buf, sem, *,
                  packets_per_step: int, batch: int = 0):
    for pkt in range(packets_per_step):
        pagef = idx_ref[pkt, 0]
        lanef = idx_ref[pkt, 1]
        for r in range(PAGE_ROWS):
            out_ref[pkt, r] = jnp.zeros((8, 128), jnp.float32)

        # Dead/fetch-free packet fast path: nothing to DMA.
        @pl.when(jnp.max(pagef) >= 0.0)
        def _(pkt=pkt, pagef=pagef, lanef=lanef):
            lp = lanef.astype(jnp.int32)
            work0 = jnp.where(pagef < 0.0, BIGF, pagef)

            if batch:
                # BATCHED page loop: one vector->scalar drain serves up
                # to `batch` distinct pages, and their DMAs fly
                # all-in-flight into arena slots. The serial
                # per-distinct-page drain + DMA wait of the simple loop
                # measured as the helmet bound (53.6 distinct pages per
                # wave-1 packet, BASELINE.md round-4 SoL). The per-ROW
                # min of the [8,128] work plane yields 8 candidates per
                # extraction round; batch=16 masks the first round's
                # winners and reduces again — the second round rides the
                # SAME drain (the chain is already synced by the first
                # scalar read), halving the page-loop iteration count
                # again when packets touch >8 distinct pages.
                B = batch
                rounds = B // 8

                def extract(work):
                    cands = []
                    w = work
                    for k in range(rounds):
                        rm = jnp.min(w, axis=1, keepdims=True)  # [8,1]
                        cands.append(rm)
                        if k + 1 < rounds:
                            w = jnp.where(w == rm, BIGF, w)
                    nmin = jnp.min(cands[0])  # THE drain of this iter
                    return (nmin,) + tuple(
                        rm[i, 0] for rm in cands for i in range(8))

                def body(carry):
                    work = carry[0]
                    cs = carry[2:]
                    gos = []
                    cps = []
                    for i in range(B):
                        dup = jnp.asarray(False)
                        for j in range(i):
                            dup = dup | (cs[i] == cs[j])
                        go = (cs[i] < BIGF) & jnp.logical_not(dup)
                        p = pl.multiple_of(
                            cs[i].astype(jnp.int32) * PAGE_ROWS,
                            PAGE_ROWS)
                        cp = pltpu.make_async_copy(
                            pages_ref.at[pl.ds(p, PAGE_ROWS), :],
                            buf.at[:, pl.ds(i * PAGE_TEXELS,
                                            PAGE_TEXELS)],
                            sem.at[i])
                        gos.append(go)
                        cps.append(cp)

                        @pl.when(go)
                        def _(cp=cp):
                            cp.start()
                    for i in range(B):
                        @pl.when(gos[i])
                        def _(cp=cps[i]):
                            cp.wait()
                    for i in range(B):
                        # Duplicate candidates keep go=False: their arena
                        # slot is STALE — never select on it (the first
                        # occurrence resolved those lanes already).
                        sel = (pagef == cs[i]) & gos[i]
                        for r in range(TEXEL_ROWS):
                            row = jnp.broadcast_to(
                                buf[r, i * PAGE_TEXELS:
                                    (i + 1) * PAGE_TEXELS].reshape(
                                        1, PAGE_TEXELS), (8, 128))
                            val = jnp.take_along_axis(row, lp, axis=1)
                            out_ref[pkt, r] = jnp.where(
                                sel, val, out_ref[pkt, r])
                        work = jnp.where(pagef == cs[i], BIGF, work)
                    return (work,) + extract(work)

                jax.lax.while_loop(lambda c: c[1] < BIGF, body,
                                   (work0,) + extract(work0))
            else:
                def body(carry):
                    cur, work = carry
                    p = pl.multiple_of(cur.astype(jnp.int32) * PAGE_ROWS,
                                       PAGE_ROWS)
                    cp = pltpu.make_async_copy(
                        pages_ref.at[pl.ds(p, PAGE_ROWS), :], buf,
                        sem.at[0])
                    cp.start()
                    cp.wait()
                    sel = pagef == cur
                    for r in range(TEXEL_ROWS):
                        row = jnp.broadcast_to(
                            buf[r].reshape(1, PAGE_TEXELS), (8, 128))
                        val = jnp.take_along_axis(row, lp, axis=1)
                        out_ref[pkt, r] = jnp.where(sel, val,
                                                    out_ref[pkt, r])
                    work = jnp.where(sel, BIGF, work)
                    return jnp.min(work), work

                jax.lax.while_loop(lambda c: c[0] < BIGF, body,
                                   (jnp.min(work0), work0))


def fetch_texels(pages, page, lanepos, *, interpret: bool = False,
                 packets_per_step: int = 8, batch: int | bool = False):
    """Fetch per-lane texel rows for N rays (N a multiple of 1024).

    page/lanepos: [N] f32 from lane_page_indices (page = -1 skips the
    lane; its texel planes read 0). Returns [k, PAGE_ROWS, 8, 128] planes
    (TEXEL_ROWS used) aligned with the shade kernel's packet layout.
    """
    n = page.shape[0]
    assert n % PACKET == 0, n
    k = n // PACKET
    idx = jnp.stack(
        [page.reshape(k, 8, 128), lanepos.reshape(k, 8, 128)], axis=1)

    pps = min(packets_per_step, k)
    while k % pps != 0:
        pps -= 1

    b = _norm_batch(batch)
    kernel = functools.partial(_fetch_kernel, packets_per_step=pps,
                               batch=b)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((k, PAGE_ROWS, 8, 128), jnp.float32),
        grid=(k // pps,),
        in_specs=[
            pl.BlockSpec((pps, 2, 8, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            # Pin to HBM (was pl.ANY): at 3-6.6MB node tables the compiler's
            # ANY placement put this ~50MB table in VMEM and the
            # compile 500'd with a scoped-vmem OOM (round-4 logs
            # r4_session_{z,b2}; decoded in session N2). The kernel
            # DMAs from it manually — it must NEVER leave HBM.
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec((pps, PAGE_ROWS, 8, 128),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((PAGE_ROWS, max(b, 1) * PAGE_TEXELS), jnp.float32),
            pltpu.SemaphoreType.DMA((max(b, 1),)),
        ],
        interpret=interpret,
    )(idx, pages)
