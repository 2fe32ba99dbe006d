"""Pallas TPU shading stage: one bounce of the wavefront, on-core.

Port of the post-intersect half of the integrator's bounce step
(render/integrator.py bounce_step: material table lookup, the Unreal-ish
Material::Scatter semantics of reference material.h:210-268, constant-sky
miss emission of cpu_trace.cpp:147-156, Russian roulette of
cpu_trace.cpp:158-166) to [8, 128] vector planes, including the
counter-based RNG (core/rng.py 'fast') evaluated INSIDE the kernel from
the per-lane pixel ids — so a bounce's shading does no XLA-side math at
all. Untextured scenes only (every texture fetch is statically absent;
textured scenes keep the XLA shading path): the sky is material slot 0's
constant emissive, exactly like render/integrator.py::sky_emission.

Numerics are matched op-for-op against the XLA path (same formula order,
same normalize/reflect/refract clamps, same one-hot-exact material table
values, same RNG hash), so interpret-mode tests assert BIT-IDENTICAL
next-state planes. The RR kill decision is inherently detached here (the
kernel has no VJP); the renderer only routes through this stage for
non-differentiated rendering.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tracy_tpu.core import math as tm
from tracy_tpu.render.material import RAY_OFFSET

EPS = float(tm.EPS)
PACKET = 1024
# state plane indices (input AND output layout; pix is input-only, last)
_S_OX, _S_OY, _S_OZ, _S_DX, _S_DY, _S_DZ = range(6)
_S_TR, _S_TG, _S_TB, _S_RR, _S_RG, _S_RB = range(6, 12)
_S_ALIVE = 12
_S_PIX = 13
STATE_PLANES = 14  # input; output omits pix -> 13
# hit plane indices
_H_MASK, _H_T, _H_NX, _H_NY, _H_NZ, _H_MAT = range(6)
HIT_PLANES = 6
# material table rows (columns = materials, padded to 128)
_M_AR, _M_AG, _M_AB, _M_ROUGH, _M_METAL, _M_IOR = range(6)
_M_ER, _M_EG, _M_EB, _M_TRANSL = range(6, 10)
MTAB_ROWS = 10
# textured-table extension: per-material slot-present flags (TEX_* order),
# row 15 zero pad -> 16 rows (8-multiple sublane block).
_M_HASBC, _M_HASN, _M_HASR, _M_HASM, _M_HASE = range(10, 15)
MTAB_TEX_ROWS = 16

# RNG draw ids (render/integrator.py)
_DRAW_SPHERE_Z, _DRAW_SPHERE_PHI, _DRAW_SPECULAR, _DRAW_ROULETTE = range(4)
# Weyl constants (core/rng.py)
_K_FRAME = 0x85EBCA6B
_K_BOUNCE = 0xC2B2AE35
_K_DRAW = 0x27D4EB2F
_K_PIXEL = 0x9E3779B9


def _pcg_hash(x):
    x = x * jnp.uint32(747796405) + jnp.uint32(2891336453)
    x = ((x >> ((x >> jnp.uint32(28)) + jnp.uint32(4))) ^ x) * jnp.uint32(
        277803737
    )
    return (x >> jnp.uint32(22)) ^ x


def _kernel(sc_ref, state_ref, hit_ref, mtab_ref, out_ref,
            *, num_materials: int, seed: int, russian_roulette: bool,
            packets_per_step: int):
    sample_key = sc_ref[0].astype(jnp.uint32)
    bounce = sc_ref[1].astype(jnp.uint32)

    for pkt in range(packets_per_step):
        # Dead-packet fast path (mirrors the intersect kernel's): on late
        # waves with deep compaction most packets have no live lane — their
        # next state is their current state, verbatim.
        any_live = jnp.max(state_ref[pkt, _S_ALIVE]) > 0.0

        @pl.when(any_live)
        def _(pkt=pkt):
            _shade_packet(sample_key, bounce, state_ref, hit_ref, mtab_ref,
                          out_ref, pkt, num_materials=num_materials,
                          seed=seed, russian_roulette=russian_roulette)

        @pl.when(jnp.logical_not(any_live))
        def _(pkt=pkt):
            for k in range(STATE_PLANES - 1):
                out_ref[pkt, k] = state_ref[pkt, k]


def _shade_packet(sample_key, bounce, state_ref, hit_ref, mtab_ref, out_ref,
                  pkt, *, num_materials: int, seed: int,
                  russian_roulette: bool):
    state = tuple(state_ref[pkt, k] for k in range(STATE_PLANES))
    hitp = tuple(hit_ref[pkt, k] for k in range(HIT_PLANES))

    def mread(row, m):
        return mtab_ref[row, m]

    outs = shade_planes(sample_key, bounce, state, hitp, mread,
                        num_materials=num_materials, seed=seed,
                        russian_roulette=russian_roulette)
    for k, v in enumerate(outs):
        out_ref[pkt, k] = v


def shade_planes(sample_key, bounce, state, hitp, mread, *,
                 num_materials: int, seed: int, russian_roulette: bool,
                 texels=None, sky_has_tex: bool = False):
    """One bounce of shading on [8, 128] planes — pure values, no refs,
    shared by the standalone shade kernel and the fused bounce kernel.

    state: 14 planes (STATE_PLANES order); hitp: 6 planes (HIT_PLANES
    order), or 9 with the interpolated tangent appended when `texels` is
    given; mread(row, m) -> scalar material-table entry. Returns the 13
    output planes (STATE_PLANES minus pix).

    texels: optional tuple of TEXEL_ROWS planes from the texture fetch
    kernel (ops/pallas_texfetch.py) — per-lane full-res nearest samples.
    With texels, material parameters are texture-overridden per the
    _M_HAS* flag rows and the normal is tangent-space normal-mapped,
    matching render/material.py::gather_surface_params op-for-op; miss
    lanes' sky emission comes from the sky texel rows when sky_has_tex
    (reference material.h:164-203, cuda_trace.cu:73-135)."""
    ox, oy, oz = (state[k] for k in (_S_OX, _S_OY, _S_OZ))
    dx, dy, dz = (state[k] for k in (_S_DX, _S_DY, _S_DZ))
    thr = [state[k] for k in (_S_TR, _S_TG, _S_TB)]
    rad = [state[k] for k in (_S_RR, _S_RG, _S_RB)]
    alive = state[_S_ALIVE] > 0.0
    pix = jax.lax.bitcast_convert_type(state[_S_PIX], jnp.uint32)

    hmask = hitp[_H_MASK] > 0.0
    t = hitp[_H_T]
    nx, ny, nz = (hitp[k] for k in (_H_NX, _H_NY, _H_NZ))
    mat = hitp[_H_MAT]

    hit_mask = hmask & alive
    miss_mask = alive & jnp.logical_not(hmask)

    # ---- counter RNG (core/rng.py::_mix, bit-identical) ------------------
    def rand(draw):
        h = jnp.uint32(seed) + pix * jnp.uint32(_K_PIXEL)
        h = _pcg_hash(h + sample_key * jnp.uint32(_K_FRAME))
        h = _pcg_hash(h + bounce * jnp.uint32(_K_BOUNCE)
                      + jnp.uint32(draw) * jnp.uint32(_K_DRAW))
        bits = _pcg_hash(h)
        # Mosaic has no uint32->float32 cast; bits>>8 fits in 24 bits, so
        # routing through int32 is bit-identical (value < 2^24, sign-safe).
        return (bits >> jnp.uint32(8)).astype(jnp.int32).astype(
            jnp.float32) * jnp.float32(1.0 / 16777216.0)

    r_z = rand(_DRAW_SPHERE_Z)
    r_phi = rand(_DRAW_SPHERE_PHI)
    r_spec = rand(_DRAW_SPECULAR)

    # ---- material table rows by masked select (M is tiny, exact) ---------
    def mrow(row):
        v = jnp.zeros_like(t)
        for m in range(num_materials):
            v = jnp.where(mat == float(m), mread(row, m), v)
        return v

    bc = [mrow(_M_AR), mrow(_M_AG), mrow(_M_AB)]
    rough = mrow(_M_ROUGH)
    metal = mrow(_M_METAL)
    ior = mrow(_M_IOR)
    emis = [mrow(_M_ER), mrow(_M_EG), mrow(_M_EB)]
    transl = mrow(_M_TRANSL)

    if texels is not None:
        from tracy_tpu.ops.pallas_texfetch import (
            TX_BCR, TX_EMR, TX_METAL, TX_NMR, TX_ROUGH,
        )

        hasbc, hasn = mrow(_M_HASBC) > 0.0, mrow(_M_HASN) > 0.0
        hasr, hasm = mrow(_M_HASR) > 0.0, mrow(_M_HASM) > 0.0
        hase = mrow(_M_HASE) > 0.0
        bc = [jnp.where(hasbc, texels[TX_BCR + c], bc[c]) for c in range(3)]
        rough = jnp.where(hasr, texels[TX_ROUGH], rough)
        metal = jnp.where(hasm, texels[TX_METAL], metal)
        emis = [jnp.where(hase, texels[TX_EMR + c], emis[c])
                for c in range(3)]

        # Normal mapping (gather_surface_params, material.h:189-203):
        # tbn columns = [bitangent, RAW tangent, shading normal] with
        # bitangent = cross(N, normalize(T - dot(T,N)N)) — the raw
        # interpolated T in the matrix itself is a reference quirk.
        tx_, ty_, tz_ = hitp[6], hitp[7], hitp[8]
        ntx = [texels[TX_NMR + c] * 2.0 - 1.0 for c in range(3)]
        tdn = tx_ * nx + ty_ * ny + tz_ * nz
        ox_t, oy_t, oz_t = tx_ - tdn * nx, ty_ - tdn * ny, tz_ - tdn * nz
        inv_t = 1.0 / jnp.sqrt(jnp.maximum(
            ox_t * ox_t + oy_t * oy_t + oz_t * oz_t, jnp.float32(1e-20)))
        ox_t, oy_t, oz_t = ox_t * inv_t, oy_t * inv_t, oz_t * inv_t
        bx = ny * oz_t - nz * oy_t
        by = nz * ox_t - nx * oz_t
        bz = nx * oy_t - ny * ox_t
        mx = bx * ntx[0] + tx_ * ntx[1] + nx * ntx[2]
        my = by * ntx[0] + ty_ * ntx[1] + ny * ntx[2]
        mz = bz * ntx[0] + tz_ * ntx[1] + nz * ntx[2]
        inv_m = 1.0 / jnp.sqrt(jnp.maximum(
            mx * mx + my * my + mz * mz, jnp.float32(1e-20)))
        nx = jnp.where(hasn, mx * inv_m, nx)
        ny = jnp.where(hasn, my * inv_m, ny)
        nz = jnp.where(hasn, mz * inv_m, nz)

    # ---- scatter (render/material.py::scatter, plane-for-plane) ----------
    v_dot_n = dx * nx + dy * ny + dz * nz

    # random_on_unit_sphere (material.h:144-157)
    sz = 2.0 * r_z - 1.0
    phi = 2.0 * jnp.float32(np.pi) * r_phi
    sr = jnp.sqrt(jnp.maximum(1.0 - sz * sz, 0.0))
    sph = (sr * jnp.cos(phi), sr * jnp.sin(phi), sz)

    scat = (nx + sph[0], ny + sph[1], nz + sph[2])
    two_dn = 2.0 * v_dot_n
    refl = (dx - two_dn * nx, dy - two_dn * ny, dz - two_dn * nz)
    spec = tuple(r + (s - r) * rough for r, s in zip(refl, scat))

    def schlick(cos, ref_idx):
        r0 = ((1.0 - ref_idx) / (1.0 + ref_idx)) ** 2
        return r0 + (1.0 - r0) * (1.0 - cos) ** 5

    # BTDF branch (material.h:236-249; TIR cosine clamped, module doc)
    inside = v_dot_n > EPS
    cos_in = jnp.sqrt(jnp.maximum(1.0 - ior * ior * (1.0 - v_dot_n * v_dot_n),
                                  0.0))
    cosine = jnp.where(inside, cos_in, -v_dot_n)
    eta = jnp.where(inside, ior, 1.0 / jnp.maximum(ior, 1e-8))
    # refract (core/math.py): zero vector on TIR
    k_r = 1.0 - eta * eta * (1.0 - v_dot_n * v_dot_n)
    coef = eta * v_dot_n + jnp.sqrt(jnp.maximum(k_r, 0.0))
    tir = k_r < 0.0
    refr = tuple(
        jnp.where(tir, 0.0, eta * d - coef * n)
        for d, n in zip((dx, dy, dz), (nx, ny, nz))
    )
    trans = tuple(r + (s - r) * rough for r, s in zip(refr, scat))
    btdf_is_spec = r_spec < schlick(cosine, eta)
    btdf_dir = tuple(jnp.where(btdf_is_spec, s, tr)
                     for s, tr in zip(spec, trans))

    # BRDF branch (material.h:250-261)
    speccol = tuple(0.85 + (b - 0.85) * metal for b in bc)
    mat_spec_chance = 0.1 + 0.9 * metal
    fresnel = (1.0 - rough) * schlick(-v_dot_n, 1.0)
    spec_chance = mat_spec_chance + (1.0 - mat_spec_chance) * fresnel
    brdf_is_spec = r_spec < spec_chance
    brdf_dir = tuple(jnp.where(brdf_is_spec, s, sc)
                     for s, sc in zip(spec, scat))
    brdf_att = tuple(jnp.where(brdf_is_spec, s, b)
                     for s, b in zip(speccol, bc))

    is_btdf = transl > EPS
    ndir = tuple(jnp.where(is_btdf, bt, br)
                 for bt, br in zip(btdf_dir, brdf_dir))
    att = tuple(jnp.where(is_btdf, b, br) for b, br in zip(bc, brdf_att))
    # normalize (core/math.py: clamp 1e-20)
    inv_len = 1.0 / jnp.sqrt(jnp.maximum(
        ndir[0] * ndir[0] + ndir[1] * ndir[1] + ndir[2] * ndir[2],
        jnp.float32(1e-20)))
    ndir = tuple(v * inv_len for v in ndir)
    px, py, pz = ox + t * dx, oy + t * dy, oz + t * dz
    norig = (px + RAY_OFFSET * ndir[0], py + RAY_OFFSET * ndir[1],
             pz + RAY_OFFSET * ndir[2])

    # ---- emission + throughput (integrator.py bounce_step) ---------------
    if texels is not None and sky_has_tex:
        # Miss lanes' texel rows were fetched from the sky equirect pages
        # (integrator.py::sky_emission); hit lanes never read `sky`.
        from tracy_tpu.ops.pallas_texfetch import TX_EMR

        sky = [texels[TX_EMR + c] for c in range(3)]
    else:
        sky = [mread(_M_ER, 0), mread(_M_EG, 0), mread(_M_EB, 0)]
    for c in range(3):
        e_c = jnp.where(hit_mask, emis[c], 0.0) + jnp.where(
            miss_mask, sky[c], 0.0)
        rad[c] = rad[c] + e_c * thr[c]
        thr[c] = jnp.where(hit_mask, thr[c] * att[c], thr[c])

    new_alive = hit_mask
    if russian_roulette:
        p = EPS + jnp.maximum(thr[0], jnp.maximum(thr[1], thr[2]))
        survive = rand(_DRAW_ROULETTE) <= p
        keep = new_alive & survive
        p_den = jnp.maximum(p, EPS)
        for c in range(3):
            # true division (not reciprocal-multiply): bit-parity with the
            # XLA path's `throughput / jnp.maximum(p, EPS)`
            thr[c] = jnp.where(keep, thr[c] / p_den, thr[c])
        new_alive = keep

    return (
        jnp.where(hit_mask, norig[0], ox),
        jnp.where(hit_mask, norig[1], oy),
        jnp.where(hit_mask, norig[2], oz),
        jnp.where(hit_mask, ndir[0], dx),
        jnp.where(hit_mask, ndir[1], dy),
        jnp.where(hit_mask, ndir[2], dz),
        thr[0], thr[1], thr[2],
        rad[0], rad[1], rad[2],
        new_alive.astype(jnp.float32),
    )


def build_material_table(materials) -> jnp.ndarray:
    """[MTAB_ROWS, 128] f32 plane table (lane = material id, zero-padded).

    128 lanes so the kernel's VMEM block is tile-aligned; scenes with more
    materials keep the XLA shading path.
    """
    m = materials
    num_m = int(np.asarray(m.albedo).shape[0])
    if num_m > 128:
        return None
    tab = np.zeros((MTAB_ROWS, 128), np.float32)
    alb = np.asarray(m.albedo, np.float32)
    emi = np.asarray(m.emissive, np.float32)
    tab[_M_AR, :num_m] = alb[:, 0]
    tab[_M_AG, :num_m] = alb[:, 1]
    tab[_M_AB, :num_m] = alb[:, 2]
    tab[_M_ROUGH, :num_m] = np.asarray(m.roughness, np.float32)
    tab[_M_METAL, :num_m] = np.asarray(m.metalness, np.float32)
    tab[_M_IOR, :num_m] = np.asarray(m.ior, np.float32)
    tab[_M_ER, :num_m] = emi[:, 0]
    tab[_M_EG, :num_m] = emi[:, 1]
    tab[_M_EB, :num_m] = emi[:, 2]
    tab[_M_TRANSL, :num_m] = np.asarray(m.translucent, np.float32)
    return jnp.asarray(tab)


def build_material_table_tex(materials, tex_pages) -> jnp.ndarray:
    """[MTAB_TEX_ROWS, 128] material table with slot-present flag rows.

    Rows 0-9 match build_material_table; rows 10-14 are the TexturePages
    flags (which slots each material overrides with a texture)."""
    base = build_material_table(materials)
    if base is None:
        return None
    num_m = int(np.asarray(materials.albedo).shape[0])
    tab = np.zeros((MTAB_TEX_ROWS, 128), np.float32)
    tab[:MTAB_ROWS] = np.asarray(base)
    tab[_M_HASBC:_M_HASE + 1, :num_m] = (
        np.asarray(tex_pages.flags, np.float32).T)
    return jnp.asarray(tab)


def _kernel_tex(sc_ref, state_ref, hit_ref, tex_ref, mtab_ref, out_ref,
                *, num_materials: int, seed: int, russian_roulette: bool,
                packets_per_step: int, sky_has_tex: bool):
    from tracy_tpu.ops.pallas_texfetch import TEXEL_ROWS

    sample_key = sc_ref[0].astype(jnp.uint32)
    bounce = sc_ref[1].astype(jnp.uint32)

    for pkt in range(packets_per_step):
        any_live = jnp.max(state_ref[pkt, _S_ALIVE]) > 0.0

        @pl.when(any_live)
        def _(pkt=pkt):
            state = tuple(state_ref[pkt, k] for k in range(STATE_PLANES))
            hitp = tuple(hit_ref[pkt, k] for k in range(HIT_PLANES_TEX))
            texels = tuple(tex_ref[pkt, k] for k in range(TEXEL_ROWS))
            outs = shade_planes(
                sample_key, bounce, state, hitp,
                lambda row, m: mtab_ref[row, m],
                num_materials=num_materials, seed=seed,
                russian_roulette=russian_roulette, texels=texels,
                sky_has_tex=sky_has_tex)
            for k, v in enumerate(outs):
                out_ref[pkt, k] = v

        @pl.when(jnp.logical_not(any_live))
        def _(pkt=pkt):
            for k in range(STATE_PLANES - 1):
                out_ref[pkt, k] = state_ref[pkt, k]


HIT_PLANES_TEX = 9  # mask, t, normal xyz, mat, tangent xyz


def shade_packets_textured(
    origin, direction, throughput, radiance, alive, pixel_idx,
    hit_mask, t, normal, tangent, uv, mat_id, mtab, tex_pages,
    sample_key, bounce,
    *, num_materials: int, seed: int, russian_roulette: bool,
    interpret: bool = False, packets_per_step: int = 8,
    fetch_batch: int | bool = False,
):
    """One TEXTURED shading bounce over N rays (full-res nearest samples).

    Three stages in one jitted graph: (1) pure-elementwise XLA page/lane
    addressing (ops/pallas_texfetch.lane_page_indices — the exact
    sample_nearest math), (2) the texture fetch kernel (one DMA per
    distinct 16x8 texel tile), (3) this shade kernel with per-lane texel
    planes. Bit-identical to integrator.py's XLA bounce_step on textured
    scenes (reference material.h:164-203, cuda_trace.cu:73-135)."""
    from tracy_tpu.ops.pallas_texfetch import fetch_texels, lane_page_indices

    n0 = origin.shape[0]
    npad = -(-n0 // PACKET) * PACKET
    if npad != n0:
        p = npad - n0

        def padv(x, c=0.0):
            w = ((0, p),) + ((0, 0),) * (x.ndim - 1)
            return jnp.pad(x, w, constant_values=c)

        origin, direction = padv(origin), padv(direction)
        throughput, radiance = padv(throughput), padv(radiance)
        alive, pixel_idx = padv(alive), padv(pixel_idx)
        hit_mask, t, normal = padv(hit_mask), padv(t), padv(normal)
        tangent, uv, mat_id = padv(tangent), padv(uv), padv(mat_id)
    n = npad
    k = n // PACKET

    page, lanepos = lane_page_indices(
        tex_pages, mat_id, uv, direction, hit_mask, alive)
    texp = fetch_texels(tex_pages.pages, page, lanepos,
                        interpret=interpret,
                        packets_per_step=packets_per_step,
                        batch=fetch_batch)

    pixf = jax.lax.bitcast_convert_type(
        pixel_idx.astype(jnp.uint32), jnp.float32)
    state = _pack(
        [origin[:, 0], origin[:, 1], origin[:, 2],
         direction[:, 0], direction[:, 1], direction[:, 2],
         throughput[:, 0], throughput[:, 1], throughput[:, 2],
         radiance[:, 0], radiance[:, 1], radiance[:, 2],
         alive.astype(jnp.float32), pixf], k)
    hitp = _pack(
        [hit_mask.astype(jnp.float32), t,
         normal[:, 0], normal[:, 1], normal[:, 2],
         mat_id.astype(jnp.float32),
         tangent[:, 0], tangent[:, 1], tangent[:, 2]], k)
    sc = jnp.stack([jnp.asarray(sample_key, jnp.int32).astype(jnp.int32),
                    jnp.asarray(bounce, jnp.int32)])

    pps = min(packets_per_step, k)
    while k % pps != 0:
        pps -= 1

    from tracy_tpu.ops.pallas_texfetch import PAGE_ROWS, SKY_MATERIAL_ID
    from tracy_tpu.scene.scene import TEX_EMISSIVE

    sky_has_tex = bool(tex_pages.base[SKY_MATERIAL_ID] >= 0
                       and tex_pages.flags[SKY_MATERIAL_ID, TEX_EMISSIVE])
    kernel = functools.partial(
        _kernel_tex, num_materials=num_materials, seed=seed,
        russian_roulette=russian_roulette, packets_per_step=pps,
        sky_has_tex=sky_has_tex)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((k, STATE_PLANES - 1, 8, 128),
                                       jnp.float32),
        grid=(k // pps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((pps, STATE_PLANES, 8, 128),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((pps, HIT_PLANES_TEX, 8, 128),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((pps, PAGE_ROWS, 8, 128),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(mtab.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM,
                         pipeline_mode=pl.Buffered(buffer_count=1)),
        ],
        out_specs=pl.BlockSpec((pps, STATE_PLANES - 1, 8, 128),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(sc, state, hitp, texp, mtab)

    def flat(p):
        return out[:, p].reshape(n)[:n0]

    origin = jnp.stack([flat(_S_OX), flat(_S_OY), flat(_S_OZ)], axis=-1)
    direction = jnp.stack([flat(_S_DX), flat(_S_DY), flat(_S_DZ)], axis=-1)
    thr = jnp.stack([flat(_S_TR), flat(_S_TG), flat(_S_TB)], axis=-1)
    rad = jnp.stack([flat(_S_RR), flat(_S_RG), flat(_S_RB)], axis=-1)
    return origin, direction, thr, rad, flat(_S_ALIVE) > 0.0


def _pack(planes, k):
    """[N]-per-plane list -> [k, P, 8, 128]."""
    cols = [p.reshape(k, 1, 8, 128) for p in planes]
    return jnp.concatenate(cols, axis=1)


def shade_packets(
    origin, direction, throughput, radiance, alive, pixel_idx,
    hit_mask, t, normal, mat_id, mtab, sample_key, bounce,
    *, num_materials: int, seed: int, russian_roulette: bool,
    interpret: bool = False, packets_per_step: int = 8,
):
    """One shading bounce over N rays (N a multiple of 1024).

    Returns (origin, direction, throughput, radiance, alive) — the exact
    next-PathState values of integrator.py's bounce_step given the same
    intersection results.
    """
    n0 = origin.shape[0]
    npad = -(-n0 // PACKET) * PACKET
    if npad != n0:
        p = npad - n0

        def padv(x, c=0.0):
            w = ((0, p),) + ((0, 0),) * (x.ndim - 1)
            return jnp.pad(x, w, constant_values=c)

        origin, direction = padv(origin), padv(direction)
        throughput, radiance = padv(throughput), padv(radiance)
        alive, pixel_idx = padv(alive), padv(pixel_idx)
        hit_mask, t, normal = padv(hit_mask), padv(t), padv(normal)
        mat_id = padv(mat_id)
    n = npad
    k = n // PACKET

    pixf = jax.lax.bitcast_convert_type(
        pixel_idx.astype(jnp.uint32), jnp.float32)
    state = _pack(
        [origin[:, 0], origin[:, 1], origin[:, 2],
         direction[:, 0], direction[:, 1], direction[:, 2],
         throughput[:, 0], throughput[:, 1], throughput[:, 2],
         radiance[:, 0], radiance[:, 1], radiance[:, 2],
         alive.astype(jnp.float32), pixf], k)
    hitp = _pack(
        [hit_mask.astype(jnp.float32), t,
         normal[:, 0], normal[:, 1], normal[:, 2],
         mat_id.astype(jnp.float32)], k)
    sc = jnp.stack([jnp.asarray(sample_key, jnp.int32).astype(jnp.int32),
                    jnp.asarray(bounce, jnp.int32)])

    pps = min(packets_per_step, k)
    while k % pps != 0:
        pps -= 1

    kernel = functools.partial(
        _kernel, num_materials=num_materials, seed=seed,
        russian_roulette=russian_roulette, packets_per_step=pps)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((k, STATE_PLANES - 1, 8, 128),
                                       jnp.float32),
        grid=(k // pps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((pps, STATE_PLANES, 8, 128),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((pps, HIT_PLANES, 8, 128),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(mtab.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM,
                         pipeline_mode=pl.Buffered(buffer_count=1)),
        ],
        out_specs=pl.BlockSpec((pps, STATE_PLANES - 1, 8, 128),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(sc, state, hitp, mtab)

    def flat(p):
        return out[:, p].reshape(n)[:n0]

    origin = jnp.stack([flat(_S_OX), flat(_S_OY), flat(_S_OZ)], axis=-1)
    direction = jnp.stack([flat(_S_DX), flat(_S_DY), flat(_S_DZ)], axis=-1)
    thr = jnp.stack([flat(_S_TR), flat(_S_TG), flat(_S_TB)], axis=-1)
    rad = jnp.stack([flat(_S_RR), flat(_S_RG), flat(_S_RB)], axis=-1)
    return origin, direction, thr, rad, flat(_S_ALIVE) > 0.0
