"""Textured on-core shading: texel pages + fetch kernel + shade kernel
(interpret mode) vs the XLA textured bounce — BIT-IDENTICAL.

The page store is a relayout of the same f32 atlas and the addressing is
the same f32 ops as render/texture.py::sample_nearest, so every texel a
lane reads must match the XLA gather exactly; the shade kernel then has
to reproduce gather_surface_params (texture overrides + normal mapping,
reference material.h:164-203) and sky_emission (cpu_trace.cpp:147-156)
bit-for-bit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tracy_tpu.accel.packet import PacketAttrs
from tracy_tpu.config import RenderConfig
from tracy_tpu.ops.pallas_shade import (
    build_material_table_tex, shade_packets_textured,
)
from tracy_tpu.ops.pallas_texfetch import (
    PAGE_ROWS, TEXEL_ROWS, TX_BCR, TX_EMR, TX_METAL, TX_NMR, TX_ROUGH,
    build_texture_pages, fetch_texels, lane_page_indices,
)
from tracy_tpu.render.integrator import trace_paths
from tracy_tpu.render.intersect import FLT_MAX, Hit
from tracy_tpu.render.texture import sample_nearest
from tracy_tpu.scene.scene import (
    TEX_BASECOLOR, TEX_EMISSIVE, TEX_METALNESS, TEX_NORMAL, TEX_ROUGHNESS,
    SceneBuilder,
)


def _textured_scene():
    """3 materials: fully textured (5 slots, 20x24 non-pow2), basecolor-only
    (8x8), untextured — plus an equirect HDR-ish sky (16x32)."""
    rng = np.random.default_rng(42)
    b = SceneBuilder(32, 24, "texfix")
    sky = rng.uniform(0.0, 3.0, (16, 32, 4)).astype(np.float32)
    b.set_sky_color((0.1, 0.2, 0.3))
    b.set_sky_texture(b.add_texture(sky))

    m1 = b.add_material((0.5, 0.4, 0.3), roughness=0.7, metalness=0.2)
    for slot in (TEX_BASECOLOR, TEX_NORMAL, TEX_ROUGHNESS, TEX_METALNESS,
                 TEX_EMISSIVE):
        img = rng.uniform(0.0, 1.0, (20, 24, 4)).astype(np.float32)
        b.set_material_texture(m1, slot, b.add_texture(img))
    m2 = b.add_material((0.2, 0.8, 0.2), roughness=0.3)
    b.set_material_texture(
        m2, TEX_BASECOLOR,
        b.add_texture(rng.uniform(0.0, 1.0, (8, 8, 4)).astype(np.float32)))
    m3 = b.add_material((0.9, 0.1, 0.1), roughness=1.0)

    b.add_sphere((0.0, 0.0, -3.0), 1.0, m1, steps=8)
    b.add_box((-2.5, -1.0, -4.0), (-1.0, 0.5, -2.5), m2)
    b.add_triangle((1.0, -1.0, -2.0), (2.5, -1.0, -2.0), (1.5, 1.0, -2.5), m3)
    b.set_camera((0, 0, 2), (0, 0, -3), (0, 1, 0), 60.0)
    return b.build()


def _canned(scene, n, rng):
    hit_mask = jnp.asarray(rng.uniform(size=n) < 0.7)
    t = jnp.where(hit_mask,
                  jnp.asarray(rng.uniform(0.5, 20.0, n).astype(np.float32)),
                  FLT_MAX)
    normal = rng.standard_normal((n, 3)).astype(np.float32)
    normal = jnp.asarray(normal / np.linalg.norm(normal, axis=-1,
                                                 keepdims=True))
    tangent = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    uv = jnp.asarray(rng.uniform(-1.5, 2.5, (n, 2)).astype(np.float32))
    num_m = int(np.asarray(scene.materials.albedo).shape[0])
    mat = jnp.asarray(rng.integers(1, num_m, n).astype(np.int32))
    return hit_mask, t, normal, tangent, uv, mat


def test_pages_match_sample_nearest():
    """Page/lane addressing + page contents == the XLA atlas gather for
    every textured slot, including repeat wrap and the v flip."""
    scene = _textured_scene()
    tp = build_texture_pages(scene)
    assert tp is not None
    pages = np.asarray(tp.pages)
    rng = np.random.default_rng(3)
    n = 512
    uv = jnp.asarray(rng.uniform(-2.0, 3.0, (n, 2)).astype(np.float32))
    tex_index = np.asarray(scene.materials.tex_index)

    slot_rows = {TEX_BASECOLOR: (TX_BCR, 3), TEX_NORMAL: (TX_NMR, 3),
                 TEX_ROUGHNESS: (TX_ROUGH, 1), TEX_METALNESS: (TX_METAL, 1),
                 TEX_EMISSIVE: (TX_EMR, 3)}
    for m in range(tex_index.shape[0]):
        if tp.base[m] < 0:
            continue
        mat = jnp.full((n,), m, jnp.int32)
        page, lanepos = lane_page_indices(
            tp, mat, uv, jnp.zeros((n, 3)), jnp.ones((n,), bool),
            jnp.ones((n,), bool))
        pg = np.asarray(page).astype(np.int64)
        lp = np.asarray(lanepos).astype(np.int64)
        assert (pg >= 0).all()
        for slot, (r0, nch) in slot_rows.items():
            tid = tex_index[m, slot]
            if tid < 0:
                continue
            want = np.asarray(sample_nearest(
                scene.tex_data, scene.tex_table,
                jnp.full((n,), tid, jnp.int32), uv))
            for c in range(nch):
                got = pages[pg * PAGE_ROWS + r0 + c, lp]
                np.testing.assert_array_equal(got, want[:, c])


@pytest.mark.parametrize("batch", [False, True, 16])
def test_fetch_kernel_exact(batch):
    """The page-fetch kernel (interpret) returns exactly the addressed
    page rows; page = -1 lanes read 0. batch=True/8 runs the 8-candidate
    all-in-flight arena loop, 16 the two-extraction-round variant — both
    must be bit-identical to the simple drain loop."""
    scene = _textured_scene()
    tp = build_texture_pages(scene)
    pages = np.asarray(tp.pages)
    npages = pages.shape[0] // PAGE_ROWS
    rng = np.random.default_rng(11)
    n = 2048
    page = rng.integers(-1, npages, n).astype(np.float32)
    lane = rng.integers(0, 128, n).astype(np.float32)
    out = np.asarray(fetch_texels(
        tp.pages, jnp.asarray(page), jnp.asarray(lane), interpret=True,
        batch=batch))
    out = out.transpose(0, 2, 3, 1).reshape(n, PAGE_ROWS)
    pg, lp = page.astype(np.int64), lane.astype(np.int64)
    for r in range(TEXEL_ROWS):
        want = np.where(pg >= 0, pages[np.maximum(pg, 0) * PAGE_ROWS + r, lp],
                        0.0)
        np.testing.assert_array_equal(out[:, r], want)


@pytest.mark.parametrize("rr,fbatch", [(True, False), (False, False),
                                       (True, True)])
def test_textured_shade_matches_bounce(rr, fbatch):
    """One textured shading bounce (fetch + shade kernels, interpret) ==
    trace_paths' XLA bounce_step with the same canned intersections."""
    scene = _textured_scene()
    cfg = RenderConfig(width=32, height=24, spp=1, accel="none",
                       russian_roulette=rr)
    n = 2048
    rng = np.random.default_rng(7)
    o = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    pix = jnp.asarray(rng.integers(0, 1 << 20, n).astype(np.uint32))
    skey = jnp.uint32(5)
    hit_mask, t, normal, tangent, uv, mat = _canned(scene, n, rng)

    def isect(origin, direction, active):
        hit = Hit(t=t, tri=jnp.zeros((n,), jnp.int32),
                  uv=jnp.zeros((n, 2)), mask=hit_mask)
        at = PacketAttrs(normal=normal, tangent=tangent, uv=uv, material=mat)
        return hit, at

    rad_x, _ = jax.jit(
        lambda o, d: trace_paths(scene, o, d, pix, skey,
                                 cfg.replace(max_bounces=1), isect)
    )(o, d)

    tp = build_texture_pages(scene)
    mtab = build_material_table_tex(scene.materials, tp)
    num_m = int(np.asarray(scene.materials.albedo).shape[0])
    thr0 = jnp.ones((n, 3), jnp.float32)
    rad0 = jnp.zeros((n, 3), jnp.float32)
    alive0 = jnp.ones((n,), bool)
    o2, d2, thr2, rad_k, alive2 = jax.jit(
        lambda o, d: shade_packets_textured(
            o, d, thr0, rad0, alive0, pix, hit_mask, t, normal, tangent,
            uv, mat, mtab, tp, skey, jnp.int32(0), num_materials=num_m,
            seed=cfg.seed, russian_roulette=rr, interpret=True,
            fetch_batch=fbatch)
    )(o, d)
    np.testing.assert_array_equal(np.asarray(rad_x), np.asarray(rad_k))


def test_full_textured_render_with_shade_stage():
    """A real render of the textured fixture with the textured shade stage
    must be bit-identical to the XLA shading path (same intersector)."""
    from tracy_tpu.accel.packet import build_packet_bvh, make_packet_intersector
    from tracy_tpu.render.renderer import init_state, render_step

    scene = _textured_scene()
    cfg = RenderConfig(width=32, height=24, spp=1, accel="packet",
                       use_pallas=False)
    bvh, _ = build_packet_bvh(scene, leaf_size=cfg.packet_leaf_size)
    isect = make_packet_intersector(scene, bvh, with_tangent=True)

    tp = build_texture_pages(scene)
    mtab = build_material_table_tex(scene.materials, tp)
    num_m = int(np.asarray(scene.materials.albedo).shape[0])

    def shade_fn(o, d, thr, rad, alive, pix, hmask, t, normal, tangent,
                 uv, mat, skey, bounce):
        return shade_packets_textured(
            o, d, thr, rad, alive, pix, hmask, t, normal, tangent, uv,
            mat, mtab, tp, skey, bounce, num_materials=num_m,
            seed=cfg.seed, russian_roulette=cfg.russian_roulette,
            interpret=True)

    st_x, rays_x = jax.jit(
        lambda st: render_step(scene, st, cfg, isect)
    )(init_state(cfg))
    st_k, rays_k = jax.jit(
        lambda st: render_step(scene, st, cfg, isect, shade_fn=shade_fn)
    )(init_state(cfg))
    assert int(rays_x) == int(rays_k)
    np.testing.assert_array_equal(np.asarray(st_x.accum),
                                  np.asarray(st_k.accum))


@pytest.mark.slow
def test_helmet_wave_bit_identity(reference_data_root):
    """One shading bounce on the real helmet scene (5 full-res maps + HDR
    sky): the textured kernel path == the XLA path, bit-for-bit."""
    from tracy_tpu.scene.scn_parser import load_scene

    b = load_scene(f"{reference_data_root}/data/scenes/helmet.scn",
                   data_root=str(reference_data_root))
    b.width, b.height = 64, 48
    scene = b.build()
    cfg = RenderConfig(width=64, height=48, spp=1, accel="none")
    n = 2048
    rng = np.random.default_rng(17)
    o = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    pix = jnp.asarray(rng.integers(0, 1 << 20, n).astype(np.uint32))
    skey = jnp.uint32(2)
    hit_mask, t, normal, tangent, uv, mat = _canned(scene, n, rng)

    def isect(origin, direction, active):
        hit = Hit(t=t, tri=jnp.zeros((n,), jnp.int32),
                  uv=jnp.zeros((n, 2)), mask=hit_mask)
        at = PacketAttrs(normal=normal, tangent=tangent, uv=uv, material=mat)
        return hit, at

    rad_x, _ = jax.jit(
        lambda o, d: trace_paths(scene, o, d, pix, skey,
                                 cfg.replace(max_bounces=1), isect)
    )(o, d)

    tp = build_texture_pages(scene)
    assert tp is not None  # helmet maps share dims: page layout applies
    mtab = build_material_table_tex(scene.materials, tp)
    num_m = int(np.asarray(scene.materials.albedo).shape[0])
    o2, d2, thr2, rad_k, alive2 = shade_packets_textured(
        o, d, jnp.ones((n, 3), jnp.float32), jnp.zeros((n, 3), jnp.float32),
        jnp.ones((n,), bool), pix, hit_mask, t, normal, tangent, uv, mat,
        mtab, tp, skey, jnp.int32(0), num_materials=num_m, seed=cfg.seed,
        russian_roulette=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(rad_x), np.asarray(rad_k))
