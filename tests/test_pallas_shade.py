"""Pallas shading stage vs the XLA integrator bounce (interpret mode).

The kernel must produce BIT-IDENTICAL next-PathState values (origin,
direction, throughput, radiance, alive) to integrator.py's bounce_step
given the same intersection results — same RNG hash, same formula order,
same clamps (see ops/pallas_shade.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tracy_tpu.config import RenderConfig
from tracy_tpu.ops.pallas_shade import build_material_table, shade_packets
from tracy_tpu.render.integrator import PathState, trace_paths
from tracy_tpu.render.intersect import FLT_MAX, Hit
from tracy_tpu.accel.packet import PacketAttrs
from tracy_tpu.scene.scn_parser import default_scene, load_scene


def _canned(scene, n, rng):
    """Random-but-plausible intersection results over n lanes."""
    hit_mask = jnp.asarray(rng.uniform(size=n) < 0.7)
    t = jnp.asarray(rng.uniform(0.5, 20.0, n).astype(np.float32))
    t = jnp.where(hit_mask, t, FLT_MAX)
    normal = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    normal = normal / jnp.linalg.norm(normal, axis=-1, keepdims=True)
    num_m = int(np.asarray(scene.materials.albedo).shape[0])
    mat = jnp.asarray(rng.integers(1, num_m, n).astype(np.int32))
    return hit_mask, t, normal, mat


def _run_xla_bounce(scene, cfg, o, d, pix, skey, hit_mask, t, normal, mat):
    """One bounce_step via trace_paths(max_bounces=1) with a canned
    rich intersector."""

    def isect(origin, direction, active):
        n = origin.shape[0]
        hit = Hit(t=t, tri=jnp.zeros((n,), jnp.int32),
                  uv=jnp.zeros((n, 2)), mask=hit_mask)
        at = PacketAttrs(normal=normal, tangent=jnp.zeros((n, 3)),
                         uv=jnp.zeros((n, 2)), material=mat)
        return hit, at

    cfg1 = cfg.replace(max_bounces=1)
    # Radiance after one bounce; the full carried state (rays, throughput,
    # alive, RR reweighting) is covered by the 2-bounce chain test below.
    rad, rays = trace_paths(scene, o, d, pix, skey, cfg1, isect)
    return rad, rays


@pytest.mark.parametrize("rr", [True, False])
def test_shade_kernel_matches_bounce(rr):
    scene = default_scene(32, 24).build()
    cfg = RenderConfig(width=32, height=24, spp=1, accel="none",
                       russian_roulette=rr)
    n = 2048
    rng = np.random.default_rng(7)
    o = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    d = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    pix = jnp.asarray(rng.integers(0, 1 << 20, n).astype(np.uint32))
    skey = jnp.uint32(5)
    hit_mask, t, normal, mat = _canned(scene, n, rng)

    # ---- XLA reference: one bounce of trace_paths ----
    rad_x, rays_x = jax.jit(
        lambda o, d: _run_xla_bounce(scene, cfg, o, d, pix, skey,
                                     hit_mask, t, normal, mat)
    )(o, d)

    # ---- kernel ----
    mtab = build_material_table(scene.materials)
    num_m = int(np.asarray(scene.materials.albedo).shape[0])
    thr0 = jnp.ones((n, 3), jnp.float32)
    rad0 = jnp.zeros((n, 3), jnp.float32)
    alive0 = jnp.ones((n,), bool)
    o2, d2, thr2, rad_k, alive2 = jax.jit(
        lambda o, d: shade_packets(
            o, d, thr0, rad0, alive0, pix,
            hit_mask, t, normal, mat, mtab, skey, jnp.int32(0),
            num_materials=num_m, seed=cfg.seed, russian_roulette=rr,
            interpret=True)
    )(o, d)

    np.testing.assert_array_equal(np.asarray(rad_x), np.asarray(rad_k))


def test_shade_kernel_two_bounce_chain():
    """Two chained kernel bounces == trace_paths(max_bounces=2) with the
    same canned intersector (exercises state propagation: new rays,
    throughput, alive, RR reweighting)."""
    scene = default_scene(32, 24).build()
    cfg = RenderConfig(width=32, height=24, spp=1, accel="none",
                       russian_roulette=True, max_bounces=2)
    n = 1024
    rng = np.random.default_rng(11)
    o = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    d = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    pix = jnp.asarray(rng.integers(0, 1 << 20, n).astype(np.uint32))
    skey = jnp.uint32(3)
    hit_mask, t, normal, mat = _canned(scene, n, rng)

    def isect(origin, direction, active):
        hit = Hit(t=t, tri=jnp.zeros((n,), jnp.int32),
                  uv=jnp.zeros((n, 2)), mask=hit_mask)
        at = PacketAttrs(normal=normal, tangent=jnp.zeros((n, 3)),
                         uv=jnp.zeros((n, 2)), material=mat)
        return hit, at

    rad_x, _ = jax.jit(
        lambda o, d: trace_paths(scene, o, d, pix, skey, cfg, isect)
    )(o, d)

    mtab = build_material_table(scene.materials)
    num_m = int(np.asarray(scene.materials.albedo).shape[0])

    def two_bounces(o, d):
        thr = jnp.ones((n, 3), jnp.float32)
        rad = jnp.zeros((n, 3), jnp.float32)
        alive = jnp.ones((n,), bool)
        for b in range(2):
            o, d, thr, rad, alive = shade_packets(
                o, d, thr, rad, alive, pix,
                hit_mask, t, normal, mat, mtab, skey, jnp.int32(b),
                num_materials=num_m, seed=cfg.seed, russian_roulette=True,
                interpret=True)
        return rad

    rad_k = jax.jit(two_bounces)(o, d)
    np.testing.assert_array_equal(np.asarray(rad_x), np.asarray(rad_k))


def test_material_table_values():
    b = load_scene("/root/reference/data/scenes/cornell.scn",
                   data_root="/root/reference")
    scene = b.build()
    mtab = np.asarray(build_material_table(scene.materials))
    alb = np.asarray(scene.materials.albedo)
    num_m = alb.shape[0]
    np.testing.assert_array_equal(mtab[0, :num_m], alb[:, 0])
    np.testing.assert_array_equal(mtab[6:9, 0],
                                  np.asarray(scene.materials.emissive)[0])
    assert (mtab[:, num_m:] == 0).all()


def test_full_render_with_shade_stage():
    """A real cornell render with the shade stage in the bounce loop must be
    bit-identical to the XLA shading path (same intersector, same RNG)."""
    from tracy_tpu.accel.packet import build_packet_bvh, make_packet_intersector
    from tracy_tpu.render.renderer import init_state, render_step

    b = load_scene("/root/reference/data/scenes/cornell.scn",
                   data_root="/root/reference")
    b.width, b.height = 64, 64
    scene = b.build()
    cfg = RenderConfig(width=64, height=64, spp=1, accel="packet",
                       use_pallas=False)
    bvh, _ = build_packet_bvh(scene, leaf_size=cfg.packet_leaf_size)
    isect = make_packet_intersector(scene, bvh, with_tangent=False)

    mtab = build_material_table(scene.materials)
    num_m = int(np.asarray(scene.materials.albedo).shape[0])

    def shade_fn(o, d, thr, rad, alive, pix, hmask, t, normal, tangent,
                 uv, mat, skey, bounce):
        return shade_packets(
            o, d, thr, rad, alive, pix, hmask, t, normal, mat, mtab,
            skey, bounce, num_materials=num_m, seed=cfg.seed,
            russian_roulette=cfg.russian_roulette, interpret=True)

    st0 = init_state(cfg)
    st_x, rays_x = jax.jit(
        lambda st: render_step(scene, st, cfg, isect)
    )(st0)
    st_k, rays_k = jax.jit(
        lambda st: render_step(scene, st, cfg, isect, shade_fn=shade_fn)
    )(init_state(cfg))

    assert int(rays_x) == int(rays_k)
    np.testing.assert_array_equal(np.asarray(st_x.accum),
                                  np.asarray(st_k.accum))


def test_shade_dead_packet_fast_path():
    """A fully-dead packet must pass its state through verbatim."""
    scene = default_scene(32, 24).build()
    n = 2048
    rng = np.random.default_rng(3)
    o = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    d = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    thr = jnp.asarray(rng.uniform(0.1, 1.0, (n, 3)).astype(np.float32))
    rad = jnp.asarray(rng.uniform(0.0, 2.0, (n, 3)).astype(np.float32))
    pix = jnp.asarray(rng.integers(0, 1 << 20, n).astype(np.uint32))
    alive = jnp.ones((n,), bool).at[0:1024].set(False)  # packet 0 dead
    hit_mask, t, normal, mat = _canned(scene, n, rng)
    mtab = build_material_table(scene.materials)
    num_m = int(np.asarray(scene.materials.albedo).shape[0])
    o2, d2, thr2, rad2, alive2 = shade_packets(
        o, d, thr, rad, alive, pix, hit_mask, t, normal, mat, mtab,
        jnp.uint32(1), jnp.int32(0), num_materials=num_m, seed=7,
        russian_roulette=True, interpret=True)
    dead = slice(0, 1024)
    np.testing.assert_array_equal(np.asarray(o2)[dead], np.asarray(o)[dead])
    np.testing.assert_array_equal(np.asarray(d2)[dead], np.asarray(d)[dead])
    np.testing.assert_array_equal(np.asarray(thr2)[dead],
                                  np.asarray(thr)[dead])
    np.testing.assert_array_equal(np.asarray(rad2)[dead],
                                  np.asarray(rad)[dead])
    assert not np.asarray(alive2)[dead].any()
    assert np.asarray(alive2)[1024:].any()


@pytest.mark.parametrize("compact", [0, 1024])
def test_fused_bounce_megakernel(compact):
    """The fused bounce megakernel (intersect + shade in one Pallas kernel,
    optionally compaction-wrapped) must render bit-identically to the
    plain XLA bounce loop with the same intersector family."""
    from tracy_tpu.accel.packet import build_packet_bvh
    from tracy_tpu.accel.reorder import compact_bounce
    from tracy_tpu.ops.pallas_packet import (
        build_tables, nondiff_intersector, pallas_intersect,
        pallas_trace_bounce,
    )
    from tracy_tpu.render.renderer import init_state, render_step

    b = load_scene("/root/reference/data/scenes/cornell.scn",
                   data_root="/root/reference")
    b.width, b.height = 64, 64
    scene = b.build()
    cfg = RenderConfig(width=64, height=64, spp=1, accel="packet",
                       use_pallas=False)
    bvh, _ = build_packet_bvh(scene, leaf_size=64)
    tables = build_tables(scene, bvh, with_tangent=False)
    mtab = build_material_table(scene.materials)
    num_m = int(np.asarray(scene.materials.albedo).shape[0])

    isect = nondiff_intersector(
        lambda o, d, a: pallas_intersect(o, d, a, tables, interpret=True,
                                         rb_mode="fused"))

    def bounce(o, d, thr, rad, alive, pix, skey, bounce_i):
        return pallas_trace_bounce(
            o, d, thr, rad, alive, pix, tables, mtab, skey, bounce_i,
            num_materials=num_m, seed=cfg.seed,
            russian_roulette=cfg.russian_roulette, interpret=True)

    bounce_fn = compact_bounce(bounce, compact) if compact else bounce

    st_x, rays_x = jax.jit(
        lambda st: render_step(scene, st, cfg, isect)
    )(init_state(cfg))
    st_b, rays_b = jax.jit(
        lambda st: render_step(scene, st, cfg, isect, bounce_fn=bounce_fn)
    )(init_state(cfg))
    assert int(rays_x) == int(rays_b)
    np.testing.assert_array_equal(np.asarray(st_x.accum),
                                  np.asarray(st_b.accum))


@pytest.mark.parametrize("rr", [True, False])
def test_shade_kernel_translucent_btdf(rr):
    """BTDF branch coverage: bunny's jade material (translucent=1, ior=1.5)
    exercises refraction, inside/outside eta swap, and the TIR clamp —
    must stay bit-identical to the XLA bounce."""
    b = load_scene("/root/reference/data/scenes/bunny.scn",
                   data_root="/root/reference")
    scene = b.build()
    cfg = RenderConfig(width=32, height=24, spp=1, accel="none",
                       russian_roulette=rr)
    n = 2048
    rng = np.random.default_rng(23)
    o = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    d = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    pix = jnp.asarray(rng.integers(0, 1 << 20, n).astype(np.uint32))
    skey = jnp.uint32(9)
    hit_mask = jnp.asarray(rng.uniform(size=n) < 0.8)
    t = jnp.where(hit_mask,
                  jnp.asarray(rng.uniform(0.5, 20.0, n).astype(np.float32)),
                  FLT_MAX)
    normal = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    normal = normal / jnp.linalg.norm(normal, axis=-1, keepdims=True)
    # Force the translucent material on every lane; random normals give a
    # mix of inside (VdotN > 0) and outside hits, including TIR angles.
    mat = jnp.full((n,), 3, jnp.int32)

    rad_x, _ = jax.jit(
        lambda o, d: _run_xla_bounce(scene, cfg, o, d, pix, skey,
                                     hit_mask, t, normal, mat)
    )(o, d)

    mtab = build_material_table(scene.materials)
    num_m = int(np.asarray(scene.materials.albedo).shape[0])
    thr0 = jnp.ones((n, 3), jnp.float32)
    rad0 = jnp.zeros((n, 3), jnp.float32)
    alive0 = jnp.ones((n,), bool)
    o2, d2, _, rad_k, _ = shade_packets(
        o, d, thr0, rad0, alive0, pix, hit_mask, t, normal, mat, mtab,
        skey, jnp.int32(0), num_materials=num_m, seed=cfg.seed,
        russian_roulette=rr, interpret=True)
    np.testing.assert_array_equal(np.asarray(rad_x), np.asarray(rad_k))

    # Scattered DIRECTIONS through the BTDF (refract / eta swap / TIR):
    # compare against the XLA scatter math directly on the hit lanes.
    from tracy_tpu.core.rng import RngSpec
    from tracy_tpu.render import material as mtl
    from tracy_tpu.render.integrator import (
        DRAW_SPECULAR, DRAW_SPHERE_PHI, DRAW_SPHERE_Z,
    )

    rngs = RngSpec(cfg.rng, cfg.seed)
    params = mtl.gather_surface_params(
        scene, mat, jnp.zeros((n, 2)), normal, jnp.zeros((n, 3)))
    res = mtl.scatter(
        d, o + t[:, None] * d, params,
        rngs.uniform(pix, skey, jnp.int32(0), DRAW_SPHERE_Z),
        rngs.uniform(pix, skey, jnp.int32(0), DRAW_SPHERE_PHI),
        rngs.uniform(pix, skey, jnp.int32(0), DRAW_SPECULAR),
    )
    hm = np.asarray(hit_mask)
    # ~1 ulp: the [N,3] XLA math and the [8,128]-plane kernel math may
    # compile with different fma association (the full-render tests assert
    # BIT-identity for the paths as actually composed in one program).
    np.testing.assert_allclose(np.asarray(res.direction)[hm],
                               np.asarray(d2)[hm], atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.origin)[hm],
                               np.asarray(o2)[hm], atol=1e-4)
