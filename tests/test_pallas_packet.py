"""Pallas packet kernel vs the XLA packet intersector (interpret mode on CPU).

The XLA packet path is itself tested exactly against brute force, so
agreement here closes the chain kernel == XLA == brute force.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tracy_tpu.accel.packet import build_packet_bvh, make_packet_intersector
from tracy_tpu.ops.pallas_packet import make_pallas_intersector
from tracy_tpu.scene.scn_parser import default_scene, load_scene


def _rays_for(scene, n, seed=0):
    rng = np.random.default_rng(seed)
    ss = jnp.asarray(rng.uniform(0.02, 0.98, n).astype(np.float32))
    tt = jnp.asarray(rng.uniform(0.02, 0.98, n).astype(np.float32))
    return scene.camera.generate_rays(ss, tt)


@pytest.mark.parametrize("with_tangent", [False, True])
def test_pallas_matches_xla_packet(with_tangent):
    b = default_scene(32, 24)
    # Texture one material so the kernel builds the FULL attr layout
    # (uv corner rows included); the untextured slim layout is covered by
    # test_pallas_slim_untextured below.
    tex = b.add_texture(np.full((4, 4, 4), 0.5, np.float32))
    b.set_material_texture(1, 0, tex)
    scene = b.build()
    bvh, host = build_packet_bvh(scene, leaf_size=64)
    isect_x = make_packet_intersector(scene, bvh, leaf_size=64, packet_size=1024,
                                      with_tangent=with_tangent)
    isect_p = make_pallas_intersector(scene, bvh, with_tangent=with_tangent,
                                      interpret=True)
    assert isect_p is not None

    n = 2048
    o, d = _rays_for(scene, n)
    act = jnp.ones(n, bool)
    hx, ax = isect_x(o, d, act)
    hp, ap = isect_p(o, d, act)

    # The kernel uses the Woop unit-triangle reformulation (f64 host
    # precompute, f32 eval) — numerically equal to Möller–Trumbore to ~1e-6
    # rel on t; edge rays may very rarely flip. Measured headroom is ~10x
    # below these bounds (t<=4e-7, uv<=6e-4 rel).
    mx, mp = np.asarray(hx.mask), np.asarray(hp.mask)
    assert (mx == mp).mean() >= 0.998
    m = mx & mp
    np.testing.assert_allclose(np.asarray(hp.t)[m], np.asarray(hx.t)[m], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(hp.uv)[m], np.asarray(hx.uv)[m],
                               rtol=5e-3, atol=1e-4)
    # Normals/tangents are stored bf16 in the kernel tables (~0.4% error).
    np.testing.assert_allclose(np.asarray(ap.normal)[m], np.asarray(ax.normal)[m],
                               rtol=8e-3, atol=8e-3)
    np.testing.assert_allclose(np.asarray(ap.uv)[m], np.asarray(ax.uv)[m],
                               rtol=5e-3, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(ap.material)[m],
                                  np.asarray(ax.material)[m])
    if with_tangent:
        np.testing.assert_allclose(np.asarray(ap.tangent)[m],
                                   np.asarray(ax.tangent)[m], rtol=8e-3, atol=8e-3)


def test_pallas_slim_untextured():
    """Scenes with no non-sky textures omit the uv corner rows from the
    fused attr table (6 fewer readback gathers); normals/material must
    still match the XLA packet path and attrs.uv is all-zero."""
    scene = default_scene(32, 24).build()
    bvh, _ = build_packet_bvh(scene, leaf_size=64)
    isect_x = make_packet_intersector(scene, bvh, leaf_size=64,
                                      with_tangent=False)
    isect_p = make_pallas_intersector(scene, bvh, with_tangent=False,
                                      interpret=True)
    # fused table = 16 woop rows + (mat + 5 normal-pair rows -> pad8 = 8)
    assert isect_p.tables.tab.shape[0] == 16 + 8
    assert not isect_p.tables.has_uv

    n = 2048
    o, d = _rays_for(scene, n)
    act = jnp.ones(n, bool)
    hx, ax = isect_x(o, d, act)
    hp, ap = isect_p(o, d, act)
    m = np.asarray(hx.mask) & np.asarray(hp.mask)
    assert m.mean() > 0.5
    np.testing.assert_allclose(np.asarray(hp.t)[m], np.asarray(hx.t)[m],
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ap.normal)[m],
                               np.asarray(ax.normal)[m], rtol=8e-3, atol=8e-3)
    np.testing.assert_array_equal(np.asarray(ap.material)[m],
                                  np.asarray(ax.material)[m])
    assert not np.asarray(ap.uv).any()


@pytest.mark.parametrize("rb_window", [2, 8])
def test_pallas_rb_window(rb_window):
    """Windowed winner readback (rb_window adjacent chunks per phase-2
    iteration; onehot gather — Mosaic's dynamic gather is in-tile-only)
    matches the per-chunk default."""
    scene = default_scene(32, 24).build()
    bvh, _ = build_packet_bvh(scene, leaf_size=64)
    i1 = make_pallas_intersector(scene, bvh, with_tangent=False,
                                 interpret=True, rb_window=1,
                                 rb_gather="onehot")
    iw = make_pallas_intersector(scene, bvh, with_tangent=False,
                                 interpret=True, rb_window=rb_window,
                                 rb_gather="onehot")
    o, d = _rays_for(scene, 2048, seed=3)
    act = jnp.ones(2048, bool)
    h1, a1 = i1(o, d, act)
    hw, aw = iw(o, d, act)
    np.testing.assert_array_equal(np.asarray(h1.mask), np.asarray(hw.mask))
    np.testing.assert_array_equal(np.asarray(h1.t), np.asarray(hw.t))
    # 1-ulp: the shape-padded window gather compiles with different fma
    # association than the 128-wide one.
    np.testing.assert_allclose(np.asarray(a1.normal), np.asarray(aw.normal),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(a1.material),
                                  np.asarray(aw.material))


@pytest.mark.parametrize("rb_window", [1, 4])
def test_pallas_rb_prefetch(rb_window):
    """Software-pipelined readback (two windows per iteration, alternating
    buffers) matches the serial loop to float rounding (~1 ulp: the
    restructured expressions may compile with different fma association)."""
    scene = default_scene(32, 24).build()
    bvh, _ = build_packet_bvh(scene, leaf_size=64)
    gather = "onehot" if rb_window > 1 else "take"
    i1 = make_pallas_intersector(scene, bvh, with_tangent=False,
                                 interpret=True, rb_window=rb_window,
                                 rb_gather=gather)
    ip = make_pallas_intersector(scene, bvh, with_tangent=False,
                                 interpret=True, rb_window=rb_window,
                                 rb_prefetch=True, rb_gather=gather)
    o, d = _rays_for(scene, 3072, seed=5)
    act = jnp.ones(3072, bool)
    h1, a1 = i1(o, d, act)
    hp, ap = ip(o, d, act)
    np.testing.assert_array_equal(np.asarray(h1.mask), np.asarray(hp.mask))
    np.testing.assert_array_equal(np.asarray(h1.t), np.asarray(hp.t))
    np.testing.assert_allclose(np.asarray(a1.normal), np.asarray(ap.normal),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(a1.material),
                                  np.asarray(ap.material))


@pytest.mark.parametrize("rb_window", [1, 8])
def test_pallas_onehot_gather(rb_window):
    """The MXU one-hot readback (flat f32 tables, any window width) matches
    the take_along path up to the packed path's bf16 normal quantization."""
    scene = default_scene(32, 24).build()
    bvh, _ = build_packet_bvh(scene, leaf_size=64)
    i1 = make_pallas_intersector(scene, bvh, with_tangent=False,
                                 interpret=True)
    io = make_pallas_intersector(scene, bvh, with_tangent=False,
                                 interpret=True, rb_window=rb_window,
                                 rb_gather="onehot")
    assert not io.tables.packed
    o, d = _rays_for(scene, 2048, seed=7)
    act = jnp.ones(2048, bool)
    h1, a1 = i1(o, d, act)
    ho, ao = io(o, d, act)
    np.testing.assert_array_equal(np.asarray(h1.mask), np.asarray(ho.mask))
    np.testing.assert_array_equal(np.asarray(h1.t), np.asarray(ho.t))
    np.testing.assert_allclose(np.asarray(a1.normal), np.asarray(ao.normal),
                               atol=8e-3)
    np.testing.assert_array_equal(np.asarray(a1.material),
                                  np.asarray(ao.material))


def test_pallas_inactive_and_padding():
    scene = default_scene(16, 16).build()
    bvh, _ = build_packet_bvh(scene, leaf_size=64)
    isect = make_pallas_intersector(scene, bvh, with_tangent=False, interpret=True)
    o, d = _rays_for(scene, 700)  # 700 % 1024 != 0
    act = jnp.zeros(700, bool).at[:100].set(True)
    hit, attrs = isect(o, d, act)
    assert hit.t.shape == (700,)
    assert not np.asarray(hit.mask)[100:].any()
    assert np.asarray(hit.mask)[:100].any()


def test_pallas_dragon_primaries(reference_data_root):
    b = load_scene(f"{reference_data_root}/data/scenes/dragon.scn",
                   data_root=reference_data_root)
    scene = b.build()
    bvh, _ = build_packet_bvh(scene, leaf_size=64)
    isect_x = make_packet_intersector(scene, bvh, leaf_size=64, packet_size=1024,
                                      with_tangent=False)
    isect_p = make_pallas_intersector(scene, bvh, with_tangent=False, interpret=True)
    assert isect_p is not None  # dragon fits VMEM budget

    n = 1024
    o, d = _rays_for(scene, n, seed=3)
    act = jnp.ones(n, bool)
    hx, _ = isect_x(o, d, act)
    hp, _ = isect_p(o, d, act)
    mx, mp = np.asarray(hx.mask), np.asarray(hp.mask)
    assert (mx == mp).mean() >= 0.998
    m = mx & mp
    np.testing.assert_allclose(np.asarray(hp.t)[m], np.asarray(hx.t)[m], rtol=1e-5)


@pytest.mark.parametrize("textured", [False, True])
def test_pallas_rb_list(textured):
    """The list-mode readback (traversal-recorded SMEM chunk list, counter-
    bounded fori) must be bit-identical to the min-extract loop: both
    resolve the same final winner from the same tables."""
    b = default_scene(32, 24)
    if textured:
        tex = b.add_texture(np.full((4, 4, 4), 0.5, np.float32))
        b.set_material_texture(1, 0, tex)
    scene = b.build()
    bvh, _ = build_packet_bvh(scene, leaf_size=64)
    i1 = make_pallas_intersector(scene, bvh, with_tangent=False,
                                 interpret=True)
    il = make_pallas_intersector(scene, bvh, with_tangent=False,
                                 interpret=True, rb_mode="list")
    o, d = _rays_for(scene, 3072, seed=11)
    act = jnp.ones(3072, bool)
    h1, a1 = i1(o, d, act)
    hl, al = il(o, d, act)
    np.testing.assert_array_equal(np.asarray(h1.mask), np.asarray(hl.mask))
    np.testing.assert_array_equal(np.asarray(h1.t), np.asarray(hl.t))
    np.testing.assert_array_equal(np.asarray(h1.uv), np.asarray(hl.uv))
    np.testing.assert_array_equal(np.asarray(a1.normal), np.asarray(al.normal))
    np.testing.assert_array_equal(np.asarray(a1.uv), np.asarray(al.uv))
    np.testing.assert_array_equal(np.asarray(a1.material),
                                  np.asarray(al.material))


@pytest.mark.parametrize("textured", [False, True])
@pytest.mark.parametrize("mode", ["fused", "mt", "vlist"])
def test_pallas_rb_fused(textured, mode):
    """The fused ('fused': per-leaf-visit attribute resolve; 'mt':
    interpolate-then-min-extract inside the MT row loop — zero gathers)
    readbacks must be bit-identical to the min-extract loop: the last
    improving visit writes the same interpolated values phase 2 would
    compute for the final winner."""
    b = default_scene(32, 24)
    if textured:
        tex = b.add_texture(np.full((4, 4, 4), 0.5, np.float32))
        b.set_material_texture(1, 0, tex)
    scene = b.build()
    bvh, _ = build_packet_bvh(scene, leaf_size=64)
    i1 = make_pallas_intersector(scene, bvh, with_tangent=False,
                                 interpret=True)
    if_ = make_pallas_intersector(scene, bvh, with_tangent=False,
                                  interpret=True, rb_mode=mode)
    o, d = _rays_for(scene, 3072, seed=11)
    act = jnp.ones(3072, bool)
    h1, a1 = i1(o, d, act)
    hf, af = if_(o, d, act)
    np.testing.assert_array_equal(np.asarray(h1.mask), np.asarray(hf.mask))
    np.testing.assert_array_equal(np.asarray(h1.t), np.asarray(hf.t))
    np.testing.assert_array_equal(np.asarray(h1.uv), np.asarray(hf.uv))
    np.testing.assert_array_equal(np.asarray(a1.normal), np.asarray(af.normal))
    np.testing.assert_array_equal(np.asarray(a1.uv), np.asarray(af.uv))
    np.testing.assert_array_equal(np.asarray(a1.material),
                                  np.asarray(af.material))


@pytest.mark.parametrize("mode", ["fused", "mt"])
def test_pallas_rb_fused_tangent(mode):
    """Fused readbacks with the tangent rows (normal-mapped layout)."""
    b = default_scene(32, 24)
    tex = b.add_texture(np.full((4, 4, 4), 0.5, np.float32))
    b.set_material_texture(1, 0, tex)
    scene = b.build()
    bvh, _ = build_packet_bvh(scene, leaf_size=64)
    i1 = make_pallas_intersector(scene, bvh, with_tangent=True,
                                 interpret=True)
    if_ = make_pallas_intersector(scene, bvh, with_tangent=True,
                                  interpret=True, rb_mode=mode)
    o, d = _rays_for(scene, 2048, seed=5)
    act = jnp.ones(2048, bool)
    h1, a1 = i1(o, d, act)
    hf, af = if_(o, d, act)
    np.testing.assert_array_equal(np.asarray(h1.t), np.asarray(hf.t))
    np.testing.assert_array_equal(np.asarray(a1.tangent),
                                  np.asarray(af.tangent))


def test_pallas_dead_packet_fast_path():
    """A fully-dead packet takes the constant-output fast path: its lanes
    must read as misses with zeroed attributes, and live packets must be
    unaffected."""
    scene = default_scene(32, 24).build()
    bvh, _ = build_packet_bvh(scene, leaf_size=64)
    isect = make_pallas_intersector(scene, bvh, with_tangent=False,
                                    interpret=True)
    o, d = _rays_for(scene, 3072, seed=7)
    act_all = jnp.ones(3072, bool)
    act_mid = act_all.at[1024:2048].set(False)  # packet 1 fully dead
    h_all, a_all = isect(o, d, act_all)
    h_mid, a_mid = isect(o, d, act_mid)
    dead = slice(1024, 2048)
    assert not np.asarray(h_mid.mask)[dead].any()
    np.testing.assert_array_equal(np.asarray(a_mid.material)[dead], 0)
    np.testing.assert_array_equal(np.asarray(a_mid.normal)[dead], 0.0)
    for live in (slice(0, 1024), slice(2048, 3072)):
        np.testing.assert_array_equal(np.asarray(h_all.t)[live],
                                      np.asarray(h_mid.t)[live])
        np.testing.assert_array_equal(np.asarray(a_all.normal)[live],
                                      np.asarray(a_mid.normal)[live])


@pytest.mark.parametrize("textured", [False, True])
def test_pallas_rb_arena(textured):
    """The arena-mode readback (batched all-in-flight chunk DMAs + static
    unrolled resolve over per-ray entry stamps) must be bit-identical to
    the min-extract loop."""
    b = default_scene(32, 24)
    if textured:
        tex = b.add_texture(np.full((4, 4, 4), 0.5, np.float32))
        b.set_material_texture(1, 0, tex)
    scene = b.build()
    bvh, _ = build_packet_bvh(scene, leaf_size=64)
    i1 = make_pallas_intersector(scene, bvh, with_tangent=False,
                                 interpret=True)
    ia = make_pallas_intersector(scene, bvh, with_tangent=False,
                                 interpret=True, rb_mode="arena")
    o, d = _rays_for(scene, 3072, seed=11)
    act = jnp.ones(3072, bool)
    h1, a1 = i1(o, d, act)
    ha, aa = ia(o, d, act)
    np.testing.assert_array_equal(np.asarray(h1.mask), np.asarray(ha.mask))
    np.testing.assert_array_equal(np.asarray(h1.t), np.asarray(ha.t))
    np.testing.assert_array_equal(np.asarray(h1.uv), np.asarray(ha.uv))
    np.testing.assert_array_equal(np.asarray(a1.normal), np.asarray(aa.normal))
    np.testing.assert_array_equal(np.asarray(a1.uv), np.asarray(aa.uv))
    np.testing.assert_array_equal(np.asarray(a1.material),
                                  np.asarray(aa.material))


def test_pallas_rb_arena_multibatch_and_overflow(monkeypatch):
    """ARENA_BATCH=2 forces multiple arena batches per packet; LIST_CAP=6
    additionally trips the overflow fallback. Both must resolve every
    winner exactly."""
    import tracy_tpu.ops.pallas_packet as pp

    scene = default_scene(32, 24).build()
    bvh, _ = build_packet_bvh(scene, leaf_size=64)
    i1 = make_pallas_intersector(scene, bvh, with_tangent=False,
                                 interpret=True)
    o, d = _rays_for(scene, 2048, seed=13)
    act = jnp.ones(2048, bool)
    h1, a1 = i1(o, d, act)

    monkeypatch.setattr(pp, "ARENA_BATCH", 2)
    ia = make_pallas_intersector(scene, bvh, with_tangent=False,
                                 interpret=True, rb_mode="arena")
    ha, aa = ia(o, d, act)
    np.testing.assert_array_equal(np.asarray(h1.mask), np.asarray(ha.mask))
    np.testing.assert_array_equal(np.asarray(h1.t), np.asarray(ha.t))
    np.testing.assert_array_equal(np.asarray(a1.normal), np.asarray(aa.normal))
    np.testing.assert_array_equal(np.asarray(a1.material),
                                  np.asarray(aa.material))

    monkeypatch.setattr(pp, "LIST_CAP", 6)
    io = make_pallas_intersector(scene, bvh, with_tangent=False,
                                 interpret=True, rb_mode="arena")
    ho, ao = io(o, d, act)
    np.testing.assert_array_equal(np.asarray(h1.mask), np.asarray(ho.mask))
    np.testing.assert_array_equal(np.asarray(h1.t), np.asarray(ho.t))
    np.testing.assert_array_equal(np.asarray(a1.normal), np.asarray(ao.normal))
    np.testing.assert_array_equal(np.asarray(a1.material),
                                  np.asarray(ao.material))


@pytest.mark.parametrize("mode", ["list", "vlist"])
def test_pallas_rb_list_overflow(monkeypatch, mode):
    """With a tiny LIST_CAP the overflow flag trips and the min-extract
    fallback must still resolve every winner exactly."""
    import tracy_tpu.ops.pallas_packet as pp

    scene = default_scene(32, 24).build()
    bvh, _ = build_packet_bvh(scene, leaf_size=64)
    i1 = make_pallas_intersector(scene, bvh, with_tangent=False,
                                 interpret=True)
    monkeypatch.setattr(pp, "LIST_CAP", 2)
    il = make_pallas_intersector(scene, bvh, with_tangent=False,
                                 interpret=True, rb_mode=mode)
    o, d = _rays_for(scene, 2048, seed=13)
    act = jnp.ones(2048, bool)
    h1, a1 = i1(o, d, act)
    hl, al = il(o, d, act)
    np.testing.assert_array_equal(np.asarray(h1.mask), np.asarray(hl.mask))
    np.testing.assert_array_equal(np.asarray(h1.t), np.asarray(hl.t))
    np.testing.assert_array_equal(np.asarray(a1.normal), np.asarray(al.normal))
    np.testing.assert_array_equal(np.asarray(a1.material),
                                  np.asarray(al.material))


@pytest.mark.parametrize("pack_woop", [False, True])
def test_pallas_leaf_pipeline(pack_woop):
    """The software-pipelined leaf path (pending-leaf MT overlapped with
    the next chunk's DMA, double-buffered scratch) must be bit-identical
    to the single-buffered fused mode: leaves are MT'd in the same order
    with the same best-t (tightening lags one leaf, a pruning hint only).
    pack_woop=True is the round-3 candidate default combo (pipeline +
    bf16-packed woop rows): quantization must match the non-pipelined
    packed kernel exactly."""
    b = default_scene(32, 24)
    tex = b.add_texture(np.full((4, 4, 4), 0.5, np.float32))
    b.set_material_texture(1, 0, tex)
    scene = b.build()
    bvh, _ = build_packet_bvh(scene, leaf_size=64)
    i0 = make_pallas_intersector(scene, bvh, with_tangent=False,
                                 interpret=True, rb_mode="fused",
                                 pack_woop=pack_woop)
    ip = make_pallas_intersector(scene, bvh, with_tangent=False,
                                 interpret=True, rb_mode="fused",
                                 leaf_pipeline=True, pack_woop=pack_woop)
    o, d = _rays_for(scene, 3072, seed=17)
    act = jnp.ones(3072, bool).at[1024:2048].set(False)  # dead mid packet
    h0, a0 = i0(o, d, act)
    hp, ap = ip(o, d, act)
    np.testing.assert_array_equal(np.asarray(h0.mask), np.asarray(hp.mask))
    np.testing.assert_array_equal(np.asarray(h0.t), np.asarray(hp.t))
    np.testing.assert_array_equal(np.asarray(h0.uv), np.asarray(hp.uv))
    np.testing.assert_array_equal(np.asarray(a0.normal),
                                  np.asarray(ap.normal))
    np.testing.assert_array_equal(np.asarray(a0.uv), np.asarray(ap.uv))
    np.testing.assert_array_equal(np.asarray(a0.material),
                                  np.asarray(ap.material))


@pytest.mark.parametrize("mode", ["fused", "minloop"])
def test_pallas_bvh_width4(mode):
    """4-wide traversal (collapsed binary tree, shared leaf path) must find
    the exact same winners as the binary traversal: same closest-hit
    minima, only the visit ORDER differs."""
    b = default_scene(32, 24)
    tex = b.add_texture(np.full((4, 4, 4), 0.5, np.float32))
    b.set_material_texture(1, 0, tex)
    scene = b.build()
    bvh, _ = build_packet_bvh(scene, leaf_size=64)
    i2 = make_pallas_intersector(scene, bvh, with_tangent=False,
                                 interpret=True, rb_mode=mode)
    i4 = make_pallas_intersector(scene, bvh, with_tangent=False,
                                 interpret=True, rb_mode=mode, width=4)
    assert i4.tables.width == 4
    o, d = _rays_for(scene, 3072, seed=21)
    act = jnp.ones(3072, bool).at[1024:2048].set(False)
    h2, a2 = i2(o, d, act)
    h4, a4 = i4(o, d, act)
    np.testing.assert_array_equal(np.asarray(h2.mask), np.asarray(h4.mask))
    np.testing.assert_array_equal(np.asarray(h2.t), np.asarray(h4.t))
    m = np.asarray(h2.mask)
    # attrs can differ only on exact-t ties across chunks (visit order);
    # none occur in this scene.
    np.testing.assert_array_equal(np.asarray(a2.normal)[m],
                                  np.asarray(a4.normal)[m])
    np.testing.assert_array_equal(np.asarray(a2.material)[m],
                                  np.asarray(a4.material)[m])


@pytest.mark.parametrize("mode", ["fused", "vlist"])
def test_pallas_woop_bf16(mode):
    """bf16-pair-packed Woop rows (tab rows 24 -> 16, the per-leaf-visit
    DMA row count = the measured cost lever, NOTES.md session P).

    'vlist' + pack_woop is the minimum-DMA config: traversal copies ONLY
    the 8 packed woop rows per leaf visit (fused copies the whole 16-row
    table); attributes come in phase 2's batched chunk DMAs.

    Two checks:
    1. EXACT: the packed kernel must equal the f32 kernel run on tables
       whose Woop rows are the bf16-quantized coefficients unpacked back
       to f32 on the host — the in-kernel hi/lo bitcast unpack is a pure
       relayout, all MT math downstream is identical.
    2. STATISTICAL vs the true f32 path: quantization moves t/u/v by
       ~0.2% and can flip boundary rays; hit masks must agree on >98% of
       rays and agreeing hits must match t to 1% relative.
    """
    import dataclasses as dc

    from tracy_tpu.ops.pallas_packet import (
        WOOP_ROWS, build_tables, pallas_intersect,
    )

    b = default_scene(32, 24)
    tex = b.add_texture(np.full((4, 4, 4), 0.5, np.float32))
    b.set_material_texture(1, 0, tex)
    scene = b.build()
    bvh, _ = build_packet_bvh(scene, leaf_size=64)

    tp = build_tables(scene, bvh, with_tangent=False, pack_woop=True)
    assert tp.woop_bf16 and tp.woop_rows == 8
    tf = build_tables(scene, bvh, with_tangent=False, pack_woop=False)
    assert tf.tab.shape[0] - tp.tab.shape[0] == 8

    # Host-side unpack oracle: expand the 6 packed rows to 12 f32 rows
    # (hi = top 16 bits, lo = bottom 16 shifted up), repad to 16.
    packed = np.asarray(tp.tab[:8]).view(np.uint32)
    rows = []
    for k in range(12):
        bits = packed[k // 2]
        bits = (bits & 0xFFFF0000) if k % 2 == 0 else (bits << 16)
        rows.append(bits.view(np.float32))
    rows += [np.zeros_like(rows[0])] * (WOOP_ROWS - 12)
    tab_oracle = np.concatenate(
        [np.stack(rows), np.asarray(tp.tab[8:])], axis=0)
    t_oracle = dc.replace(tf, tab=jnp.asarray(tab_oracle))

    o, d = _rays_for(scene, 3072, seed=23)
    act = jnp.ones(3072, bool).at[1024:2048].set(False)
    kw = dict(stack_depth=64, interpret=True, rb_mode=mode)
    hp, ap = pallas_intersect(o, d, act, tp, **kw)
    ho, ao = pallas_intersect(o, d, act, t_oracle, **kw)
    hf, af = pallas_intersect(o, d, act, tf, **kw)

    np.testing.assert_array_equal(np.asarray(hp.mask), np.asarray(ho.mask))
    np.testing.assert_array_equal(np.asarray(hp.t), np.asarray(ho.t))
    np.testing.assert_array_equal(np.asarray(ap.normal),
                                  np.asarray(ao.normal))
    np.testing.assert_array_equal(np.asarray(ap.material),
                                  np.asarray(ao.material))

    mp, mf = np.asarray(hp.mask), np.asarray(hf.mask)
    agree = mp == mf
    assert agree.mean() > 0.98
    both = mp & mf & agree
    tP, tF = np.asarray(hp.t)[both], np.asarray(hf.t)[both]
    # A silhouette ray can slip between quantized triangles and win a
    # different (farther) surface — allow a small fraction of winner
    # changes; everything else must match t to 1% relative.
    close = np.isclose(tP, tF, rtol=1e-2, atol=1e-3)
    assert close.mean() > 0.98
    np.testing.assert_allclose(tP[close], tF[close], rtol=1e-2, atol=1e-3)


@pytest.mark.parametrize("mode,prays,width", [
    ("fused", 2048, 2),
    ("fused", 4096, 4),
    ("vlist", 4096, 2),
    ("minloop", 2048, 2),
])
def test_pallas_packet_rays(mode, prays, width):
    """Wide packets (16/32 sublanes) must find the exact same winners as
    1024-ray packets: winners are per-ray strict-min best-t, so packet
    formation only changes visit order, never results."""
    b = default_scene(32, 24)
    tex = b.add_texture(np.full((4, 4, 4), 0.5, np.float32))
    b.set_material_texture(1, 0, tex)
    scene = b.build()
    bvh, _ = build_packet_bvh(scene, leaf_size=64)
    i1 = make_pallas_intersector(scene, bvh, with_tangent=False,
                                 interpret=True, rb_mode=mode, width=width)
    iw = make_pallas_intersector(scene, bvh, with_tangent=False,
                                 interpret=True, rb_mode=mode, width=width,
                                 packet_rays=prays)
    # 5120 rays: not a multiple of 4096 — exercises the padding path too.
    o, d = _rays_for(scene, 5120, seed=33)
    act = jnp.ones(5120, bool).at[512:1536].set(False)
    h1, a1 = i1(o, d, act)
    hw, aw = iw(o, d, act)
    np.testing.assert_array_equal(np.asarray(h1.mask), np.asarray(hw.mask))
    np.testing.assert_array_equal(np.asarray(h1.t), np.asarray(hw.t))
    m = np.asarray(h1.mask)
    np.testing.assert_array_equal(np.asarray(a1.normal)[m],
                                  np.asarray(aw.normal)[m])
    np.testing.assert_array_equal(np.asarray(a1.material)[m],
                                  np.asarray(aw.material)[m])
    np.testing.assert_array_equal(np.asarray(a1.uv)[m], np.asarray(aw.uv)[m])


@pytest.mark.parametrize("mode,width", [("fused", 2), ("fused", 4),
                                        ("vlist", 4)])
def test_pallas_slab_batch(mode, width):
    """Batched slab reductions (one fused vector->scalar drain per inner
    visit) must be bit-identical: min over the same masked values, only
    the reduction shape differs."""
    b = default_scene(32, 24)
    scene = b.build()
    bvh, _ = build_packet_bvh(scene, leaf_size=64)
    i0 = make_pallas_intersector(scene, bvh, with_tangent=False,
                                 interpret=True, rb_mode=mode, width=width)
    ib = make_pallas_intersector(scene, bvh, with_tangent=False,
                                 interpret=True, rb_mode=mode, width=width,
                                 slab_batch=True)
    o, d = _rays_for(scene, 3072, seed=7)
    act = jnp.ones(3072, bool).at[256:512].set(False)
    h0, a0 = i0(o, d, act)
    hb, ab = ib(o, d, act)
    np.testing.assert_array_equal(np.asarray(h0.mask), np.asarray(hb.mask))
    np.testing.assert_array_equal(np.asarray(h0.t), np.asarray(hb.t))
    m = np.asarray(h0.mask)
    np.testing.assert_array_equal(np.asarray(h0.uv)[m],
                                  np.asarray(hb.uv)[m])
    np.testing.assert_array_equal(np.asarray(a0.normal)[m],
                                  np.asarray(ab.normal)[m])
    np.testing.assert_array_equal(np.asarray(a0.uv)[m],
                                  np.asarray(ab.uv)[m])
    np.testing.assert_array_equal(np.asarray(a0.material)[m],
                                  np.asarray(ab.material)[m])


@pytest.mark.parametrize("mode,width", [("fused", 2), ("fused", 4),
                                        ("vlist", 2), ("vlist", 4),
                                        ("vlist", 8)])
def test_pallas_row_skip(mode, width):
    """Row skip (run the leaf MT only for ray rows whose pushed slab mask
    is live) must be EXACT: child AABBs nest inside parents and best_t
    only tightens, so a ray that missed a node's box at push time can
    never produce a winning hit inside it."""
    b = default_scene(32, 24)
    tex = b.add_texture(np.full((4, 4, 4), 0.5, np.float32))
    b.set_material_texture(1, 0, tex)
    scene = b.build()
    bvh, _ = build_packet_bvh(scene, leaf_size=64)
    i0 = make_pallas_intersector(scene, bvh, with_tangent=True,
                                 interpret=True, rb_mode=mode, width=width,
                                 slab_batch=True)
    ir = make_pallas_intersector(scene, bvh, with_tangent=True,
                                 interpret=True, rb_mode=mode, width=width,
                                 slab_batch=True, row_skip=True)
    o, d = _rays_for(scene, 3072, seed=11)
    act = jnp.ones(3072, bool).at[100:700].set(False)
    h0, a0 = i0(o, d, act)
    hr, ar = ir(o, d, act)
    np.testing.assert_array_equal(np.asarray(h0.mask), np.asarray(hr.mask))
    np.testing.assert_array_equal(np.asarray(h0.t), np.asarray(hr.t))
    m = np.asarray(h0.mask)
    np.testing.assert_array_equal(np.asarray(h0.uv)[m], np.asarray(hr.uv)[m])
    np.testing.assert_array_equal(np.asarray(a0.normal)[m],
                                  np.asarray(ar.normal)[m])
    np.testing.assert_array_equal(np.asarray(a0.uv)[m], np.asarray(ar.uv)[m])
    np.testing.assert_array_equal(np.asarray(a0.tangent)[m],
                                  np.asarray(ar.tangent)[m])
    np.testing.assert_array_equal(np.asarray(a0.material)[m],
                                  np.asarray(ar.material)[m])


@pytest.mark.parametrize("textured", [False, True])
@pytest.mark.parametrize("width", [2, 4])
def test_pallas_defer_uv(textured, width):
    """Deferred winner-u/v extraction (vlist phase 2 recomputes u/v from
    the winner's gathered Woop coefficients and the stored winner t, with
    the same expression tree) must match the in-loop extraction."""
    b = default_scene(32, 24)
    if textured:
        tex = b.add_texture(np.full((4, 4, 4), 0.5, np.float32))
        b.set_material_texture(1, 0, tex)
    scene = b.build()
    bvh, _ = build_packet_bvh(scene, leaf_size=64)
    i0 = make_pallas_intersector(scene, bvh, with_tangent=False,
                                 interpret=True, rb_mode="vlist",
                                 width=width, slab_batch=True)
    idf = make_pallas_intersector(scene, bvh, with_tangent=False,
                                  interpret=True, rb_mode="vlist",
                                  width=width, slab_batch=True,
                                  defer_uv=True)
    o, d = _rays_for(scene, 3072, seed=13)
    act = jnp.ones(3072, bool).at[256:512].set(False)
    h0, a0 = i0(o, d, act)
    hd, ad = idf(o, d, act)
    np.testing.assert_array_equal(np.asarray(h0.mask), np.asarray(hd.mask))
    np.testing.assert_array_equal(np.asarray(h0.t), np.asarray(hd.t))
    m = np.asarray(h0.mask)
    np.testing.assert_array_equal(np.asarray(h0.uv)[m], np.asarray(hd.uv)[m])
    np.testing.assert_array_equal(np.asarray(a0.normal)[m],
                                  np.asarray(ad.normal)[m])
    np.testing.assert_array_equal(np.asarray(a0.uv)[m], np.asarray(ad.uv)[m])
    np.testing.assert_array_equal(np.asarray(a0.material)[m],
                                  np.asarray(ad.material)[m])


@pytest.mark.parametrize("prec", ["high", "highest"])
def test_pallas_mt_mxu(prec):
    """MXU MT transform (one [384,4]@[4,256] dot per ray row) vs the VPU
    chains. In interpret mode the dot runs as an f32 XLA contraction, so
    only association order differs from the mul-add chains: a
    statistical-parity knob (like mt_point) — assert near-total mask
    agreement and tight t agreement on co-hits, not bit equality."""
    b = default_scene(32, 24)
    scene = b.build()
    bvh, _ = build_packet_bvh(scene, leaf_size=64)
    i0 = make_pallas_intersector(scene, bvh, with_tangent=False,
                                 interpret=True, rb_mode="vlist", width=4,
                                 slab_batch=True, row_skip=True,
                                 defer_uv=True)
    ix = make_pallas_intersector(scene, bvh, with_tangent=False,
                                 interpret=True, rb_mode="vlist", width=4,
                                 slab_batch=True, row_skip=True,
                                 defer_uv=True, mt_mxu=prec)
    o, d = _rays_for(scene, 3072, seed=5)
    act = jnp.ones(3072, bool).at[128:384].set(False)
    h0, a0 = i0(o, d, act)
    hx, ax = ix(o, d, act)
    m0, mx = np.asarray(h0.mask), np.asarray(hx.mask)
    assert (m0 == mx).mean() > 0.999
    both = m0 & mx
    t0, tx = np.asarray(h0.t)[both], np.asarray(hx.t)[both]
    close = np.abs(t0 - tx) <= 1e-4 * np.abs(t0) + 1e-5
    assert close.mean() > 0.999
    mat0 = np.asarray(a0.material)[both]
    matx = np.asarray(ax.material)[both]
    assert (mat0 == matx).mean() > 0.999


@pytest.mark.parametrize("prays,pps", [(1024, 2), (2048, 1)])
def test_pallas_block_skip(prays, pps):
    """Dead-step block skip must be bit-identical to off: dead steps'
    outputs come from the XLA-side substitution of the SAME miss
    constants the in-kernel fast path writes; live steps are untouched.
    Covers leading-dead (routed to step 0's no-op body), mid-dead and
    all-dead waves."""
    b = default_scene(32, 24)
    scene = b.build()
    bvh, _ = build_packet_bvh(scene, leaf_size=64)
    i0 = make_pallas_intersector(scene, bvh, with_tangent=False,
                                 interpret=True, rb_mode="vlist", width=4,
                                 slab_batch=True, row_skip=True,
                                 defer_uv=True)
    o, d = _rays_for(scene, 8192, seed=9)
    act = np.ones(8192, bool)
    act[:2 * prays * pps] = False      # leading dead steps
    act[4 * prays:5 * prays] = False   # dead packet inside/at a step
    act = jnp.asarray(act)

    from tracy_tpu.ops.pallas_packet import pallas_intersect
    tb = i0.tables
    kw = dict(interpret=True, rb_mode="vlist", slab_batch=True,
              row_skip=True, defer_uv=True, packet_rays=prays,
              packets_per_step=pps)
    h0, a0 = pallas_intersect(o, d, act, tb, **kw)
    h1, a1 = pallas_intersect(o, d, act, tb, block_skip=True, **kw)
    np.testing.assert_array_equal(np.asarray(h0.mask), np.asarray(h1.mask))
    np.testing.assert_array_equal(np.asarray(h0.t), np.asarray(h1.t))
    m = np.asarray(h0.mask)
    np.testing.assert_array_equal(np.asarray(h0.uv)[m], np.asarray(h1.uv)[m])
    np.testing.assert_array_equal(np.asarray(a0.normal)[m],
                                  np.asarray(a1.normal)[m])
    np.testing.assert_array_equal(np.asarray(a0.uv)[m], np.asarray(a1.uv)[m])
    np.testing.assert_array_equal(np.asarray(a0.material)[m],
                                  np.asarray(a1.material)[m])
    hz, _ = pallas_intersect(o, d, jnp.zeros(8192, bool), tb,
                             block_skip=True, **kw)
    assert not np.asarray(hz.mask).any()


def test_pallas_row_skip_defer_uv_combined():
    """Both levers together (the production candidate config)."""
    b = default_scene(32, 24)
    scene = b.build()
    bvh, _ = build_packet_bvh(scene, leaf_size=64)
    i0 = make_pallas_intersector(scene, bvh, with_tangent=False,
                                 interpret=True, rb_mode="vlist", width=4,
                                 slab_batch=True)
    ic = make_pallas_intersector(scene, bvh, with_tangent=False,
                                 interpret=True, rb_mode="vlist", width=4,
                                 slab_batch=True, row_skip=True,
                                 defer_uv=True)
    o, d = _rays_for(scene, 4096, seed=17)
    act = jnp.ones(4096, bool).at[0:128].set(False)
    h0, a0 = i0(o, d, act)
    hc, ac = ic(o, d, act)
    np.testing.assert_array_equal(np.asarray(h0.mask), np.asarray(hc.mask))
    np.testing.assert_array_equal(np.asarray(h0.t), np.asarray(hc.t))
    m = np.asarray(h0.mask)
    np.testing.assert_array_equal(np.asarray(h0.uv)[m], np.asarray(hc.uv)[m])
    np.testing.assert_array_equal(np.asarray(a0.normal)[m],
                                  np.asarray(ac.normal)[m])
    np.testing.assert_array_equal(np.asarray(a0.material)[m],
                                  np.asarray(ac.material)[m])


@pytest.mark.parametrize("width", [2, 4])
def test_pallas_mt_point(width):
    """Point-form MT (u = (R(o + t d - p0))_x, 11 plane ops vs 26) is
    algebraically equal to the two-chain form but ulp-different: validate
    statistically against the default kernel (knife-edge winner flips
    only) and exactly on t for agreeing hits."""
    b = default_scene(32, 24)
    scene = b.build()
    bvh, _ = build_packet_bvh(scene, leaf_size=64)
    i0 = make_pallas_intersector(scene, bvh, with_tangent=False,
                                 interpret=True, rb_mode="vlist",
                                 width=width, slab_batch=True, row_skip=True)
    ip = make_pallas_intersector(scene, bvh, with_tangent=False,
                                 interpret=True, rb_mode="vlist",
                                 width=width, slab_batch=True, row_skip=True,
                                 mt_point=True)
    o, d = _rays_for(scene, 4096, seed=23)
    act = jnp.ones(4096, bool)
    h0, a0 = i0(o, d, act)
    hp, ap = ip(o, d, act)
    m0, mp = np.asarray(h0.mask), np.asarray(hp.mask)
    assert (m0 == mp).mean() >= 0.999
    m = m0 & mp
    t0, tp = np.asarray(h0.t)[m], np.asarray(hp.t)[m]
    # t comes from the unchanged z-chain; only WINNERS can differ.
    close = np.abs(t0 - tp) <= 1e-5 * np.abs(t0) + 1e-6
    assert close.mean() >= 0.999
    np.testing.assert_allclose(np.asarray(a0.normal)[m][close],
                               np.asarray(ap.normal)[m][close],
                               rtol=1e-2, atol=1e-2)


def test_pallas_mt_point_defer_uv_exact():
    """With BOTH mt_point and defer_uv the phase-2 recompute mirrors the
    point-form expression tree — exact vs the in-loop extraction."""
    b = default_scene(32, 24)
    scene = b.build()
    bvh, _ = build_packet_bvh(scene, leaf_size=64)
    i0 = make_pallas_intersector(scene, bvh, with_tangent=False,
                                 interpret=True, rb_mode="vlist", width=4,
                                 slab_batch=True, row_skip=True,
                                 mt_point=True)
    ic = make_pallas_intersector(scene, bvh, with_tangent=False,
                                 interpret=True, rb_mode="vlist", width=4,
                                 slab_batch=True, row_skip=True,
                                 mt_point=True, defer_uv=True)
    o, d = _rays_for(scene, 3072, seed=29)
    act = jnp.ones(3072, bool)
    h0, a0 = i0(o, d, act)
    hc, ac = ic(o, d, act)
    np.testing.assert_array_equal(np.asarray(h0.mask), np.asarray(hc.mask))
    np.testing.assert_array_equal(np.asarray(h0.t), np.asarray(hc.t))
    m = np.asarray(h0.mask)
    np.testing.assert_array_equal(np.asarray(h0.uv)[m], np.asarray(hc.uv)[m])
    np.testing.assert_array_equal(np.asarray(a0.normal)[m],
                                  np.asarray(ac.normal)[m])


@pytest.mark.parametrize("prays", [4096, 8192])
def test_pallas_row_skip_wide_packets(prays):
    """row_skip at wide packets: sub=32's all-ones root mask must not
    overflow i32 (regression: OverflowError at bench prays=4096), and
    sub=64 uses TWO mask words per stack entry — both bit-identical."""
    b = default_scene(32, 24)
    scene = b.build()
    bvh, _ = build_packet_bvh(scene, leaf_size=64)
    i0 = make_pallas_intersector(scene, bvh, with_tangent=False,
                                 interpret=True, rb_mode="vlist", width=4,
                                 slab_batch=True, packet_rays=prays)
    ir = make_pallas_intersector(scene, bvh, with_tangent=False,
                                 interpret=True, rb_mode="vlist", width=4,
                                 slab_batch=True, packet_rays=prays,
                                 row_skip=True)
    o, d = _rays_for(scene, 8192, seed=31)
    act = jnp.ones(8192, bool).at[5000:5600].set(False)
    h0, _ = i0(o, d, act)
    hr, _ = ir(o, d, act)
    np.testing.assert_array_equal(np.asarray(h0.mask), np.asarray(hr.mask))
    np.testing.assert_array_equal(np.asarray(h0.t), np.asarray(hr.t))


@pytest.mark.parametrize("row_skip", [False, True])
def test_pallas_two_pop(row_skip):
    """Two-pop inner batching (one fused [sub, 2W] slab reduce per TWO
    popped inner nodes) changes only VISIT ORDER: pruning is strictly
    conservative (both nodes see pop-time best_t) and the final best_t is
    a pure min over the same candidate set — mask and t must be EXACT.
    Only equal-t tie winners (attrs) may flip, like mt_point."""
    b = default_scene(32, 24)
    tex = b.add_texture(np.full((4, 4, 4), 0.5, np.float32))
    b.set_material_texture(1, 0, tex)
    scene = b.build()
    bvh, _ = build_packet_bvh(scene, leaf_size=64)
    i0 = make_pallas_intersector(scene, bvh, with_tangent=True,
                                 interpret=True, rb_mode="vlist", width=4,
                                 slab_batch=True, row_skip=row_skip)
    i2 = make_pallas_intersector(scene, bvh, with_tangent=True,
                                 interpret=True, rb_mode="vlist", width=4,
                                 slab_batch=True, row_skip=row_skip,
                                 two_pop=True)
    o, d = _rays_for(scene, 4096, seed=31)
    act = jnp.ones(4096, bool).at[300:900].set(False)
    h0, a0 = i0(o, d, act)
    h2, a2 = i2(o, d, act)
    np.testing.assert_array_equal(np.asarray(h0.mask), np.asarray(h2.mask))
    np.testing.assert_array_equal(np.asarray(h0.t), np.asarray(h2.t))
    m = np.asarray(h0.mask)
    same = (np.asarray(a0.material)[m] == np.asarray(a2.material)[m])
    assert same.mean() >= 0.999  # equal-t tie flips only
    np.testing.assert_array_equal(np.asarray(a0.normal)[m][same],
                                  np.asarray(a2.normal)[m][same])
    np.testing.assert_array_equal(np.asarray(a0.uv)[m][same],
                                  np.asarray(a2.uv)[m][same])


def test_pallas_two_pop_production_config():
    """Two-pop at the full production knob set (vlist + row_skip +
    defer_uv + mt_point, width 4)."""
    b = default_scene(32, 24)
    scene = b.build()
    bvh, _ = build_packet_bvh(scene, leaf_size=64)
    kw = dict(with_tangent=False, interpret=True, rb_mode="vlist", width=4,
              slab_batch=True, row_skip=True, defer_uv=True, mt_point=True)
    i0 = make_pallas_intersector(scene, bvh, **kw)
    i2 = make_pallas_intersector(scene, bvh, two_pop=True, **kw)
    o, d = _rays_for(scene, 3072, seed=37)
    act = jnp.ones(3072, bool)
    h0, a0 = i0(o, d, act)
    h2, a2 = i2(o, d, act)
    np.testing.assert_array_equal(np.asarray(h0.mask), np.asarray(h2.mask))
    np.testing.assert_array_equal(np.asarray(h0.t), np.asarray(h2.t))
    m = np.asarray(h0.mask)
    same = (np.asarray(a0.material)[m] == np.asarray(a2.material)[m])
    assert same.mean() >= 0.999


@pytest.mark.parametrize("leaf_size", [192, 256])
def test_pallas_oversized_leaves_split(leaf_size):
    """pallas_leaf_size > 128 must be VALID: build_tables splits leaves
    wider than one 128-slot chunk into a balanced subtree (round-5
    session I shipped a fast-because-wrong bench when the old code
    silently dropped the excess triangles). Exact vs the XLA packet
    intersector on the same BVH."""
    b = default_scene(32, 24)
    scene = b.build()
    bvh, _ = build_packet_bvh(scene, leaf_size=leaf_size)
    import numpy as _np
    assert int(_np.asarray(bvh.node_meta)[:, 1].max()) > 128  # premise
    isect_x = make_packet_intersector(scene, bvh, leaf_size=leaf_size,
                                      packet_size=1024, with_tangent=False)
    isect_p = make_pallas_intersector(scene, bvh, with_tangent=False,
                                      interpret=True, rb_mode="vlist",
                                      width=4, slab_batch=True,
                                      row_skip=True, defer_uv=True)
    o, d = _rays_for(scene, 2048, seed=41)
    act = jnp.ones(2048, bool)
    hx, _ax = isect_x(o, d, act)
    hp, _ap = isect_p(o, d, act)
    np.testing.assert_array_equal(np.asarray(hx.mask), np.asarray(hp.mask))
    np.testing.assert_allclose(np.asarray(hp.t)[np.asarray(hx.mask)],
                               np.asarray(hx.t)[np.asarray(hx.mask)],
                               rtol=1e-5, atol=1e-5)
