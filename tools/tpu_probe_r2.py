#!/usr/bin/env python3
"""Round-2 TPU measurement probe: where does the dragon frame time go?

Measures, on the real chip (run AFTER tools/tpu_gate.py passes):
  A. coherent primary-wave intersect cost vs packets-per-grid-step (pps);
  B. incoherent wave-2 intersect cost vs pps (the round-1 dominator);
  C. packet-count scaling at fixed pps (separates fixed-vs-marginal cost);
  D. a short full-frame step_many timing for the end-to-end picture.

Every timed program runs the intersect REPS times inside one jit program
(fori_loop with a carried checksum) so the ~30ms tunnel dispatch overhead
amortizes out of the per-call numbers.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("PROBE_REPS", 8))
RBW = int(os.environ.get("PROBE_RBW", 1))
RBP = os.environ.get("PROBE_RBP", "0") == "1"
RBG = os.environ.get("PROBE_RBG", "take")
RBM = os.environ.get("PROBE_RBM", "minloop")
LEAF = int(os.environ.get("PROBE_LEAF", 64))
BVHW = int(os.environ.get("PROBE_BVHW", 2))  # tree width (tables.width)
PRAYS = int(os.environ.get("PROBE_PRAYS", 1024))  # rays per packet
SLABB = os.environ.get("PROBE_SLABB", "0") == "1"  # batched slab reduces
RSKIP = os.environ.get("PROBE_RSKIP", "0") == "1"  # row-skip leaf MT
DUV = os.environ.get("PROBE_DUV", "0") == "1"  # deferred u/v (vlist)
MTP = os.environ.get("PROBE_MTPOINT", "0") == "1"  # point-form MT
COST = os.environ.get("PROBE_COST", "tris")  # 'chunks' = the bench's build
PPS_LIST = tuple(int(x) for x in os.environ.get("PROBE_PPS", "4,8,16,32").split(","))
SKIP_C = os.environ.get("PROBE_SKIP_C", "0") == "1"
SKIP_D = os.environ.get("PROBE_SKIP_D", "0") == "1"
SKIP_AB = os.environ.get("PROBE_SKIP_AB", "0") == "1"


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tracy_tpu.accel.packet import build_packet_bvh, make_packet_intersector
    from tracy_tpu.config import RenderConfig
    from tracy_tpu.core.camera import pixel_samples_rows
    from tracy_tpu.core.rng import RngSpec
    from tracy_tpu.ops.pallas_packet import build_tables, pallas_intersect
    from tracy_tpu.render import material as mtl
    from tracy_tpu.render.integrator import (
        DRAW_ROULETTE, DRAW_SPECULAR, DRAW_SPHERE_PHI, DRAW_SPHERE_Z,
        JITTER_BOUNCE,
    )
    from tracy_tpu.render.renderer import Renderer, init_state
    from tracy_tpu.scene.scn_parser import load_scene

    print(f"[probe] device: {jax.devices()[0]}", flush=True)

    w = int(os.environ.get("PROBE_W", 640))
    h = int(os.environ.get("PROBE_H", 480))
    scene_name = os.environ.get("PROBE_SCENE", "dragon")
    b = load_scene(f"/root/reference/data/scenes/{scene_name}.scn",
                   data_root="/root/reference")
    b.width, b.height = w, h
    scene = b.build()
    cfg = RenderConfig(width=w, height=h, spp=1, accel="packet",
                       pallas_rb_mode=RBM, pallas_packet_rays=PRAYS,
                       pallas_slab_batch=SLABB, pallas_row_skip=RSKIP,
                       pallas_defer_uv=DUV, pallas_mt_point=MTP,
                       pallas_bvh_width=BVHW,
                       wave_compact_group=int(os.environ.get(
                           "PROBE_FRAME_COMPACT", "0")))
    # Textured scenes need tangents/uv in the tables for the shade stage.
    wt = bool(np.asarray(scene.materials.tex_index).max() >= 0)
    bvh, _ = build_packet_bvh(scene, leaf_size=LEAF, cost_mode=COST)
    tables = build_tables(scene, bvh, with_tangent=wt, width=BVHW,
                          pack_pairs=(os.environ.get("PROBE_RBG", "take")
                                      != "onehot"))
    print(f"[probe] {scene_name} {b.num_triangles} tris, leaf_size={LEAF}, "
          f"node vmem {tables.vmem_bytes/1e6:.1f}MB", flush=True)

    # ---- primary rays in 32x32 tile order --------------------------------
    rng = RngSpec(cfg.rng, cfg.seed)
    rows = jnp.arange(h, dtype=jnp.int32)
    pix = (rows[:, None] * w + jnp.arange(w, dtype=jnp.int32)[None, :]).astype(jnp.uint32)
    ju = rng.uniform(pix, jnp.uint32(0), JITTER_BOUNCE, 0)
    jv = rng.uniform(pix, jnp.uint32(0), JITTER_BOUNCE, 1)
    ss, tt = pixel_samples_rows(w, h, rows, ju, jv)
    o_i, d_i = scene.camera.generate_rays(ss, tt)

    def tile_fold(x):
        extra = x.shape[2:]
        x = x.reshape((h // 32, 32, w // 32, 32) + extra)
        x = jnp.swapaxes(x, 1, 2)
        return x.reshape((h * w,) + extra)

    o1 = tile_fold(o_i)
    d1 = tile_fold(d_i)
    pixf = tile_fold(pix)
    act1 = jnp.ones((h * w,), bool)
    npk = (h * w) // 1024
    print(f"[probe] wave: {npk} packets", flush=True)

    def timed_intersect(o, d, act, pps, label, reps=REPS):
        def prog(o, d, act):
            def body(i, carry):
                s, _ = carry
                oo = o.at[0, 0].add(jnp.float32(i) * 1e-6)  # defeat CSE
                hit, at = pallas_intersect(oo, d, act, tables,
                                           packets_per_step=pps,
                                           rb_window=RBW, rb_prefetch=RBP,
                                           rb_gather=RBG, rb_mode=RBM,
                                           packet_rays=PRAYS,
                                           slab_batch=SLABB, row_skip=RSKIP,
                                           defer_uv=DUV, mt_point=MTP,
                                           stub=os.environ.get(
                                               "PROBE_STUB", "0") == "1")
                return s + jnp.sum(hit.t
                                   * 0.0) + jnp.sum(jnp.where(hit.mask, 1.0, 0.0)), hit.t[0]
            return jax.lax.fori_loop(0, reps, body, (jnp.float32(0), jnp.float32(0)))

        f = jax.jit(prog)
        t0 = time.perf_counter()
        r = f(o, d, act)
        r[0].block_until_ready()
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        r = f(o, d, act)
        r[0].block_until_ready()
        el = (time.perf_counter() - t0) / reps
        per_packet = el / max(len(o) // PRAYS, 1)
        print(f"[probe] {label} pps={pps:3d}: {el*1e3:8.2f} ms/wave  "
              f"{per_packet*1e6:7.1f} us/packet  (compile {compile_s:.0f}s)",
              flush=True)
        return el

    print("[probe] === A: coherent primary wave, pps sweep ===", flush=True)
    for pps in () if SKIP_AB else PPS_LIST:
        timed_intersect(o1, d1, act1, pps, "primary")

    if SKIP_AB:
        # D-only run (frame timings): skip wave-2 build + sections B/C.
        d0 = os.environ.get("PROBE_D0", "0")
        if d0 != "0":
            run_stub_frame(scene, cfg)
        if d0 == "pack":
            run_stub_frame(scene, cfg, tables=tables)
        run_frames(scene, cfg, Renderer, init_state)
        print("[probe] DONE", flush=True)
        return 0

    # ---- build wave-2 rays on-device (one shot) --------------------------
    print("[probe] building wave-2 rays...", flush=True)
    isect_x = make_packet_intersector(scene, bvh, with_tangent=False)

    # scene/tables ride as jit ARGUMENTS: closure-captured device arrays
    # become HLO literals and a textured scene's atlas blows the remote
    # compile request limit (HTTP 413 — the helmet lesson, NOTES.md).
    def wave2(sc, tb, o, d, act):
        hit, attrs = pallas_intersect(o, d, act, tb, rb_window=RBW,
                                      rb_prefetch=RBP, rb_gather=RBG,
                                      rb_mode=RBM)
        params = mtl.gather_surface_params(sc, attrs.material, attrs.uv,
                                           attrs.normal, attrs.tangent)
        r1 = rng.uniform(pixf, jnp.uint32(0), 0, DRAW_SPHERE_Z)
        r2 = rng.uniform(pixf, jnp.uint32(0), 0, DRAW_SPHERE_PHI)
        r3 = rng.uniform(pixf, jnp.uint32(0), 0, DRAW_SPECULAR)
        point = o + hit.t[:, None] * d
        res = mtl.scatter(d, point, params, r1, r2, r3)
        p = 1e-8 + jnp.max(res.attenuation, axis=-1)
        rr = rng.uniform(pixf, jnp.uint32(0), 0, DRAW_ROULETTE)
        alive = hit.mask & (rr <= p)
        return res.origin, res.direction, alive

    rays_file = os.environ.get("PROBE_RAYS_FILE", "")
    if rays_file and os.path.exists(rays_file):
        # Identical wave-2 rays across ablation configs (an ablated kernel
        # produces garbage hits -> different scatter -> incomparable waves).
        z = np.load(rays_file)
        o2 = jnp.asarray(z["o2"]); d2 = jnp.asarray(z["d2"])
        act2 = jnp.asarray(z["act2"])
        print(f"[probe] wave2 rays loaded from {rays_file}", flush=True)
    else:
        if os.environ.get("TRACY_PALLAS_ABLATE", ""):
            # MEASUREMENT INTEGRITY: an ablated kernel produces garbage
            # hits -> garbage scatter -> a dead/incomparable wave saved
            # as the shared baseline (the round-2 dead-wave artifact).
            raise RuntimeError(
                "PROBE_RAYS_FILE missing and TRACY_PALLAS_ABLATE is set: "
                "generate the wave-2 file with an UNABLATED run first "
                "(put '' first in ABLATE_LIST)")
        o2, d2, act2 = jax.jit(wave2)(scene, tables, o1, d1, act1)
        o2.block_until_ready()
        if rays_file:
            np.savez(rays_file, o2=np.asarray(o2), d2=np.asarray(d2),
                     act2=np.asarray(act2))
            print(f"[probe] wave2 rays saved to {rays_file}", flush=True)
    live = float(jnp.mean(act2.astype(jnp.float32)))
    print(f"[probe] wave2 live fraction: {live:.3f}", flush=True)

    print("[probe] === B: incoherent wave 2, pps sweep ===", flush=True)
    for pps in PPS_LIST:
        timed_intersect(o2, d2, act2, pps, "wave2  ", reps=max(2, REPS // 2))

    print("[probe] === C: packet-count scaling (pps=8) ===", flush=True)
    for frac in () if SKIP_C else (4, 2, 1):
        n = (h * w) // frac
        timed_intersect(o2[:n], d2[:n], act2[:n], 8, f"wave2/{frac}",
                        reps=max(2, REPS // 2))

    if SKIP_D:
        print("[probe] DONE", flush=True)
        return 0
    run_stub_frame(scene, cfg)
    run_frames(scene, cfg, Renderer, init_state)
    print("[probe] DONE", flush=True)
    return 0


def run_stub_frame(scene, cfg, tables=None):
    """Section D0: full render_step frames with a stub intersector — the
    XLA-side cost of everything EXCEPT intersection/shade-kernel (raygen,
    XLA shading incl. any texture gathers, routing, accumulation).
    With tables (PROBE_D0=pack): the stub keeps pallas_intersect's FULL
    packing/unpacking glue (stub=True skips only the pallas_call) — the
    delta vs the plain stub is the REAL fused per-frame glue cost."""
    import time

    import jax
    import jax.numpy as jnp

    from tracy_tpu.accel.packet import PacketAttrs
    from tracy_tpu.render.intersect import FLT_MAX, Hit
    from tracy_tpu.render.renderer import render_step, init_state as _init

    mode = "pack-stub" if tables is not None else "no-pack stub"
    print(f"[probe] === D0: frame minus intersection ({mode}) ===",
          flush=True)

    if tables is not None:
        from tracy_tpu.ops.pallas_packet import pallas_intersect

        def stub_isect(o, d, act):
            return pallas_intersect(
                o, d, act, tables, rb_mode=RBM, packet_rays=PRAYS,
                slab_batch=SLABB, row_skip=RSKIP, defer_uv=DUV,
                mt_point=MTP, stub=True)
    else:
        def stub_isect(o, d, act):
            n = o.shape[0]
            hit = Hit(t=jnp.full((n,), FLT_MAX),
                      tri=jnp.zeros((n,), jnp.int32),
                      uv=jnp.zeros((n, 2)), mask=jnp.zeros((n,), bool))
            at = PacketAttrs(normal=jnp.zeros((n, 3)),
                             tangent=jnp.zeros((n, 3)),
                             uv=jnp.zeros((n, 2)),
                             material=jnp.zeros((n,), jnp.int32))
            return hit, at

    def frame_prog(sc, st):
        # scene rides as a jit ARGUMENT: closure-captured device arrays
        # become HLO literals, and a textured scene's atlas blows the
        # remote-compile request limit (helmet: HTTP 413).
        def body(_, carry):
            s2, r = render_step(sc, carry[0], cfg, stub_isect)
            return s2, carry[1] + r
        return jax.lax.fori_loop(0, 4, body, (st, jnp.zeros((), jnp.int32)))

    fj = jax.jit(frame_prog)
    st0 = _init(cfg)
    t0 = time.perf_counter()
    r = fj(scene, st0); r[0].accum.block_until_ready()
    print(f"[probe] stub-frame compile+run {time.perf_counter()-t0:.0f}s", flush=True)
    st0 = _init(cfg)
    t0 = time.perf_counter()
    r = fj(scene, st0); r[0].accum.block_until_ready()
    print(f"[probe] frame-minus-intersect: {(time.perf_counter()-t0)/4*1e3:.1f} ms/frame",
          flush=True)


def run_frames(scene, cfg, Renderer, init_state):
    """Section D: full-frame step_many timings (bench-like config knobs:
    PROBE_FRAME_RBM/COMPACT/SHADE override the cfg defaults)."""
    import time

    rbm = os.environ.get("PROBE_FRAME_RBM", cfg.pallas_rb_mode)
    compact = int(os.environ.get("PROBE_FRAME_COMPACT",
                                 cfg.wave_compact_group))
    shade = os.environ.get("PROBE_FRAME_SHADE", "1") == "1"
    bounce = os.environ.get("PROBE_FRAME_BOUNCE", "0") == "1"
    print("[probe] === D: full-frame step_many ===", flush=True)
    for pps in (2, 8):
        cfg2 = cfg.replace(pallas_packets_per_step=pps,
                           pallas_rb_mode=rbm, wave_compact_group=compact,
                           use_pallas_shade=shade, use_pallas_bounce=bounce,
                           pallas_bvh_width=BVHW)
        r = Renderer(cfg2)
        st = init_state(cfg2)
        t0 = time.perf_counter()
        st, rays = r.step_many(scene, st, 4)
        warm = time.perf_counter() - t0
        r.timer.reset(); r.total_rays = 0.0
        st, rays = r.step_many(scene, st, 4)
        print(f"[probe] frame pps={pps} rbm={rbm} compact={compact} "
              f"shade={int(shade)}: {r.timer.total/4*1e3:.0f} ms/frame "
              f"{r.mrays_per_sec:.2f} MRays/s (warm {warm:.0f}s)", flush=True)


if __name__ == "__main__":
    sys.exit(main())
