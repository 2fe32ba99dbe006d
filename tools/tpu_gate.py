#!/usr/bin/env python3
"""5-minute TPU-session correctness gate (run FIRST in every TPU session).

Checks, tiny-to-larger per the wedge-avoidance protocol (CLAUDE.md):
  1. device sanity: a trivial op completes;
  2. Pallas packet kernel vs XLA packet intersector allclose on a 64x64
     cornell primary wave (t, normal, material);
  3. a 64x64 cornell render step is finite and MRays/s prints.

Exit code 0 = safe to proceed with bigger TPU work.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    dev = jax.devices()[0]
    print(f"[gate] device: {dev}", flush=True)
    t0 = time.perf_counter()
    x = jnp.ones((8, 128)) + 1.0
    x.block_until_ready()
    print(f"[gate] trivial op ok ({time.perf_counter()-t0:.2f}s)", flush=True)

    from tracy_tpu.accel.packet import (
        build_packet_bvh, make_packet_intersector,
    )
    from tracy_tpu.config import RenderConfig
    from tracy_tpu.core.camera import pixel_samples_rows
    from tracy_tpu.core.rng import RngSpec
    from tracy_tpu.ops.pallas_packet import build_tables, pallas_intersect
    from tracy_tpu.render.integrator import JITTER_BOUNCE
    from tracy_tpu.render.renderer import Renderer, init_state
    from tracy_tpu.scene.scn_parser import load_scene

    b = load_scene("/root/reference/data/scenes/cornell.scn",
                   data_root="/root/reference")
    h = w = 64
    b.width, b.height = w, h
    scene = b.build()
    cfg = RenderConfig(width=w, height=h, spp=1, accel="packet")
    bvh, _ = build_packet_bvh(scene, leaf_size=cfg.packet_leaf_size)

    rng = RngSpec(cfg.rng, cfg.seed)
    rows = jnp.arange(h, dtype=jnp.int32)
    pix = (rows[:, None] * w + jnp.arange(w, dtype=jnp.int32)[None, :]).astype(jnp.uint32)
    ju = rng.uniform(pix, jnp.uint32(0), JITTER_BOUNCE, 0)
    jv = rng.uniform(pix, jnp.uint32(0), JITTER_BOUNCE, 1)
    ss, tt = pixel_samples_rows(w, h, rows, ju, jv)
    o, d = scene.camera.generate_rays(ss, tt)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    act = jnp.ones((h * w,), bool)

    xla_isect = make_packet_intersector(scene, bvh, with_tangent=False)
    hit_x, at_x = jax.jit(xla_isect)(o, d, act)
    tables = build_tables(scene, bvh, with_tangent=False)
    interp = os.environ.get("TRACY_GATE_INTERPRET", "0") == "1"  # CPU dry-run
    rbm = os.environ.get("TRACY_GATE_RBM", "minloop")  # gate other rb modes
    t0 = time.perf_counter()
    hit_p, at_p = jax.jit(
        lambda oo, dd, aa: pallas_intersect(oo, dd, aa, tables,
                                            interpret=interp, rb_mode=rbm)
    )(o, d, act)
    hit_p.t.block_until_ready()
    print(f"[gate] pallas intersect compiled+ran ({time.perf_counter()-t0:.1f}s)",
          flush=True)

    tx, tp = np.asarray(hit_x.t), np.asarray(hit_p.t)
    mx, mp = np.asarray(hit_x.mask), np.asarray(hit_p.mask)
    same_mask = (mx == mp).mean()
    dt = np.abs(np.where(mx & mp, tx - tp, 0.0)).max()
    dn = np.abs(
        np.where((mx & mp)[:, None], np.asarray(at_x.normal) - np.asarray(at_p.normal), 0.0)
    ).max()
    dm = (np.where(mx & mp, np.asarray(at_x.material) != np.asarray(at_p.material), False)).mean()
    print(f"[gate] mask agree={same_mask:.4f} |dt|max={dt:.2e} "
          f"|dnormal|max={dn:.2e} mat mismatch={dm:.4f}", flush=True)
    ok = same_mask > 0.999 and dt < 1e-3 and dn < 2e-2 and dm < 1e-3
    if not ok:
        print("[gate] FAIL: pallas vs xla mismatch", flush=True)
        return 1

    # Candidate-default kernel variants (session S benches these at 1080p):
    # compile each on the same tiny wave first so a Mosaic compile failure
    # costs the gate ~a minute, not a 50-min bench slot. bf16-packed woop
    # is statistical (~0.2% t quantization), so the agreement bar is lower.
    if os.environ.get("TRACY_GATE_EXTRA", "1") == "1":
        for (label, pack, rbmode, width, pipe, prays, sbat, rskip,
             duv, mtp, mtx, *_xrest) in [
            ("woopbf16-fused", True, "fused", 2, False, 1024, False, 0, 0, 0, ""),
            ("woopbf16-vlist", True, "vlist", 2, False, 1024, False, 0, 0, 0, ""),
            ("4wide-fused", False, "fused", 4, False, 1024, False, 0, 0, 0, ""),
            # The leaf pipeline's double-buffered DMA is the one variant
            # interpret mode can't validate for races — check its RESULTS
            # on a real wave, not just that it compiles.
            ("pipeline-fused", False, "fused", 2, True, 1024, False, 0, 0, 0, ""),
            # Wide packets (16/32 sublanes): verify Mosaic accepts the
            # non-8 sublane planes AND the results match on a real wave.
            ("prays2048-fused", False, "fused", 4, False, 2048, False, 0, 0, 0, ""),
            ("prays4096-fused", False, "fused", 4, False, 4096, False, 0, 0, 0, ""),
            ("prays4096-vlist", False, "vlist", 4, False, 4096, False, 0, 0, 0, ""),
            # Batched slab reductions (one drain per inner visit).
            ("slabbatch-vlist4", False, "vlist", 4, False, 1024, True, 0, 0, 0, ""),
            ("slabbatch-fused4", False, "fused", 4, False, 1024, True, 0, 0, 0, ""),
            # Row-skip leaf MT + deferred u/v (round-4 levers; both exact).
            ("rowskip-vlist4", False, "vlist", 4, False, 1024, True, 1, 0, 0, ""),
            ("rowskip-fused4", False, "fused", 4, False, 1024, True, 1, 0, 0, ""),
            ("rowskip-duv-vlist4", False, "vlist", 4, False, 1024, True,
             1, 1, 0, ""),
            # Point-form MT: statistical agreement bar (ulp changes can
            # flip knife-edge winners).
            ("mtpoint-rowskip-vlist4", False, "vlist", 4, False, 1024,
             True, 1, 1, 1, ""),
            # 8-wide traversal (half the pops of 4-wide).
            ("rowskip-duv-vlist8", False, "vlist", 8, False, 1024, True,
             1, 1, 0, ""),
            # 8192-ray packets (sub=64: two-word row masks).
            ("prays8192-rowskip", False, "vlist", 4, False, 8192, True,
             1, 1, 0, ""),
            # MXU MT transform (one [384,4]@[4,256] dot per ray row):
            # statistical bar — bf16-pass association differs from the
            # VPU chain. Mosaic REJECTS precision=HIGH/bf16x3 (session
            # M2), so only the 1-pass 'default' is exercised; the knob
            # itself is rejected-for-perf (8.60 vs 9.27) and kept as a
            # measured negative.
            ("mtmxu-default-rowskip", False, "vlist", 4, False, 4096,
             True, 1, 1, 1, "default"),
            # Dead-step block skip (prefetched step map routes dead grid
            # steps' blocks to the previous live step's): EXACT — the
            # XLA side substitutes the same miss constants the in-kernel
            # fast path writes. The gate wave has dead lanes via act.
            ("blockskip-rowskip", False, "vlist", 4, False, 1024, True,
             1, 1, 0, "", {"block_skip": True}),
            ("blockskip-prays4096", False, "vlist", 4, False, 4096, True,
             1, 1, 0, "", {"block_skip": True}),
            # Two-pop inner batching: mask/t are EXACT (pruning is
            # conservative, best_t a pure min) — strict bar; the prod
            # variant includes mt_point so it gets the statistical bar.
            ("twopop-rowskip", False, "vlist", 4, False, 1024, True,
             1, 1, 0, "", {"two_pop": True}),
            ("twopop-prod4096", False, "vlist", 4, False, 4096, True,
             1, 1, 1, "", {"two_pop": True}),
        ]:
            t0 = time.perf_counter()
            try:
                xkw = _xrest[0] if _xrest else {}
                tb = build_tables(scene, bvh, with_tangent=False,
                                  pack_woop=pack, width=width)
                hv, _av = jax.jit(
                    lambda oo, dd, aa, _tb=tb, _rb=rbmode, _pi=pipe,
                    _pr=prays, _sb=sbat, _rs=rskip, _du=duv, _mp=mtp,
                    _mx=mtx, _xk=xkw:
                    pallas_intersect(
                        oo, dd, aa, _tb, interpret=interp, rb_mode=_rb,
                        leaf_pipeline=_pi, packet_rays=_pr, slab_batch=_sb,
                        row_skip=bool(_rs), defer_uv=bool(_du),
                        mt_point=bool(_mp), mt_mxu=_mx, **_xk)
                )(o, d, act)
                hv.t.block_until_ready()
                mv = np.asarray(hv.mask)
                tv = np.asarray(hv.t)
                agree = (mx == mv).mean()
                both = mx & mv
                # bf16-packed woop moves t by ~0.2%; a few silhouette rays
                # may legitimately win a different surface — judge by the
                # fraction of closely-matching hits, not the max.
                close = np.where(
                    both, np.abs(tx - tv) <= 1e-2 * np.abs(tx) + 1e-3, True
                ).mean()
                bar = (0.98, 0.99) if (pack or mtp or mtx) else (0.999, 0.9999)
                verdict = ("ok" if agree > bar[0] and close > bar[1]
                           else "MISMATCH")
                print(f"[gate] variant {label}: agree={agree:.4f} "
                      f"close={close:.4f} {verdict} "
                      f"({time.perf_counter()-t0:.1f}s)", flush=True)
            except Exception as e:
                print(f"[gate] variant {label} FAILED to compile/run: "
                      f"{type(e).__name__}: {e} "
                      f"({time.perf_counter()-t0:.1f}s) — skip its benches",
                      flush=True)

    r = Renderer(cfg)
    st = init_state(cfg)
    t0 = time.perf_counter()
    try:
        st, rays = r.step_many(scene, st, 4)
    except Exception as e:
        # Don't fail the whole session if only the (new) shade stage broke:
        # report loudly and gate the intersect path alone.
        print(f"[gate] WARNING: render with shade stage failed "
              f"({type(e).__name__}: {e}); retrying without it", flush=True)
        cfg = cfg.replace(use_pallas_shade=False)
        r = Renderer(cfg)
        st = init_state(cfg)
        st, rays = r.step_many(scene, st, 4)
    el = time.perf_counter() - t0
    acc_default = np.asarray(st.accum)
    fin = bool(np.isfinite(acc_default).all())
    print(f"[gate] 4-frame render: rays={int(rays)} {el:.1f}s finite={fin} "
          f"({float(rays)/1e6/el:.2f} MRays/s incl compile)", flush=True)
    if not fin:
        print("[gate] FAIL: non-finite accum", flush=True)
        return 1

    # On-chip cross-validation of the full shading stack: the shade stage
    # and the fused bounce megakernel are bit-identical to the XLA shading
    # math BY DESIGN (interpret-asserted); prove it on real Mosaic before
    # any bench trusts their numbers. Each render reuses the gate scene.
    extra_fail = []
    if os.environ.get("TRACY_GATE_EXTRA", "1") == "1":
        def render_with(tag, tol=1e-5, note="", **kw):
            # tol is a per-comparison CONTRACT: exceeding it FAILS the gate.
            # Strict (1e-5) where paths are bit-identical even on Mosaic;
            # loose where on-chip fma-contraction flips a few Russian-
            # roulette branches (same algorithm, different fused rounding
            # — the interpret-mode tests assert bit-identity of the math).
            t0 = time.perf_counter()
            try:
                c = cfg.replace(**kw)
                rr_ = Renderer(c)
                s_ = init_state(c)
                s_, _ = rr_.step_many(scene, s_, 4)
                a = np.asarray(s_.accum)
                d = np.abs(a - acc_default).max()
                verdict = ("ok" if d < tol
                           else f"MISMATCH |d|max={d:.2e} > tol={tol:.0e}")
                if d >= tol:
                    extra_fail.append(tag)
                print(f"[gate] render {tag}: {verdict}"
                      f"{' [' + note + ']' if note and d < tol else ''} "
                      f"({time.perf_counter()-t0:.1f}s)", flush=True)
            except Exception as e:
                print(f"[gate] render {tag} FAILED: {type(e).__name__}: {e} "
                      f"({time.perf_counter()-t0:.1f}s) — skip its benches",
                      flush=True)
                extra_fail.append(tag)

        if cfg.use_pallas_shade:
            # Measured stable at |d|max=7.24e-03 across every round-4
            # session (logs/r4_session_*.log): a handful of RR branch
            # flips from Mosaic-vs-XLA rounding. 2e-2 gives ~3x headroom;
            # a real shading regression lands orders of magnitude above.
            render_with("shade-off-vs-on", tol=2e-2,
                        note="statistical: on-chip RR flips, known 7.2e-3",
                        use_pallas_shade=False)
        render_with("bounce-megakernel", use_pallas_bounce=True)

    if extra_fail:
        print(f"[gate] FAIL: extra-render comparisons out of tolerance: "
              f"{extra_fail}", flush=True)
        return 1
    print("[gate] PASS", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
