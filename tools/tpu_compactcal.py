#!/usr/bin/env python3
"""Calibrate pick_compact_group (VERDICT r4 #6).

The scene-adaptive compaction heuristic (accel/reorder.py) rests on two
calibration points (spheres 49.6K ON, random 14K translucent ON) plus the
helmet/dragon regime anchors. This sweeps ONE consistent scene family —
the sphere grid (8,128 tris/sphere at steps=64, 1,512 at steps=28) — from
~16K to ~520K tris, opaque AND mixed-translucency variants, measuring
compact=262144 vs compact=0 at 1080p (3 reps each), to back the 32,768-tri
threshold (or its replacement) with a table.

Env: CC_W/CC_H (1920x1080), CC_FRAMES (4), CC_REPS (3), CC_CASES.

Run inside a gated TPU session.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_grid(nsph: int, steps: int, w: int, h: int,
               translucent_every: int = 0):
    """Sphere grid like tpu_bigscene.build_big, optionally making every
    k-th sphere translucent (glass-ish: rays refract through and survive
    RR — the regime that broke the tri-count-only heuristic on random.scn)."""
    from tracy_tpu.scene.scn_parser import default_scene

    import numpy as np

    b = default_scene(w, h)
    # add the glass material ONLY when used: has_translucent checks the
    # material table, and an unused translucent slot would mislabel the
    # opaque cases (and pin the auto heuristic's translucent branch).
    glass = (b.add_material((0.95, 0.95, 0.95), roughness=0.05,
                            metalness=0.0, ior=1.5, translucency=1.0)
             if translucent_every else None)
    g = int(np.ceil(np.sqrt(nsph)))
    for i in range(nsph):
        mat = (glass if translucent_every and i % translucent_every == 0
               else 1 + (i % 3))
        b.add_sphere((i % g * 2.5 - g, 0.5, i // g * 2.5 - g), 1.0, mat,
                     steps=steps)
    return b.build(), b.has_translucent


def main() -> int:
    import jax
    import numpy as np

    cache_dir = os.environ.get("TRACY_COMPILE_CACHE", "/tmp/tracy_jit_cache")
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from tracy_tpu.accel.reorder import pick_compact_group
    from tracy_tpu.config import RenderConfig
    from tracy_tpu.render.renderer import Renderer, init_state

    w = int(os.environ.get("CC_W", 1920))
    h = int(os.environ.get("CC_H", 1080))
    frames = int(os.environ.get("CC_FRAMES", 4))
    reps = int(os.environ.get("CC_REPS", 3))
    # (spheres, steps, translucent_every): tris = nsph * (steps=64: 8128 |
    # steps=28: 1512 | steps=20: 760)
    default_cases = "2x64x0,4x64x0,8x64x0,16x64x0,32x64x0,64x64x0," \
                    "8x64x4,32x64x4"
    cases = [tuple(int(v) for v in c.split("x"))
             for c in os.environ.get("CC_CASES", default_cases).split(",")]
    print(f"[cc] device: {jax.devices()[0]}", flush=True)

    rows = []
    for nsph, steps, tev in cases:
        scene, transl = build_grid(nsph, steps, w, h, translucent_every=tev)
        ntris = int(np.asarray(scene.indices).shape[0])
        auto = pick_compact_group(w * h, num_tris=ntris,
                                  has_translucent=transl)
        meds = {}
        for grp in (262144, 0):
            cfg = RenderConfig(width=w, height=h, spp=1, accel="packet",
                               wave_compact_group=grp,
                               pallas_vmem_budget=8 * 1024 * 1024)
            r = Renderer(cfg)
            st = init_state(cfg)
            t0 = time.perf_counter()
            st = r.render_progressive(scene, frames, state=st,
                                      steps_per_dispatch=frames)
            jax.block_until_ready(st.accum)
            csec = time.perf_counter() - t0
            vals = []
            for _ in range(reps):
                r.timer.reset()
                r.total_rays = 0.0
                st = r.render_progressive(scene, frames, state=st,
                                          steps_per_dispatch=frames)
                jax.block_until_ready(st.accum)
                vals.append(r.mrays_per_sec)
            meds[grp] = float(np.median(vals))
            print(f"[cc] {ntris} tris transl={int(transl)} compact={grp}: "
                  f"{meds[grp]:.2f} MRays/s (compile {csec:.0f}s)",
                  flush=True)
        on, off = meds[262144], meds[0]
        want = 262144 if on >= off else 0
        verdict = "AUTO-CORRECT" if (auto > 0) == (want > 0) else "AUTO-WRONG"
        print(f"[cc] {ntris} tris transl={int(transl)}: ON {on:.2f} vs "
              f"OFF {off:.2f} -> want {want}, auto {auto} [{verdict}]",
              flush=True)
        rows.append((ntris, int(transl), on, off, auto, verdict))

    print("\n[cc] tris | transl | ON | OFF | auto | verdict")
    for ntris, tr, on, off, auto, v in rows:
        print(f"[cc] {ntris:8d} | {tr} | {on:7.2f} | {off:7.2f} | "
              f"{auto:6d} | {v}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
