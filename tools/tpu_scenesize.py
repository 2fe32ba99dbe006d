#!/usr/bin/env python3
"""Scene-size perf curve at the DEFAULT config (VERDICT r4 #5).

Round 4 left anchors at 520K tris (3.72 MRays/s, leaf32 experiment) and
2.07M tris (7.10, default config) with nothing measured between — and the
520K number came from a leaf-size experiment, not the production config.
This sweeps the SAME procedural scene family (tpu_bigscene's sphere grid,
steps=64 => 8,128 tris/sphere) at ~100K/250K/520K/1M/2M tris, 1080p,
default knobs (auto compaction via pick_compact_group), 3 timed reps per
size, so the curve is comparable point to point.

Env: SS_W/SS_H (1920x1080), SS_FRAMES (4), SS_SIZES (sphere counts),
SS_REPS (3).

Run inside a gated TPU session (tools/tpu_session.sh).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import numpy as np

    cache_dir = os.environ.get("TRACY_COMPILE_CACHE", "/tmp/tracy_jit_cache")
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from tracy_tpu.accel.reorder import pick_compact_group
    from tracy_tpu.config import RenderConfig
    from tracy_tpu.ops.pallas_packet import PallasSceneTables
    from tracy_tpu.render.renderer import Renderer, init_state
    from tools.tpu_bigscene import build_big

    w = int(os.environ.get("SS_W", 1920))
    h = int(os.environ.get("SS_H", 1080))
    frames = int(os.environ.get("SS_FRAMES", 4))
    reps = int(os.environ.get("SS_REPS", 3))
    sizes = [int(x) for x in os.environ.get(
        "SS_SIZES", "13,31,64,128,256").split(",")]
    print(f"[ss] device: {jax.devices()[0]}", flush=True)

    rows = []
    for nsph in sizes:
        scene = build_big(nsph, 64, w, h)
        ntris = int(np.asarray(scene.indices).shape[0])
        grp = pick_compact_group(w * h, num_tris=ntris,
                                 has_translucent=False)
        cfg = RenderConfig(width=w, height=h, spp=1, accel="packet",
                           wave_compact_group=grp,
                           pallas_vmem_budget=8 * 1024 * 1024)
        r = Renderer(cfg)
        r._ensure_accel(scene)
        on_pallas = isinstance(r._accel_data, PallasSceneTables)
        vm = (r._accel_data.vmem_bytes / 1e6) if on_pallas else 0.0
        print(f"[ss] {nsph} spheres = {ntris} tris: pallas={on_pallas} "
              f"node_vmem={vm:.2f}MB compact={grp}", flush=True)
        if not on_pallas:
            rows.append((ntris, grp, float("nan"), "XLA-FALLBACK"))
            continue
        st = init_state(cfg)
        t0 = time.perf_counter()
        st = r.render_progressive(scene, frames, state=st,
                                  steps_per_dispatch=frames)
        jax.block_until_ready(st.accum)
        compile_s = time.perf_counter() - t0
        vals = []
        for _ in range(reps):
            r.timer.reset()
            r.total_rays = 0.0
            st = r.render_progressive(scene, frames, state=st,
                                      steps_per_dispatch=frames)
            jax.block_until_ready(st.accum)
            vals.append(r.mrays_per_sec)
        med = float(np.median(vals))
        fin = bool(np.isfinite(np.asarray(st.accum)).all())
        print(f"[ss] {ntris} tris: {med:.2f} MRays/s "
              f"(reps {['%.2f' % v for v in vals]}, compile {compile_s:.0f}s,"
              f" finite={fin})", flush=True)
        rows.append((ntris, grp, med, "ok" if fin else "NONFINITE"))

    print("\n[ss] tris | compact | MRays/s | note")
    for ntris, grp, med, note in rows:
        print(f"[ss] {ntris:8d} | {grp:7d} | {med:7.2f} | {note}",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
