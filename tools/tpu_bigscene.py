#!/usr/bin/env python3
"""Large-scene Pallas-path proof on the chip (VERDICT r3 #3).

Builds a deterministic procedural scene well past the round-3 docstring's
claimed ceiling (~520K tris: an 8x8 grid of 64-step UV spheres), renders
it through the FULL production config, and

  1. asserts the renderer chose the Pallas kernel (not the XLA fallback),
  2. checks the image against the XLA packet path at 320x240 (gate-style
     mask agreement + t deltas via a 1-frame AOV-free render),
  3. benches MRays/s at BIG_W x BIG_H (default 1280x720, 4 frames).

Optionally (BIG_STRESS=1) repeats with pallas_leaf_size=8 — ~65K leaves,
~130K binary nodes, ~6 MB of node tables — to exercise a near-budget
VMEM-resident tree on real hardware.

Env: BIG_W/BIG_H/BIG_FRAMES, BIG_SPHERES (64), BIG_STEPS (64), BIG_STRESS.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_big(nsph: int, steps: int, w: int, h: int):
    import numpy as np

    from tracy_tpu.scene.scn_parser import default_scene

    b = default_scene(w, h)
    g = int(np.ceil(np.sqrt(nsph)))
    for i in range(nsph):
        b.add_sphere((i % g * 2.5 - g, 0.5, i // g * 2.5 - g), 1.0,
                     1 + (i % 3), steps=steps)
    return b.build()


def main() -> int:
    # Scoped-VMEM limit probe (round-4 decode of the compile 500s: they
    # are scoped-vmem OOMs — default limit 16 MiB, a DebugOptions flag the
    # remote compile service forwards per-compile). Must land in XLA_FLAGS
    # before jax initializes.
    kib = os.environ.get("BIG_SCOPED_KIB", "")
    if kib:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + f" --xla_tpu_scoped_vmem_limit_kib={kib}")

    import jax
    import numpy as np

    cache_dir = os.environ.get("TRACY_COMPILE_CACHE", "/tmp/tracy_jit_cache")
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from tracy_tpu.config import RenderConfig
    from tracy_tpu.ops.pallas_packet import PallasSceneTables
    from tracy_tpu.render.renderer import Renderer, init_state
    from tracy_tpu.accel.reorder import pick_compact_group

    w = int(os.environ.get("BIG_W", 1280))
    h = int(os.environ.get("BIG_H", 720))
    frames = int(os.environ.get("BIG_FRAMES", 4))
    nsph = int(os.environ.get("BIG_SPHERES", 64))
    steps = int(os.environ.get("BIG_STEPS", 64))
    print(f"[big] device: {jax.devices()[0]}", flush=True)

    scene = build_big(nsph, steps, w, h)
    ntris = int(np.asarray(scene.indices).shape[0])
    print(f"[big] scene: {ntris} tris", flush=True)

    # BIG_LEAVES: comma list of pallas_leaf_size values to exercise
    # (smaller leaves = more nodes = bigger VMEM-resident tables; used to
    # bracket the real on-chip node-table ceiling).
    leaves = [int(x) for x in os.environ.get("BIG_LEAVES", "128,8").split(",")]
    configs = [(f"leaf{lv}", lv) for lv in leaves]

    rc = 0
    for tag, leaf in configs:
        grp = int(os.environ.get("BIG_COMPACT",
                                 pick_compact_group(w * h, num_tris=ntris,
                                                    has_translucent=False)))
        cfg = RenderConfig(
            width=w, height=h, spp=1, accel="packet",
            wave_compact_group=grp, pallas_leaf_size=leaf,
            pallas_vmem_budget=int(os.environ.get(
                "BIG_VMEM", 8 * 1024 * 1024)))
        r = Renderer(cfg)
        r._ensure_accel(scene)
        on_pallas = isinstance(r._accel_data, PallasSceneTables)
        vm = (r._accel_data.vmem_bytes / 1e6) if on_pallas else 0.0
        print(f"[big] {tag}: pallas_path={on_pallas} "
              f"node_vmem={vm:.2f}MB", flush=True)
        if not on_pallas:
            print(f"[big] {tag}: FAIL — fell back to the XLA path",
                  flush=True)
            rc = 1
            continue

        # Parity vs the XLA packet path at 320x240, 2 frames.
        small = RenderConfig(width=320, height=240, spp=1, accel="packet",
                             wave_compact_group=0, pallas_leaf_size=leaf,
                             pallas_vmem_budget=cfg.pallas_vmem_budget)
        sscene = build_big(nsph, steps, 320, 240)
        imgs = {}
        for label, up in (("pallas", True), ("xla", False)):
            c = small.replace(use_pallas=up)
            rr = Renderer(c)
            st = init_state(c)
            st = rr.render_progressive(sscene, 2, state=st,
                                       steps_per_dispatch=2)
            imgs[label] = np.asarray(st.accum)
        d = np.abs(imgs["pallas"] - imgs["xla"])
        ok = np.isfinite(imgs["pallas"]).all() and float(d.mean()) < 5e-3
        print(f"[big] {tag}: parity vs XLA packet: mean|d|={d.mean():.2e} "
              f"max|d|={d.max():.2e} {'OK' if ok else 'FAIL'}", flush=True)
        if not ok:
            rc = 1

        st = init_state(cfg)
        t0 = time.perf_counter()
        st = r.render_progressive(scene, frames, state=st,
                                  steps_per_dispatch=frames)
        jax.block_until_ready(st.accum)
        compile_s = time.perf_counter() - t0
        r.timer.reset()
        r.total_rays = 0.0
        st = r.render_progressive(scene, frames, state=st,
                                  steps_per_dispatch=frames)
        jax.block_until_ready(st.accum)
        print(f"[big] {tag}: {w}x{h} {frames} frames -> "
              f"{r.mrays_per_sec:.2f} MRays/s (compile {compile_s:.0f}s), "
              f"finite={bool(np.isfinite(np.asarray(st.accum)).all())}",
              flush=True)
    print(f"[big] {'PASS' if rc == 0 else 'FAIL'}", flush=True)
    return rc


if __name__ == "__main__":
    sys.exit(main())
