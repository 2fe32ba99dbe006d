#!/usr/bin/env python3
"""Production-path parity ON THE CHIP (VERDICT r2 #5).

tests/test_ref_parity.py proves physics parity on the CPU 'bvh' tier;
tools/tpu_gate.py proves Pallas==XLA on one small wave. Neither has ever
rendered a full image through the FULL production config (packet accel +
Pallas kernel + fused readback + wave compaction + tile padding [+ shade
stage]) on real hardware and compared it to the reference's own pixels.
This script does exactly that: golden-resolution renders of the scenes
below on the TPU, judged with the same linear-space statistical bounds as
the CPU parity suite. A pass makes the headline bench number provably
*correct* throughput, not just fast.

Run inside a TPU session (after tools/tpu_gate.py):
    python -u tools/tpu_parity.py            # all scenes
    PARITY_SCENES=dragon,helmet python -u tools/tpu_parity.py
Knobs: PARITY_SHADE=1 adds the on-core shade stage (only after the gate
has proven it compiles); PARITY_FRAMES overrides the per-scene frame count.

Exit code 0 = every scene within bounds.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

# Reuse the CPU parity suite's golden loading + metrics so the bounds are
# literally the same code path.
_spec = importlib.util.spec_from_file_location(
    "ref_parity", os.path.join(REPO, "tests", "test_ref_parity.py"))
ref_parity = importlib.util.module_from_spec(_spec)

# (name, frames, mean_tol, p95_tol, max_tol) — frames / tolerances match
# tests/test_ref_parity.py (the reference's whole test strategy is its
# scene fixtures, SURVEY §4 — production-kernel parity covers ALL 9).
SCENES = [
    ("cornell", 16, 0.01, 0.07, 0.2),
    ("furnace", 24, 0.01, 0.02, 0.05),
    ("testtree", 16, 0.01, 0.03, 0.12),
    ("spheres", 6, 0.03, 0.06, 0.5),
    ("trimesh", 24, 0.02, 0.06, 0.3),
    ("bunny", 24, 0.02, 0.06, 0.3),
    ("random", 24, 0.02, 0.06, 0.3),
    ("dragon", 24, 0.02, 0.06, 0.3),
    ("helmet", 24, 0.025, 0.08, 0.5),
]


def main() -> int:
    import jax

    if os.environ.get("PARITY_CPU", "0") == "1":
        # Dry-run mode. config.update, NOT the JAX_PLATFORMS env var: with
        # the axon plugin registered and its tunnel down, env-var selection
        # still initializes the axon backend and hangs device enumeration.
        jax.config.update("jax_platforms", "cpu")

    cache_dir = os.environ.get("TRACY_COMPILE_CACHE", "/tmp/tracy_jit_cache")
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import numpy as np

    _spec.loader.exec_module(ref_parity)

    from tracy_tpu.config import RenderConfig
    from tracy_tpu.render import film
    from tracy_tpu.render.renderer import Renderer, init_state
    from tracy_tpu.scene.scn_parser import load_scene

    print(f"[parity] device: {jax.devices()[0]}", flush=True)
    use_shade = os.environ.get("PARITY_SHADE", "1") == "1"
    names = os.environ.get("PARITY_SCENES", "")
    scenes = SCENES if not names else [
        s for s in SCENES if s[0] in names.split(",")]

    failures = []
    for name, frames, mean_tol, p95_tol, max_tol in scenes:
        frames = int(os.environ.get("PARITY_FRAMES", frames))
        t0 = time.perf_counter()
        b = load_scene(os.path.join(REPO, "tests", "goldens", "scn",
                                    f"{name}.scn"),
                       data_root="/root/reference")
        scene = b.build()
        # THE production config (bench.py defaults), clamped to wave size.
        # PARITY_RBM / PARITY_WOOPBF16 / PARITY_BVHW validate a candidate
        # default (e.g. the session-S winner) against the reference pixels.
        from tracy_tpu.accel.reorder import pick_compact_group

        cfg = RenderConfig(
            width=b.width, height=b.height, spp=1, accel="packet",
            pallas_rb_mode=os.environ.get("PARITY_RBM", "vlist"),
            wave_compact_group=pick_compact_group(
                b.width * b.height, num_tris=b.num_triangles,
                has_translucent=b.has_translucent),
            use_pallas_shade=use_shade,
            pallas_woop_bf16=os.environ.get("PARITY_WOOPBF16", "0") == "1",
            pallas_bvh_width=int(os.environ.get("PARITY_BVHW", "4")),
            pallas_mt_point=os.environ.get("PARITY_MTPOINT", "1") == "1",
            pallas_texfetch_batch=int(os.environ.get("PARITY_TEXBATCH",
                                                     "16")),
        )
        r = Renderer(cfg)
        st = init_state(cfg)
        st = r.render_progressive(scene, frames, state=st,
                                  steps_per_dispatch=frames)
        img = np.clip(np.asarray(film.tonemap(st.accum, cfg)) * 255.99,
                      0.0, 255.0)
        ours = ref_parity.srgb_to_linear(img / 255.99)[::-1]
        ref = ref_parity.load_golden(name)
        assert ref.shape == ours.shape, (ref.shape, ours.shape)
        d = np.abs(ref_parity.block_means(ref) - ref_parity.block_means(ours))
        dmean = abs(float(ref.mean()) - float(ours.mean()))
        p95 = float(np.percentile(d, 95))
        dmax = float(d.max())
        ok = dmean <= mean_tol and p95 <= p95_tol and dmax <= max_tol
        print(f"[parity] {name}: mean {dmean:.4f}/{mean_tol} "
              f"p95 {p95:.4f}/{p95_tol} max {dmax:.4f}/{max_tol} "
              f"{'OK' if ok else 'FAIL'} ({time.perf_counter()-t0:.1f}s, "
              f"{frames} frames, shade={int(use_shade)})", flush=True)
        if not ok:
            failures.append(name)

    if failures:
        print(f"[parity] FAILED: {failures}", flush=True)
        return 1
    print("[parity] all scenes within bounds on the production path",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
