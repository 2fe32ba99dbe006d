#!/usr/bin/env python3
"""Round-2 probe: dead-packet cost + per-wave compaction frame sweep.

  E. all-dead wave cost (the floor a compacted wave's dead packets pay);
  F. full dragon 640x480 frames with wave_compact_group in COMPACT_LIST
     (0 = off) — the compaction A/B that decides the bench default.

Run AFTER tools/tpu_gate.py (tpu_session.sh does this automatically).
Env: PROBE_COMPACT="0,2048,4096,8192", PROBE_LEAF, PROBE_SKIP_E=1.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COMPACT_LIST = tuple(
    int(x) for x in os.environ.get("PROBE_COMPACT", "0,2048,4096,8192").split(",")
)
LEAF = int(os.environ.get("PROBE_LEAF", 128))
SKIP_E = os.environ.get("PROBE_SKIP_E", "0") == "1"


def main() -> int:
    import jax
    import jax.numpy as jnp

    from tracy_tpu.accel.packet import build_packet_bvh
    from tracy_tpu.config import RenderConfig
    from tracy_tpu.ops.pallas_packet import build_tables, pallas_intersect
    from tracy_tpu.render.renderer import Renderer, init_state
    from tracy_tpu.scene.scn_parser import load_scene

    print(f"[probe] device: {jax.devices()[0]}", flush=True)
    w, h = 640, 480
    b = load_scene("/root/reference/data/scenes/dragon.scn",
                   data_root="/root/reference")
    b.width, b.height = w, h
    scene = b.build()

    if not SKIP_E:
        print("[probe] === E: all-dead wave (dead-packet floor) ===", flush=True)
        bvh, _ = build_packet_bvh(scene, leaf_size=LEAF)
        tables = build_tables(scene, bvh, with_tangent=False)
        n = h * w
        o = jnp.zeros((n, 3), jnp.float32)
        d = jnp.ones((n, 3), jnp.float32)
        act = jnp.zeros((n,), bool)
        reps = 8

        def prog(o, d, act):
            def body(i, carry):
                oo = o.at[0, 0].add(jnp.float32(i) * 1e-6)
                hit, _ = pallas_intersect(oo, d, act, tables,
                                          packets_per_step=2)
                return carry + jnp.sum(jnp.where(hit.mask, 1.0, 0.0))
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

        f = jax.jit(prog)
        t0 = time.perf_counter()
        f(o, d, act).block_until_ready()
        print(f"[probe] dead-wave compile {time.perf_counter()-t0:.0f}s", flush=True)
        t0 = time.perf_counter()
        f(o, d, act).block_until_ready()
        el = (time.perf_counter() - t0) / reps
        print(f"[probe] dead wave: {el*1e3:8.2f} ms/wave  "
              f"{el/(n//1024)*1e6:7.1f} us/packet", flush=True)

    print("[probe] === F: frame sweep, wave_compact_group ===", flush=True)
    for grp in COMPACT_LIST:
        cfg = RenderConfig(width=w, height=h, spp=1, accel="packet",
                           pallas_leaf_size=LEAF, wave_compact_group=grp,
                           pallas_packets_per_step=2,
                           pallas_rb_window=int(os.environ.get("PROBE_RBW", 1)),
                           pallas_rb_gather=os.environ.get("PROBE_RBG", "take"),
                           pallas_rb_prefetch=os.environ.get("PROBE_RBP", "0") == "1")
        r = Renderer(cfg)
        st = init_state(cfg)
        t0 = time.perf_counter()
        st, rays = r.step_many(scene, st, 4)
        warm = time.perf_counter() - t0
        r.timer.reset(); r.total_rays = 0.0
        st, rays = r.step_many(scene, st, 4)
        print(f"[probe] compact={grp:5d}: {r.timer.total/4*1e3:6.0f} ms/frame "
              f"{r.mrays_per_sec:5.2f} MRays/s (warm {warm:.0f}s)", flush=True)

    print("[probe] DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
