#!/usr/bin/env python3
"""Op-level frame decomposition via an xprof trace (if the axon plugin
supports device tracing; fails gracefully otherwise).

Renders TRACE_FRAMES production frames under jax.profiler and prints the
top device ops by total self-duration — the honest way to split a frame
into intersect kernel / texfetch / shade / XLA structure shares (frame-
level ablations change ray populations; isolated-jit probes un-fuse the
graph — NOTES.md round-4 lessons).

Env: TRACE_SCENE (helmet), TRACE_W/H (1920x1088), TRACE_FRAMES (2),
TRACE_DIR (/tmp/tracy_xprof).
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def summarize(log_dir: str) -> bool:
    paths = glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print(f"[trace] no .trace.json.gz under {log_dir} — device "
              "tracing unsupported here", flush=True)
        return False
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # Device tracks: pick pids whose process name mentions TPU/device.
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_name.items()
                if "TPU" in n or "/device" in n.lower() or "XLA" in n}
    agg = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            if dev_pids and e.get("pid") not in dev_pids:
                continue
            name = e.get("name", "?")
            agg[name] += e["dur"]
            total += e["dur"]
    if not agg:
        print("[trace] trace parsed but no duration events", flush=True)
        return False
    print(f"[trace] {path}: {len(agg)} distinct ops, "
          f"{total/1e3:.1f} ms total (procs: "
          f"{[pid_name.get(p, p) for p in (dev_pids or set(pid_name))][:4]})",
          flush=True)
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
        print(f"[trace]   {dur/1e3:9.2f} ms  {dur/max(total,1e-9)*100:5.1f}%"
              f"  {name[:110]}", flush=True)
    return True


def main() -> int:
    import jax

    cache_dir = os.environ.get("TRACY_COMPILE_CACHE", "/tmp/tracy_jit_cache")
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from tracy_tpu.config import RenderConfig
    from tracy_tpu.render.renderer import Renderer, init_state
    from tracy_tpu.scene.scn_parser import load_scene
    from tracy_tpu.utils.profiling import trace

    name = os.environ.get("TRACE_SCENE", "helmet")
    w = int(os.environ.get("TRACE_W", 1920))
    h = int(os.environ.get("TRACE_H", 1088))
    frames = int(os.environ.get("TRACE_FRAMES", 2))
    log_dir = os.environ.get("TRACE_DIR", "/tmp/tracy_xprof")

    b = load_scene(f"/root/reference/data/scenes/{name}.scn",
                   data_root="/root/reference")
    b.width, b.height = w, h
    scene = b.build()
    from tracy_tpu.accel.reorder import pick_compact_group

    compact_env = os.environ.get("TRACE_COMPACT", "")
    compact = (int(compact_env) if compact_env else
               pick_compact_group(w * h, num_tris=b.num_triangles))
    bskip = os.environ.get("TRACE_BLOCKSKIP", "0") == "1"
    print(f"[trace] compact={compact} block_skip={bskip}", flush=True)
    cfg = RenderConfig(width=w, height=h, spp=1, accel="packet",
                       wave_compact_group=compact,
                       pallas_block_skip=bskip)
    r = Renderer(cfg)
    st = init_state(cfg)
    # Warm up/compile OUTSIDE the trace.
    st, _ = r.step_many(scene, st, frames)
    print(f"[trace] warm; tracing {frames} frames of {name} {w}x{h}",
          flush=True)
    try:
        with trace(log_dir):
            st, _ = r.step_many(scene, st, frames)
    except Exception as e:
        print(f"[trace] profiler failed: {type(e).__name__}: {e}",
              flush=True)
        return 1
    ok = summarize(log_dir)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
