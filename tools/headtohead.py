#!/usr/bin/env python3
"""Measured head-to-head: the reference's own CPU renderer vs tracy-tpu.

VERDICT r4 #3: "beating the reference" must be a measurement, not an
inference. This runs BOTH renderers on the golden scenes at each scene's
native .scn resolution with the SAME ray accounting (1 ray per live
bounce-loop iteration — the reference's GetRayCount, cpu_trace.cpp:113-116;
tracy-tpu's renderer counts identically, render/renderer.py) and records
MRays/s side by side.

Reference side (CPU, safe anywhere):
    python tools/headtohead.py --side ref
builds tools/refharness/refharness_perf with the reference's OWN Linux
release flags (-Ofast -march=native -flto + OpenMP, CMakeLists.txt:361-370)
and times its OnUpdate loop exactly as win_raytracer.cpp:511-515,563-569
does for its exit-time run average.

tracy-tpu side (needs the TPU; run inside a gated session):
    python tools/headtohead.py --side tpu
runs bench.py per scene (median-of-3 timed reps of the compiled step).

Results accumulate in logs/headtohead.json; --table prints the BASELINE.md
markdown table from whatever has been measured so far.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HARNESS_DIR = os.path.join(REPO, "tools", "refharness")
PERF_BIN = os.path.join(HARNESS_DIR, "refharness_perf")
# Sessions run from a git-archive snapshot (tools/tpu_session.sh); point
# TRACY_H2H_RESULTS at the real repo so results survive the snapshot.
RESULTS = os.environ.get(
    "TRACY_H2H_RESULTS", os.path.join(REPO, "logs", "headtohead.json"))
SCENES_DIR = "/root/reference/data/scenes"

# frames chosen so the reference side runs ~15-60s per scene (amortizes
# OpenMP spin-up; matches its own "run average" discipline).
SCENES = [
    ("cornell", 32), ("spheres", 16), ("furnace", 16), ("random", 16),
    ("trimesh", 16), ("testtree", 32), ("bunny", 16), ("dragon", 16),
    ("helmet", 16),
]


def scn_resolution(path: str) -> tuple[int, int]:
    with open(path) as f:
        for line in f:
            m = re.match(r"\s*OUT\s+(\d+)\s+(\d+)", line)
            if m:
                return int(m.group(1)), int(m.group(2))
    return 640, 480


def load_results() -> dict:
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            return json.load(f)
    return {}


def save_results(res: dict):
    os.makedirs(os.path.dirname(RESULTS), exist_ok=True)
    with open(RESULTS, "w") as f:
        json.dump(res, f, indent=1, sort_keys=True)


def run_ref(frames_scale: float) -> None:
    r = subprocess.run(["make", "-C", HARNESS_DIR, "refharness_perf"],
                       capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stderr[-2000:], file=sys.stderr)
        sys.exit(1)
    # Scene data paths in .scn files are cwd-relative; reuse the golden
    # harness's shadow cwd (data/ symlinks + synthesized sky.hdr — the
    # reference checkout itself is missing data/sky.hdr).
    sys.path.insert(0, HARNESS_DIR)
    import make_goldens

    make_goldens.write_sky_hdr(
        os.path.join(make_goldens.FIXTURES, "sky.hdr"))
    make_goldens.make_shadow_cwd()
    shadow = make_goldens.SHADOW
    res = load_results()
    for name, frames in SCENES:
        scn = os.path.join(SCENES_DIR, f"{name}.scn")
        frames = max(4, int(frames * frames_scale))
        w, h = scn_resolution(scn)
        print(f"[h2h] ref {name} {w}x{h} x{frames} frames ...", flush=True)
        t0 = time.time()
        # Best-of-3: CPU-contention dips only ever LOWER the reference's
        # number; taking the max is the fairest-to-the-reference reading.
        best = None
        reps = []
        for _ in range(3):
            p = subprocess.run(
                [PERF_BIN, scn, str(frames), "/tmp/h2h_ref.raw"],
                capture_output=True, text=True, timeout=3600, cwd=shadow,
            )
            m = re.search(r"perf: ([\d.]+) MRays/s \((\d+) rays, ([\d.]+)s",
                          p.stderr)
            if p.returncode != 0 or not m:
                print(f"[h2h] ref {name} FAILED rc={p.returncode}: "
                      f"{p.stderr[-500:]}", flush=True)
                break
            reps.append(float(m.group(1)))
            if best is None or reps[-1] >= best[0]:
                best = (reps[-1], int(m.group(2)), float(m.group(3)))
        if best is None:
            continue
        entry = res.setdefault(name, {})
        entry["resolution"] = f"{w}x{h}"
        entry["ref_cpu_mrays"] = best[0]
        entry["ref_reps"] = reps
        entry["ref_frames"] = frames
        entry["ref_rays"] = best[1]
        entry["ref_secs"] = best[2]
        save_results(res)
        print(f"[h2h] ref {name}: best {best[0]:.3f} of {reps} MRays/s "
              f"({time.time() - t0:.0f}s wall)", flush=True)


def run_tpu() -> None:
    res = load_results()
    for name, _ in SCENES:
        scn = os.path.join(SCENES_DIR, f"{name}.scn")
        w, h = scn_resolution(scn)
        print(f"[h2h] tpu {name} {w}x{h} ...", flush=True)
        env = dict(
            os.environ,
            TRACY_BENCH_ORCHESTRATE="0",
            TRACY_BENCH_SCENE=scn,
            TRACY_BENCH_WIDTH=str(w), TRACY_BENCH_HEIGHT=str(h),
            TRACY_BENCH_SPP="4", TRACY_BENCH_FRAMES="3",
        )
        try:
            p = subprocess.run(
                [sys.executable, "-u", os.path.join(REPO, "bench.py")],
                env=env, capture_output=True, text=True, timeout=1500,
            )
        except subprocess.TimeoutExpired:
            print(f"[h2h] tpu {name} TIMED OUT", flush=True)
            continue
        line = next((ln for ln in p.stdout.splitlines()
                     if ln.startswith("{")), None)
        if not line:
            print(f"[h2h] tpu {name} no JSON (rc={p.returncode}): "
                  f"{p.stderr[-500:]}", flush=True)
            continue
        j = json.loads(line)
        entry = res.setdefault(name, {})
        entry["resolution"] = f"{w}x{h}"
        entry["tpu_mrays"] = j["value"]
        entry["tpu_reps"] = j.get("reps")
        entry["tpu_spread"] = j.get("spread")
        entry["tpu_fallback"] = j.get("fallback")
        save_results(res)
        print(f"[h2h] tpu {name}: {j['value']} MRays/s "
              f"(spread {j.get('spread')}, fallback {j.get('fallback')})",
              flush=True)


def print_table() -> None:
    res = load_results()
    print("| Scene | Resolution | reference CPU (MRays/s) | "
          "tracy-tpu TPU (MRays/s) | speedup |")
    print("|---|---|---|---|---|")
    for name, _ in SCENES:
        e = res.get(name, {})
        ref = e.get("ref_cpu_mrays")
        tpu = e.get("tpu_mrays")
        sp = (f"**{tpu / ref:.1f}x**" if ref and tpu else "—")
        print(f"| {name} | {e.get('resolution', '?')} | "
              f"{ref if ref is not None else '—'} | "
              f"{tpu if tpu is not None else '—'}"
              f"{' (' + e.get('tpu_fallback') + ')' if e.get('tpu_fallback') not in (None, 'none') else ''} | "
              f"{sp} |")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", choices=["ref", "tpu", "both"], default=None)
    ap.add_argument("--table", action="store_true")
    ap.add_argument("--frames-scale", type=float, default=1.0)
    a = ap.parse_args()
    if a.side in ("ref", "both"):
        run_ref(a.frames_scale)
    if a.side in ("tpu", "both"):
        run_tpu()
    if a.table or not a.side:
        print_table()
