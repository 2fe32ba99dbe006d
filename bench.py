"""Headline benchmark: dragon.scn at 1080p, 4 spp, 5 bounces, BVH, RR on.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric is MRays/s on the current default JAX device (the TPU chip under the
driver), with the reference's ray accounting — one ray per live bounce-loop
iteration (cpu_trace.cpp:113-116). The reference publishes no numbers
(BASELINE.md), so vs_baseline is measured against TRACY_BASELINE_MRAYS below
— our own round-1 recorded figure once it exists, else 1.0x.

Env overrides: TRACY_BENCH_SCENE, TRACY_BENCH_WIDTH/HEIGHT/SPP/FRAMES,
TRACY_BENCH_RAY_CHUNK.
"""

from __future__ import annotations

import json
import os
import sys
import time

# Our own recorded baseline (MRays/s, this benchmark, 1 chip). Seeded with
# the round-1 measurement (BENCH_r01.json: 0.982); update as rounds land so
# vs_baseline tracks gain/regression against the previous round.
TRACY_BASELINE_MRAYS = float(os.environ.get("TRACY_BASELINE_MRAYS", "0.982") or 0)


def orchestrate():
    """Run the bench in a subprocess with a watchdog + retry + fallback.

    The tunneled TPU's compile service intermittently hangs (see NOTES.md);
    a hung in-process jax call cannot be aborted. The orchestrator retries
    the full config once after a cooldown, then falls back to a smaller
    (honestly-labeled) config so the driver still records a measurement.
    """
    import subprocess

    env = dict(os.environ, TRACY_BENCH_ORCHESTRATE="0")

    def attempt(extra_env, timeout):
        e = dict(env, **extra_env)
        try:
            res = subprocess.run(
                [sys.executable, "-u", os.path.abspath(__file__)],
                env=e, timeout=timeout, capture_output=True, text=True,
            )
            sys.stderr.write(res.stderr[-4000:])
            for line in res.stdout.splitlines():
                if line.startswith("{"):
                    print(line)
                    return True
        except subprocess.TimeoutExpired:
            print("[bench] attempt timed out", file=sys.stderr)
        return False

    if attempt({}, 1500):
        return
    print("[bench] retrying after cooldown...", file=sys.stderr)
    time.sleep(240)
    if attempt({}, 1500):
        return
    print("[bench] falling back to 640x480 config", file=sys.stderr)
    attempt({
        "TRACY_BENCH_WIDTH": "640", "TRACY_BENCH_HEIGHT": "480",
        "TRACY_BENCH_METRIC": "dragon_640x480_4spp_mrays_per_s_per_chip",
    }, 1200)


def main():
    import jax

    # Persistent compilation cache (VERDICT r1 #6: kill the warmup). Works
    # transparently when the backend honors it; harmless otherwise.
    cache_dir = os.environ.get("TRACY_COMPILE_CACHE", "/tmp/tracy_jit_cache")
    if cache_dir:
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        except Exception as e:
            print(f"[bench] compile cache unavailable: {e}", file=sys.stderr)

    import numpy as np

    from tracy_tpu.config import RenderConfig
    from tracy_tpu.render.renderer import Renderer, init_state
    from tracy_tpu.scene.scn_parser import load_scene

    scene_path = os.environ.get(
        "TRACY_BENCH_SCENE", "/root/reference/data/scenes/dragon.scn"
    )
    width = int(os.environ.get("TRACY_BENCH_WIDTH", 1920))
    height = int(os.environ.get("TRACY_BENCH_HEIGHT", 1080))
    spp = int(os.environ.get("TRACY_BENCH_SPP", 4))
    frames = int(os.environ.get("TRACY_BENCH_FRAMES", 3))
    ray_chunk = int(os.environ.get("TRACY_BENCH_RAY_CHUNK", 0))

    print(f"[bench] device: {jax.devices()[0]}", file=sys.stderr)

    b = load_scene(scene_path, data_root="/root/reference")
    b.width, b.height = width, height
    scene = b.build()
    print(f"[bench] scene: {b.name}, {b.num_triangles} tris", file=sys.stderr)

    # spp is realized as extra progressive frames (statistically identical:
    # the RNG sample axis advances with the frame counter) — a single
    # well-tested device program per step instead of an spp loop inside jit.
    frames_per_bench_frame = spp
    cfg = RenderConfig(
        width=width, height=height, spp=1, max_bounces=5,
        russian_roulette=True, tonemap="srgb", accel="packet",
        ray_chunk=ray_chunk,
        pallas_packets_per_step=int(os.environ.get("TRACY_BENCH_PPS", 2)),
        # Per-wave live-ray compaction (accel/reorder.py). Deep compaction
        # measured best with the fused readback + dead-packet fast path
        # (sessions M-O, logs/): 1080p sweep 16384/65536/262144/2097152 =
        # 2.07/2.22/2.25/2.07 MRays/s.
        wave_compact_group=int(os.environ.get("TRACY_BENCH_COMPACT", 262144)),
        pallas_rb_window=int(os.environ.get("TRACY_BENCH_RBW", 1)),
        pallas_rb_prefetch=os.environ.get("TRACY_BENCH_RBP", "0") == "1",
        pallas_rb_gather=os.environ.get("TRACY_BENCH_RBG", "take"),
        # 'fused' resolves winner attributes at every leaf visit with pure
        # vector ops — no phase 2. Measured best (session Q: 3.97 MRays/s
        # at compact=262144 with tile-padded rows).
        pallas_rb_mode=os.environ.get("TRACY_BENCH_RBM", "fused"),
        pallas_leaf_pipeline=os.environ.get("TRACY_BENCH_PIPE", "0") == "1",
        use_pallas_shade=os.environ.get("TRACY_BENCH_SHADE", "1") == "1",
        use_pallas_bounce=os.environ.get("TRACY_BENCH_BOUNCE", "0") == "1",
        pallas_bvh_width=int(os.environ.get("TRACY_BENCH_BVHW", 2)),
    )
    r = Renderer(cfg)
    state = init_state(cfg)
    total = frames * frames_per_bench_frame

    # ONE compiled program (step_many at a fixed frame count): warmup
    # compiles + runs it, the measurement re-runs it. On a device/compile
    # error fall back to the XLA packet path once.
    t0 = time.perf_counter()
    try:
        state, rays = r.step_many(scene, state, total)
    except Exception as e:
        # Fallback ladder: drop the shade stage first (keep the fast
        # intersect kernel), then the whole Pallas path.
        print(f"[bench] pallas path failed ({type(e).__name__}); retrying "
              f"without the shade stage", file=sys.stderr)
        try:
            cfg = cfg.replace(use_pallas_shade=False, use_pallas_bounce=False)
            r = Renderer(cfg)
            state = init_state(cfg)
            state, rays = r.step_many(scene, state, total)
        except Exception as e2:
            print(f"[bench] still failing ({type(e2).__name__}); falling "
                  f"back to XLA packet path", file=sys.stderr)
            cfg = cfg.replace(use_pallas=False)
            r = Renderer(cfg)
            state = init_state(cfg)
            state, rays = r.step_many(scene, state, total)
    t1 = time.perf_counter()
    print(f"[bench] warmup (compile + {total} frames): {t1 - t0:.1f}s, "
          f"rays={int(rays)}", file=sys.stderr)

    r.timer.reset()
    r.total_rays = 0.0
    state, rays = r.step_many(scene, state, total)
    mrays = r.mrays_per_sec
    print(
        f"[bench] {total} frames in {r.timer.total:.2f}s "
        f"-> {mrays:.2f} MRays/s",
        file=sys.stderr,
    )

    img = r.display_u8(state)
    out = os.environ.get("TRACY_BENCH_IMAGE", "")
    if out:
        try:
            from PIL import Image

            Image.fromarray(np.asarray(img)).save(out)
        except Exception as e:
            print(f"[bench] image save failed: {e}", file=sys.stderr)

    vs = mrays / TRACY_BASELINE_MRAYS if TRACY_BASELINE_MRAYS > 0 else 1.0
    scene_tag = os.path.splitext(os.path.basename(scene_path))[0]
    default_metric = (
        "dragon_1080p_4spp_mrays_per_s_per_chip"
        if (scene_tag, width, height, spp) == ("dragon", 1920, 1080, 4)
        else f"{scene_tag}_{width}x{height}_{spp}spp_mrays_per_s_per_chip"
    )
    print(json.dumps({
        "metric": os.environ.get("TRACY_BENCH_METRIC", default_metric),
        "value": round(mrays, 3),
        "unit": "MRays/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    if os.environ.get("TRACY_BENCH_ORCHESTRATE", "1") == "1":
        orchestrate()
    else:
        main()
