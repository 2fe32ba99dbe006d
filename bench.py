"""Headline benchmark: dragon.scn at 1080p, 4 spp, 5 bounces, BVH, RR on.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric is MRays/s on the current default JAX device (the TPU chip under the
driver), with the reference's ray accounting — one ray per live bounce-loop
iteration (cpu_trace.cpp:113-116). The reference publishes no numbers
(BASELINE.md), so vs_baseline is measured against TRACY_BASELINE_MRAYS below
— our own round-1 recorded figure once it exists, else 1.0x.

Orchestration (round 3, VERDICT r2 #1): the driver window is ~30 min and the
tunneled TPU can be down or its compile service stalled, so the orchestrator
(a) probes tunnel liveness in <=90s before committing to a long attempt,
(b) budgets attempts to provably fit the window (90 + 840 + 420 + 240 <= 27
min worst case), and (c) ALWAYS lands a parseable JSON line — degrading from
dragon 1080p TPU, to dragon 640x480 TPU, to an honestly-labeled CPU fallback
when the chip is unreachable.

Env overrides: TRACY_BENCH_SCENE, TRACY_BENCH_WIDTH/HEIGHT/SPP/FRAMES,
TRACY_BENCH_RAY_CHUNK, plus the kernel knobs below.
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

PROBE_SRC = """
import jax, jax.numpy as jnp
d = jax.devices()[0]
print("platform:", d.platform, flush=True)
x = jnp.ones((256, 256), jnp.float32)
y = (x @ x).block_until_ready()
assert float(y[0, 0]) == 256.0
print("probe-ok", flush=True)
"""


def _probe_tpu(timeout: float = 90.0) -> bool:
    """<=90s liveness check: can we reach a non-CPU device AND compile+run
    a trivial program on it? Catches both a dead tunnel (device enumeration
    hangs) and a wedged compile service (matmul compile hangs)."""
    import subprocess

    try:
        res = subprocess.run(
            [sys.executable, "-c", PROBE_SRC],
            timeout=timeout, capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired:
        print("[bench] probe timed out — tunnel/compile service down",
              file=sys.stderr)
        return False
    ok = res.returncode == 0 and "probe-ok" in res.stdout
    tpu = "platform: cpu" not in res.stdout
    if not ok or not tpu:
        print(f"[bench] probe failed (rc={res.returncode}): "
              f"{res.stdout.strip()[-200:]} {res.stderr.strip()[-200:]}",
              file=sys.stderr)
    return ok and tpu


def orchestrate():
    """Run the bench in a subprocess with a watchdog + degradation ladder.

    A hung in-process jax call cannot be aborted, so every attempt is a
    subprocess with a hard timeout. Total worst-case budget: 90 (probe)
    + 840 (1080p) + 420 (640x480) + 240 (CPU) = 1590s, inside the ~30 min
    driver window with margin.
    """
    import subprocess

    env = dict(os.environ, TRACY_BENCH_ORCHESTRATE="0")

    def attempt(extra_env, timeout, tag):
        e = dict(env, **extra_env)
        t0 = time.time()
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
            print(f"[bench] {tag}: no JSON (rc={res.returncode})",
                  file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"[bench] {tag} timed out after {time.time() - t0:.0f}s",
                  file=sys.stderr)
        return False

    cpu_env = {
        "TRACY_BENCH_FALLBACK": "cpu",
        "TRACY_BENCH_FORCE_CPU": "1",
        "TRACY_BENCH_WIDTH": "320", "TRACY_BENCH_HEIGHT": "240",
        "TRACY_BENCH_FRAMES": "2",
        "TRACY_BENCH_METRIC":
            "dragon_320x240_4spp_CPU_FALLBACK_chip_down_mrays_per_s",
    }

    # Session-batched experiments set TRACY_BENCH_WAIT_TPU=N: the CPU
    # fallback number is useless there, and the round-5 stalls came in
    # ~20-40 min waves while the 8113 HTTP endpoint kept answering — so
    # wait out the stall (N patient re-probes, 120s apart) instead of
    # burning ~10 min on a fallback render. The driver's standalone bench
    # keeps the old behavior (always lands a JSON line).
    wait_probes = int(os.environ.get("TRACY_BENCH_WAIT_TPU", "0"))
    if not _probe_tpu():
        for i in range(wait_probes):
            print(f"[bench] chip unreachable; patient re-probe "
                  f"{i + 1}/{wait_probes} in 120s", file=sys.stderr)
            time.sleep(120)
            if _probe_tpu():
                break
        else:
            # One short re-probe (transient tunnel hiccup), then give the
            # driver an honestly-labeled CPU number instead of an rc=124.
            time.sleep(30)
            if not _probe_tpu(60):
                print("[bench] chip unreachable; recording CPU fallback",
                      file=sys.stderr)
                attempt(cpu_env, 600, "cpu-fallback")
                return

    if attempt({}, 840, "1080p"):
        return
    print("[bench] falling back to 640x480 config", file=sys.stderr)
    if attempt({
        "TRACY_BENCH_WIDTH": "640", "TRACY_BENCH_HEIGHT": "480",
        "TRACY_BENCH_METRIC": "dragon_640x480_4spp_mrays_per_s_per_chip",
        "TRACY_BENCH_FALLBACK": "res640",
    }, 420, "640x480"):
        return
    print("[bench] TPU attempts exhausted; recording CPU fallback",
          file=sys.stderr)
    attempt(cpu_env, 600, "cpu-fallback")


def main():
    import jax

    if os.environ.get("TRACY_BENCH_FORCE_CPU", "0") == "1":
        # The axon sitecustomize forces JAX_PLATFORMS=axon; override AFTER
        # import (CLAUDE.md) so the fallback runs even with the tunnel dead.
        jax.config.update("jax_platforms", "cpu")

    # Persistent compilation cache (VERDICT r1 #6: kill the warmup). Works
    # transparently when the backend honors it; harmless otherwise. The
    # gate run (tools/tpu_gate.py) warms this cache, so headline attempts
    # after a gate start hot (measured 334s -> 82s -> 31s warmup).
    cache_dir = os.environ.get("TRACY_COMPILE_CACHE", "/tmp/tracy_jit_cache")
    if cache_dir:
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        except Exception as e:
            print(f"[bench] compile cache unavailable: {e}", file=sys.stderr)

    import numpy as np

    from tracy_tpu.accel.reorder import pick_compact_group
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
    on_cpu = jax.default_backend() == "cpu"

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
        russian_roulette=True, tonemap="srgb",
        accel="packet" if not on_cpu else "bvh",
        ray_chunk=ray_chunk,
        pallas_packets_per_step=int(os.environ.get("TRACY_BENCH_PPS", 2)),
        # Per-wave live-ray compaction (accel/reorder.py). Scene-regime
        # dependent (session V2): traversal-heavy scenes want deep groups
        # (dragon 1080p sweep 131072/262144/524288/1M =
        # 9.16/9.27/9.18/8.81), traversal-light scenes want NONE (helmet
        # 21.8 with 262144 -> 38.7 with 0). Default: the tri-count auto
        # heuristic (pick_compact_group); env overrides with a number.
        wave_compact_group=(lambda s: int(s) if s else (
            0 if on_cpu else pick_compact_group(
                width * height, num_tris=b.num_triangles,
                has_translucent=b.has_translucent)))(
            os.environ.get("TRACY_BENCH_COMPACT", "")),
        # Bounce-0 compaction peel (bit-identical; saves 2 routings/sample).
        wave_compact_skip_first=os.environ.get(
            "TRACY_BENCH_SKIP1", "1") == "1",
        pallas_rb_window=int(os.environ.get("TRACY_BENCH_RBW", 1)),
        pallas_rb_prefetch=os.environ.get("TRACY_BENCH_RBP", "0") == "1",
        pallas_rb_gather=os.environ.get("TRACY_BENCH_RBG", "take"),
        # 'fused' resolves winner attributes at every leaf visit with pure
        # vector ops — no phase 2. Measured best (session Q: 3.97 MRays/s
        # at compact=262144 with tile-padded rows).
        # 'vlist' resolves attributes from a traversal-recorded visit list
        # with batched phase-2 DMAs. Measured best (session T: 5.036 at
        # 4-wide + shade; fused 4.983).
        pallas_rb_mode=os.environ.get("TRACY_BENCH_RBM", "vlist"),
        pallas_leaf_pipeline=os.environ.get("TRACY_BENCH_PIPE", "0") == "1",
        # Defaults are the LAST MEASURED best config (VERDICT r2 weak #2).
        # Sessions S-U (logs/r3_session_*.log) measured on real hardware:
        # shade stage +1.9% on dragon and 14x on helmet (in-kernel texture
        # pages + sky), 4-wide traversal +6.7%; the bounce megakernel
        # regresses (4.09) and stays off.
        use_pallas_shade=os.environ.get("TRACY_BENCH_SHADE", "1") == "1",
        use_pallas_bounce=os.environ.get("TRACY_BENCH_BOUNCE", "0") == "1",
        pallas_bvh_width=int(os.environ.get("TRACY_BENCH_BVHW", 4)),
        # bf16-pair-packed Woop rows: per-leaf-visit DMA 24 -> 16 rows
        # (lossy ~0.2% t/u/v; statistical-parity only — keep off for
        # bit-exact runs).
        pallas_woop_bf16=os.environ.get("TRACY_BENCH_WOOPBF16", "0") == "1",
        pallas_leaf_size=int(os.environ.get("TRACY_BENCH_LEAF", 128)),
        # Rays per Pallas packet (1024/2048/4096): wider packets amortize
        # the serial per-visit traversal cost over more rays.
        pallas_packet_rays=int(os.environ.get("TRACY_BENCH_PRAYS", 4096)),
        # Batched slab reductions: one vector->scalar drain per inner visit
        # instead of one per child (bit-identical).
        pallas_slab_batch=os.environ.get("TRACY_BENCH_SLABB", "1") == "1",
        # Row skip: run the leaf MT only for ray rows whose pushed slab
        # mask is live (bit-identical; see config.pallas_row_skip).
        pallas_row_skip=os.environ.get("TRACY_BENCH_ROWSKIP", "1") == "1",
        # Deferred winner-u/v extraction (vlist phase-2 recompute).
        pallas_defer_uv=os.environ.get("TRACY_BENCH_DEFERUV", "1") == "1",
        # Point-form MT (statistical-parity; see config.pallas_mt_point).
        pallas_mt_point=os.environ.get("TRACY_BENCH_MTPOINT", "1") == "1",
        # MXU MT transform ('', 'default', 'high', 'highest').
        pallas_mt_mxu=os.environ.get("TRACY_BENCH_MTMXU", ""),
        # Dead-step block skip (bit-identical; see config.pallas_block_skip).
        pallas_block_skip=os.environ.get("TRACY_BENCH_BLOCKSKIP",
                                         "1") == "1",
        # Two-pop inner batching (statistical-parity; config.pallas_two_pop).
        pallas_two_pop=os.environ.get("TRACY_BENCH_TWOPOP", "1") == "1",
        # Pair-merge sparsity routing rounds (config.pallas_pair_merge).
        pallas_pair_merge=int(os.environ.get("TRACY_BENCH_PAIRMERGE", "0")),
        pallas_pair_probes=int(os.environ.get("TRACY_BENCH_PAIRPROBES",
                                              "3")),
        # Batched texel-page fetch (textured shade stage; bit-identical).
        # 0 = off, 8/16 = candidate pages per drain ("1" = legacy on = 8).
        pallas_texfetch_batch=(lambda s: 8 if s == "1" else int(s))(
            os.environ.get("TRACY_BENCH_TEXBATCH", "16")),
    )
    r = Renderer(cfg)
    state = init_state(cfg)
    total = frames * frames_per_bench_frame

    # ONE compiled program (step_many at a fixed frame count): warmup
    # compiles + runs it, the measurement re-runs it. On a device/compile
    # error fall back to the XLA packet path once. ANY rung that engages is
    # recorded in the JSON line's "fallback" field — round 3's helmet-413
    # postmortem (NOTES.md sessions T-U) proved a silent ladder can hide a
    # broken production config for a whole round.
    fallback = os.environ.get("TRACY_BENCH_FALLBACK", "none")
    t0 = time.perf_counter()
    try:
        state, rays = r.step_many(scene, state, total)
    except Exception as e:
        # Fallback ladder: drop the shade stage first (keep the fast
        # intersect kernel), then the whole Pallas path.
        print(f"[bench] pallas path failed ({type(e).__name__}); retrying "
              f"without the shade stage", file=sys.stderr)
        try:
            fallback = "noshade"
            cfg = cfg.replace(use_pallas_shade=False, use_pallas_bounce=False)
            r = Renderer(cfg)
            state = init_state(cfg)
            state, rays = r.step_many(scene, state, total)
        except Exception as e2:
            print(f"[bench] still failing ({type(e2).__name__}); falling "
                  f"back to XLA packet path", file=sys.stderr)
            fallback = "xla"
            cfg = cfg.replace(use_pallas=False)
            r = Renderer(cfg)
            state = init_state(cfg)
            state, rays = r.step_many(scene, state, total)
    t1 = time.perf_counter()
    print(f"[bench] warmup (compile + {total} frames): {t1 - t0:.1f}s, "
          f"rays={int(rays)}", file=sys.stderr)

    # Statistically decisive measurement (VERDICT r4 #2): the wins being
    # chased (~5%) sit inside single-run noise (~2% observed across rounds
    # 3-4), so the headline is the MEDIAN of >=3 timed repetitions of the
    # same compiled program, and the JSON carries the spread. One rep on
    # the slow CPU fallback (it is a liveness record, not a measurement).
    reps = int(os.environ.get("TRACY_BENCH_REPS", "1" if on_cpu else "3"))
    rep_mrays = []
    for i in range(max(1, reps)):
        r.timer.reset()
        r.total_rays = 0.0
        state, rays = r.step_many(scene, state, total)
        rep_mrays.append(r.mrays_per_sec)
        print(f"[bench] rep {i + 1}/{reps}: {total} frames in "
              f"{r.timer.total:.2f}s -> {rep_mrays[-1]:.2f} MRays/s",
              file=sys.stderr)
    mrays = float(np.median(rep_mrays))
    spread = (max(rep_mrays) - min(rep_mrays)) / mrays if mrays > 0 else 0.0
    print(f"[bench] median of {len(rep_mrays)}: {mrays:.2f} MRays/s "
          f"(min {min(rep_mrays):.2f}, max {max(rep_mrays):.2f}, "
          f"spread {100 * spread:.1f}%)", file=sys.stderr)

    if not on_cpu:
        # Ceiling report (VERDICT r2 #8): every headline carries its
        # speed-of-light estimate. leaf-chunk visits/ray is a measured model
        # constant (dragon traversal_stats; calibrate via env when scenes
        # change), dma_rows matches build_tables' merged woop+attr table.
        from tracy_tpu.utils.profiling import packet_hbm_bound

        visits_per_ray = float(os.environ.get("TRACY_SOL_VISITS_PER_RAY",
                                              "0.8"))
        # Per-leaf-visit DMA rows: fused copies the whole merged table
        # (woop+attrs); vlist copies only the woop rows (attrs ride the
        # batched phase-2 DMAs, amortized). bf16 packing halves woop rows.
        if cfg.pallas_rb_mode == "vlist":
            default_rows = "8" if cfg.pallas_woop_bf16 else "16"
        else:
            default_rows = "16" if cfg.pallas_woop_bf16 else "24"
        dma_rows = int(os.environ.get("TRACY_SOL_DMA_ROWS", default_rows))
        # Textured scenes: the shade stage DMAs one 8 KB texel page per
        # DISTINCT page per packet (tools/tpu_countpages.py measures the
        # per-scene constant; dragon has none).
        pages_per_ray = float(os.environ.get("TRACY_SOL_PAGES_PER_RAY",
                                             "0"))
        tray = (visits_per_ray * dma_rows * 128 * 4
                + pages_per_ray * 16 * 128 * 4
                + 200.0)  # ~wavefront state planes R/W per bounce
        hbm = 819.0e9 / tray / 1e6
        _ = packet_hbm_bound  # model factored there; inline adds pages
        print(f"[bench] HBM speed-of-light ~{hbm:.1f} MRays/s "
              f"(dma_rows={dma_rows}, visits/ray={visits_per_ray}, "
              f"pages/ray={pages_per_ray}) -> "
              f"measured = {100 * mrays / hbm:.1f}% of HBM bound "
              f"(the kernel is COMPUTE-bound: see BASELINE.md SoL notes)",
              file=sys.stderr)

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
        # Median-of-N with spread (VERDICT r4 #2): value above is the
        # median; reps are the individual measurements of the same
        # compiled program, spread = (max-min)/median.
        "reps": [round(x, 3) for x in rep_mrays],
        "spread": round(spread, 4),
        # The config that ACTUALLY ran (fallback-proof: "none" means the
        # full production config; anything else is a degraded measurement).
        "fallback": fallback,
        "config": {
            "rb_mode": cfg.pallas_rb_mode, "bvh_width": cfg.pallas_bvh_width,
            "shade": bool(cfg.use_pallas_shade and cfg.use_pallas),
            "slab_batch": cfg.pallas_slab_batch,
            "compact": cfg.wave_compact_group, "pallas": cfg.use_pallas,
            "packet_rays": cfg.pallas_packet_rays,
            "defer_uv": cfg.pallas_defer_uv,
            "mt_point": cfg.pallas_mt_point,
            "mt_mxu": cfg.pallas_mt_mxu,
            "two_pop": cfg.pallas_two_pop,
            "pair_merge": cfg.pallas_pair_merge,
            # The bounce megakernel has eligibility gates beyond its config
            # flag (rb_mode='fused', untextured, Pallas tables selected) —
            # record whether it actually BOUND, not whether it was asked
            # for (session K2 benched "bounce on" that never engaged).
            "bounce": bool(getattr(r, "_bounce_bind", None)),
            "texfetch_batch": cfg.pallas_texfetch_batch,
            "block_skip": cfg.pallas_block_skip,
        },
    }))


if __name__ == "__main__":
    if os.environ.get("TRACY_BENCH_ORCHESTRATE", "1") == "1":
        orchestrate()
    else:
        main()
