#!/usr/bin/env python3
"""Exact on-chip visit counts for the Pallas packet kernel.

TRACY_PALLAS_ABLATE=countvisits makes the kernel overwrite its t/u output
planes with (leaf visits, inner visits) per packet; this driver runs the
production build (width/leaf from env) on the coherent primary wave and the
frozen wave-2 rays (PROBE_RAYS_FILE) and prints per-packet visit stats —
the denominators for every per-visit cost model (NOTES.md round 3: all
prior per-visit numbers divided by CPU-replay counts, not kernel truth).

Env: CV_W/CV_H (640x480), CV_LEAF (128), CV_BVHW (4), CV_SCENE
(dragon), PROBE_RAYS_FILE (wave-2 rays; generate per scene with
tools/tpu_probe_r2.py PROBE_SCENE=<name> PROBE_RAYS_FILE=<path>).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["TRACY_PALLAS_ABLATE"] = "countvisits"


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tracy_tpu.accel.packet import build_packet_bvh
    from tracy_tpu.config import RenderConfig
    from tracy_tpu.core.camera import pixel_samples_rows
    from tracy_tpu.core.rng import RngSpec
    from tracy_tpu.ops.pallas_packet import build_tables, pallas_intersect
    from tracy_tpu.render.integrator import JITTER_BOUNCE
    from tracy_tpu.scene.scn_parser import load_scene

    w = int(os.environ.get("CV_W", 640))
    h = int(os.environ.get("CV_H", 480))
    leaf = int(os.environ.get("CV_LEAF", 128))
    width = int(os.environ.get("CV_BVHW", 4))
    scene_name = os.environ.get("CV_SCENE", "dragon")
    print(f"[cv] device: {jax.devices()[0]}  {scene_name} {w}x{h} "
          f"leaf={leaf} width={width}", flush=True)

    b = load_scene(f"/root/reference/data/scenes/{scene_name}.scn",
                   data_root="/root/reference")
    b.width, b.height = w, h
    scene = b.build()
    wt = bool(np.asarray(scene.materials.tex_index).max() >= 0)
    bvh, _ = build_packet_bvh(scene, leaf_size=leaf, cost_mode="chunks")
    tables = build_tables(scene, bvh, with_tangent=wt, width=width)
    print(f"[cv] tab rows={tables.tab.shape[0]} "
          f"chunks={tables.tab.shape[1] // 128}", flush=True)

    cfg = RenderConfig(width=w, height=h, spp=1, accel="packet")
    rng = RngSpec(cfg.rng, cfg.seed)
    rows = jnp.arange(h, dtype=jnp.int32)
    pix = (rows[:, None] * w
           + jnp.arange(w, dtype=jnp.int32)[None, :]).astype(jnp.uint32)
    ju = rng.uniform(pix, jnp.uint32(0), JITTER_BOUNCE, 0)
    jv = rng.uniform(pix, jnp.uint32(0), JITTER_BOUNCE, 1)
    ss, tt = pixel_samples_rows(w, h, rows, ju, jv)
    o_i, d_i = scene.camera.generate_rays(ss, tt)

    def tile_fold(x):
        extra = x.shape[2:]
        x = x.reshape((h // 32, 32, w // 32, 32) + extra)
        x = jnp.swapaxes(x, 1, 2)
        return x.reshape((h * w,) + extra)

    # Per-packet sampling stride = the packet size actually used below.
    # Derived, not hardcoded, so the packet_rays knob can't silently
    # sample mid-packet values (ADVICE r3). CV_PRAYS probes the
    # production width (default 4096); CV_RSKIP=0 turns off row_skip to
    # compare total-rows vs live-rows.
    PACKET_RAYS = int(os.environ.get("CV_PRAYS", 4096))
    RSKIP = os.environ.get("CV_RSKIP", "1") == "1"

    def counts(label, o, d, act):
        # countvisits: kernel writes leaf visits into the t plane, inner
        # visits into the u plane, live MT rows into the v plane.
        interp = jax.default_backend() == "cpu"
        hit, _ = jax.jit(
            lambda oo, dd, aa: pallas_intersect(
                oo, dd, aa, tables, rb_mode="minloop", interpret=interp,
                packet_rays=PACKET_RAYS, slab_batch=True, row_skip=RSKIP)
        )(o, d, act)
        # countvisits overwrites the t plane with the LEAF count and the u
        # plane with the INNER count (one constant per packet). Hit remaps
        # t=0 (zero visits) to FLT_MAX via the miss mask — fold those back.
        leaf_v = np.asarray(hit.t)[::PACKET_RAYS]
        leaf_v = np.where(leaf_v > 1e9, 0.0, leaf_v)
        inner_v = np.asarray(hit.uv[:, 0])[::PACKET_RAYS]
        rows_v = np.asarray(hit.uv[:, 1])[::PACKET_RAYS]
        # Fully-dead packets take the fast path (0 visits by construction);
        # report them separately so they don't dilute the per-visit means.
        pad = (-len(np.asarray(act))) % PACKET_RAYS
        act_p = np.concatenate([np.asarray(act), np.zeros(pad, bool)])
        live_pkt = act_p.reshape(-1, PACKET_RAYS).any(axis=1)
        dead = int((~live_pkt).sum())
        inner_l, leaf_l = inner_v[live_pkt], leaf_v[live_pkt]
        rows_l = rows_v[live_pkt]
        rpv = float(rows_l.sum() / max(leaf_l.sum(), 1.0))
        print(f"[cv] {label}: packets={len(inner_v)} (dead={dead}, "
              f"excluded) inner/packet mean={inner_l.mean():.0f} "
              f"p50={np.percentile(inner_l, 50):.0f} "
              f"max={inner_l.max():.0f} | leaf/packet "
              f"mean={leaf_l.mean():.0f} p50={np.percentile(leaf_l, 50):.0f} "
              f"max={leaf_l.max():.0f} | MT rows/packet "
              f"mean={rows_l.mean():.0f} rows/leaf-visit={rpv:.2f} "
              f"(of {PACKET_RAYS // 128} rows, row_skip={int(RSKIP)})",
              flush=True)

    o1, d1 = tile_fold(o_i), tile_fold(d_i)
    act1 = jnp.ones((h * w,), bool)
    counts("wave1(coherent)", o1, d1, act1)

    rays_file = os.environ.get("PROBE_RAYS_FILE", "/tmp/tracy_probe_wave2.npz")
    if os.path.exists(rays_file):
        z = np.load(rays_file)
        o2, d2 = jnp.asarray(z["o2"]), jnp.asarray(z["d2"])
        act2 = jnp.asarray(z["act2"])
        print(f"[cv] wave2 live fraction: "
              f"{float(np.asarray(act2).mean()):.3f}", flush=True)
        counts("wave2(incoher)", o2, d2, act2)
    else:
        print(f"[cv] no rays file at {rays_file}; wave2 skipped", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
