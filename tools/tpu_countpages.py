#!/usr/bin/env python3
"""Texel-page DMA volume for the shade stage (helmet SoL input, VERDICT
r3 #7).

The textured shade stage DMAs one [16,128] page (8 KB) per DISTINCT page
per packet (ops/pallas_texfetch.py). The page ids are pure elementwise
XLA (lane_page_indices), so the distinct-page counts — the shade stage's
HBM traffic denominator — are computed exactly here from a REAL intersect
of the primary wave (and the frozen wave-2 rays when present), no kernel
probe needed.

Env: CP_SCENE (helmet), CP_W/CP_H (640x480), PROBE_RAYS_FILE.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tracy_tpu.accel.packet import build_packet_bvh
    from tracy_tpu.config import RenderConfig
    from tracy_tpu.core.camera import pixel_samples_rows
    from tracy_tpu.core.rng import RngSpec
    from tracy_tpu.ops.pallas_packet import (
        PACKET, build_tables, pallas_intersect,
    )
    from tracy_tpu.ops.pallas_texfetch import (
        build_texture_pages, lane_page_indices,
    )
    from tracy_tpu.render.integrator import JITTER_BOUNCE
    from tracy_tpu.scene.scn_parser import load_scene

    w = int(os.environ.get("CP_W", 640))
    h = int(os.environ.get("CP_H", 480))
    name = os.environ.get("CP_SCENE", "helmet")
    print(f"[cp] device: {jax.devices()[0]}  {name} {w}x{h}", flush=True)

    b = load_scene(f"/root/reference/data/scenes/{name}.scn",
                   data_root="/root/reference")
    b.width, b.height = w, h
    scene = b.build()
    tp = build_texture_pages(scene)
    if tp is None:
        print("[cp] scene has no texture pages; nothing to count",
              flush=True)
        return 0
    npages = tp.pages.shape[0] // 16
    print(f"[cp] page store: {npages} pages "
          f"({tp.pages.nbytes / 1e6:.1f} MB)", flush=True)

    bvh, _ = build_packet_bvh(scene, leaf_size=128, cost_mode="chunks")
    tables = build_tables(scene, bvh, with_tangent=True, width=4)

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

    interp = jax.default_backend() == "cpu"

    def pages_for(label, o, d, act):
        hit, attrs = jax.jit(
            lambda oo, dd, aa, tb: pallas_intersect(
                oo, dd, aa, tb, rb_mode="vlist", slab_batch=True,
                row_skip=True, interpret=interp)
        )(o, d, act, tables)
        # TexturePages carries host-side addressing constants consumed
        # STATICALLY (sky_has branch) — must not cross a jit boundary.
        page, _lane = lane_page_indices(tp, attrs.material, attrs.uv, d,
                                        hit.mask, act)
        pg = np.asarray(page)
        n = (len(pg) // PACKET) * PACKET
        pg = pg[:n].reshape(-1, PACKET)
        distinct = np.array([len(np.unique(r[r >= 0])) for r in pg])
        live = np.asarray(act)[:n].reshape(-1, PACKET).any(axis=1)
        dl = distinct[live]
        print(f"[cp] {label}: packets={len(distinct)} (live {live.sum()}) "
              f"distinct pages/packet mean={dl.mean():.1f} "
              f"p50={np.percentile(dl, 50):.0f} "
              f"p90={np.percentile(dl, 90):.0f} max={dl.max()} | "
              f"DMA {dl.mean() * 8.192:.0f} KB/packet "
              f"= {dl.mean() * 8192 / PACKET:.0f} B/ray", flush=True)

    o1, d1 = tile_fold(o_i), tile_fold(d_i)
    pages_for("wave1(coherent)", o1, d1, jnp.ones((h * w,), bool))

    rays_file = os.environ.get("PROBE_RAYS_FILE",
                               "/tmp/tracy_helmet_wave2.npz")
    if os.path.exists(rays_file):
        z = np.load(rays_file)
        pages_for("wave2(incoher)", jnp.asarray(z["o2"]),
                  jnp.asarray(z["d2"]), jnp.asarray(z["act2"]))
    else:
        print(f"[cp] no rays file at {rays_file}; wave2 skipped", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
