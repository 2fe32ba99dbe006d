#!/usr/bin/env python3
"""Measure K = winner-readback iterations per packet (the phase-2 cost
driver) on real dragon waves, at a given readback window size.

Usage (envs): PROBE_RBW=1|2|4|8, PROBE_RAYS_FILE (shared wave-2 rays).
Set TRACY_PALLAS_ABLATE='countrb' for RBW=1 (full resolve) or
'nogather2,countrb' for RBW>1 (the windowed take_along_axis does not
lower on Mosaic; broadcasts keep the loop structure while counting).

Prints K mean/p50/p90/max over packets for the primary wave and wave 2.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RBW = int(os.environ.get("PROBE_RBW", 1))


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tracy_tpu.accel.packet import build_packet_bvh
    from tracy_tpu.ops.pallas_packet import build_tables, pallas_intersect
    from tracy_tpu.core.camera import pixel_samples_rows
    from tracy_tpu.core.rng import RngSpec
    from tracy_tpu.render.integrator import JITTER_BOUNCE
    from tracy_tpu.scene.scn_parser import load_scene

    ablate = os.environ.get("TRACY_PALLAS_ABLATE", "")
    counting_visits = "countvisits" in ablate
    assert "countrb" in ablate or counting_visits, \
        "set TRACY_PALLAS_ABLATE=countrb|countvisits"

    print(f"[kprobe] device: {jax.devices()[0]} rbw={RBW}", flush=True)
    w, h = 640, 480
    b = load_scene("/root/reference/data/scenes/dragon.scn",
                   data_root="/root/reference")
    b.width, b.height = w, h
    scene = b.build()
    bvh, _ = build_packet_bvh(scene, leaf_size=128)
    tables = build_tables(scene, bvh, with_tangent=False,
                          pack_pairs=(os.environ.get("PROBE_RBG", "take")
                                      != "onehot"))

    rng = RngSpec("fast", 0xABCDEF)
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

    waves = {"primary": (tile_fold(o_i), tile_fold(d_i),
                         jnp.ones((h * w,), bool))}
    rays_file = os.environ.get("PROBE_RAYS_FILE", "/tmp/tracy_probe_wave2.npz")
    if os.path.exists(rays_file):
        z = np.load(rays_file)
        waves["wave2"] = (jnp.asarray(z["o2"]), jnp.asarray(z["d2"]),
                          jnp.asarray(z["act2"]))
    else:
        print(f"[kprobe] no {rays_file}; run tpu_ablate first", flush=True)

    for label, (o, d, act) in waves.items():
        hit, _ = jax.jit(
            lambda oo, dd, aa: pallas_intersect(
                oo, dd, aa, tables, packets_per_step=2, rb_window=RBW,
                rb_gather=os.environ.get("PROBE_RBG", "take"),
                rb_mode=os.environ.get("PROBE_RBM", "minloop"))
        )(o, d, act)
        live = np.asarray(act).reshape(-1, 1024).sum(axis=1)
        sel = live > 0

        def stats(tag, vals):
            v = vals[sel]
            print(f"[kprobe] {label} {tag}: live_packets={sel.sum()} "
                  f"mean={v.mean():.1f} p50={np.percentile(v, 50):.0f} "
                  f"p90={np.percentile(v, 90):.0f} max={v.max():.0f} "
                  f"(live rays/packet mean {live[sel].mean():.0f})",
                  flush=True)

        if counting_visits:
            # countvisits writes leaf count -> t plane (masked sentinel
            # FLT_MAX when 0), inner count -> uv[...,0] (unmasked).
            leaf = np.asarray(hit.t).reshape(-1, 1024)[:, 0]
            leaf = np.where(leaf > 1e30, 0.0, leaf)
            inner = np.asarray(hit.uv[..., 0]).reshape(-1, 1024)[:, 0]
            stats("leaf ", leaf)
            stats("inner", inner)
        else:
            # countrb writes K into every lane of the t plane.
            k = np.asarray(hit.t).reshape(-1, 1024)[:, 0]
            k = np.where(k > 1e30, 0.0, k)
            stats(f"K rbw={RBW}", k)

    print("[kprobe] DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
