#!/usr/bin/env python3
"""Measure packet-traversal statistics for the dragon bounce waves (host).

The round-1 numbers (NOTES.md) say incoherent bounce-wave packets cost
~0.2 ms vs ~10 us coherent on the TPU kernel, and that this dominates the
frame. This tool quantifies WHY, without touching the TPU: it replays the
exact traversal algorithm (accel/packet.py == ops/pallas_packet.py) in
numpy, counting per-packet inner-node visits and leaf visits, for

  * wave 1 (primary rays, 32x32 image tiles), and
  * wave 2 (rays scattered off the first hits with the real BRDF),

under several packet formations:
  as-is         scattered rays stay in their primary packet slots
  live-compact  live rays compacted (dead lanes dropped), image order
  octant        live rays grouped by direction octant (stable within octant)
  octant+tile   grouped by (octant, origin tile id)  [upper bound: full sort]

Output: visits/packet tables + a cost model fitted to the measured kernel
times, so kernel optimizations can be ranked before spending TPU time.

Run on CPU:  JAX_PLATFORMS=cpu python tools/traversal_stats.py [--scene ...]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def packet_visit_counts(nb, nm, o, d, active, tmax=None):
    """Replay the shared-stack packet traversal for ONE packet; returns
    (inner_visits, leaf_visits, tested_tris). Uses closest-t pruning with
    per-ray best t like the kernel (best t updated after each leaf)."""
    n = o.shape[0]
    inv_d = np.clip(1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d), -1e30, 1e30)
    best = np.where(active, np.float32(3.4e38), -np.float32(3.4e38))
    if tmax is not None:
        best = np.where(active, tmax, best)

    stack = [0]
    inner = leaf = tested = 0
    while stack:
        node = stack.pop()
        first, count, right = nm[node, 0], nm[node, 1], nm[node, 2]
        if count > 0:
            leaf += 1
            tested += int(count)
            continue

        def slab(c):
            lo = (nb[c, 0:3] - o) * inv_d
            hi = (nb[c, 3:6] - o) * inv_d
            tmin = np.minimum(lo, hi).max(axis=-1)
            tmaxv = np.maximum(lo, hi).min(axis=-1)
            hit = (tmaxv >= np.maximum(1e-8, tmin)) & (tmin < best)
            return hit.any(), np.where(hit, tmin, 3.4e38).min()

        inner += 1
        lhit, lt = slab(first)
        rhit, rt = slab(right)
        if lt <= rt:
            near, far, nh, fh = first, right, lhit, rhit
        else:
            near, far, nh, fh = right, first, rhit, lhit
        if fh:
            stack.append(far)
        if nh:
            stack.append(near)
    return inner, leaf, tested


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="/root/reference/data/scenes/dragon.scn")
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--packets", type=int, default=40,
                    help="how many wave-2 packets to measure")
    ap.add_argument("--leaf-size", type=int, default=64)
    ap.add_argument("--packet-size", type=int, default=1024)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tracy_tpu.accel.packet import (
        build_packet_bvh, make_packet_intersector,
    )
    from tracy_tpu.config import RenderConfig
    from tracy_tpu.core.camera import pixel_samples_rows
    from tracy_tpu.core.rng import RngSpec
    from tracy_tpu.render import material as mtl
    from tracy_tpu.render.integrator import (
        DRAW_ROULETTE, DRAW_SPECULAR, DRAW_SPHERE_PHI, DRAW_SPHERE_Z,
        JITTER_BOUNCE,
    )
    from tracy_tpu.scene.scn_parser import load_scene

    b = load_scene(args.scene, data_root="/root/reference")
    b.width, b.height = args.width, args.height
    scene = b.build()
    print(f"scene {b.name}: {b.num_triangles} tris")

    bvh, host = build_packet_bvh(scene, leaf_size=args.leaf_size)
    nb = np.asarray(bvh.node_bounds)
    nm = np.asarray(bvh.node_meta)
    n_leaves = (nm[:, 1] > 0).sum()
    print(f"bvh nodes={len(nb)} leaves={n_leaves} "
          f"mean leaf count={nm[nm[:,1]>0,1].mean():.1f}")

    cfg = RenderConfig(width=args.width, height=args.height, spp=1,
                       accel="packet")
    rng = RngSpec(cfg.rng, cfg.seed)

    # --- primary rays for a band of tiles across the dragon ---------------
    h, w, tile = args.height, args.width, 32
    rows = jnp.arange(h, dtype=jnp.int32)
    cols = jnp.arange(w, dtype=jnp.int32)
    pixel_idx = (rows[:, None] * w + cols[None, :]).astype(jnp.uint32)
    ju = rng.uniform(pixel_idx, jnp.uint32(0), JITTER_BOUNCE, 0)
    jv = rng.uniform(pixel_idx, jnp.uint32(0), JITTER_BOUNCE, 1)
    ss, tt = pixel_samples_rows(w, h, rows, ju, jv)
    o_img, d_img = scene.camera.generate_rays(ss, tt)

    def tile_fold(x):
        extra = x.shape[2:]
        x = np.asarray(x).reshape((h // tile, tile, w // tile, tile) + extra)
        x = np.swapaxes(x, 1, 2)
        return x.reshape((h * w,) + extra)

    o = tile_fold(o_img)
    d = tile_fold(d_img)
    pix = tile_fold(pixel_idx)

    isect = make_packet_intersector(scene, bvh, with_tangent=False)

    P = args.packet_size
    npack = (h * w) // P

    # find the packets with the most primary hits (the dragon body)
    print("intersecting primary wave (CPU, jitted)...")
    isect_j = jax.jit(lambda o_, d_, a_: isect(o_, d_, a_))
    hit, attrs = isect_j(jnp.asarray(o), jnp.asarray(d),
                         jnp.ones((h * w,), bool))
    hmask = np.asarray(hit.mask).reshape(npack, P)
    frac = hmask.mean(axis=1)
    order = np.argsort(-frac)
    chosen = order[: args.packets]
    print(f"primary hit fraction: mean={frac.mean():.2f} "
          f"chosen packets {frac[chosen].min():.2f}..{frac[chosen].max():.2f}")

    # --- wave-1 stats on the chosen packets -------------------------------
    stats1 = np.array([
        packet_visit_counts(nb, nm, o[p * P:(p + 1) * P], d[p * P:(p + 1) * P],
                            np.ones(P, bool))
        for p in chosen
    ])
    print(f"wave1 (coherent tiles): inner={stats1[:,0].mean():.0f} "
          f"leaf={stats1[:,1].mean():.0f} tris={stats1[:,2].mean():.0f} /packet")

    # --- scatter to produce wave-2 rays (real BRDF + RR) ------------------
    params = mtl.gather_surface_params(
        scene, attrs.material, attrs.uv, attrs.normal, attrs.tangent)
    r1 = rng.uniform(pix, jnp.uint32(0), 0, DRAW_SPHERE_Z)
    r2 = rng.uniform(pix, jnp.uint32(0), 0, DRAW_SPHERE_PHI)
    r3 = rng.uniform(pix, jnp.uint32(0), 0, DRAW_SPECULAR)
    point = np.asarray(o) + np.asarray(hit.t)[:, None] * np.asarray(d)
    res = mtl.scatter(jnp.asarray(d), jnp.asarray(point), params, r1, r2, r3)
    thr = np.asarray(res.attenuation)
    p_rr = 1e-8 + thr.max(axis=-1)
    rr = np.asarray(rng.uniform(pix, jnp.uint32(0), 0, DRAW_ROULETTE))
    alive2 = np.asarray(hit.mask) & (rr <= p_rr)
    o2 = np.asarray(res.origin)
    d2 = np.asarray(res.direction)
    print(f"wave2 live fraction (overall): {alive2.mean():.3f}")

    sel = np.concatenate([np.arange(p * P, (p + 1) * P) for p in chosen])
    o2s, d2s, live = o2[sel], d2[sel], alive2[sel]
    print(f"wave2 live fraction (chosen packets): {live.mean():.3f}")

    def run_formation(name, o_, d_, act):
        np_ = len(o_) // P
        st = np.array([
            packet_visit_counts(nb, nm, o_[i * P:(i + 1) * P],
                                d_[i * P:(i + 1) * P], act[i * P:(i + 1) * P])
            for i in range(np_)
        ])
        live_tot = act.sum()
        print(f"  {name:14s}: packets={np_:4d} inner={st[:,0].mean():7.0f} "
              f"leaf={st[:,1].mean():6.0f} tris={st[:,2].mean():7.0f}"
              f"  total_inner={st[:,0].sum():8.0f} total_leaf={st[:,1].sum():7.0f}"
              f"  (live rays {live_tot})")
        return st

    print("wave2 formations:")
    run_formation("as-is", o2s, d2s, live)

    # 8 masked sub-traversals per packet (no data movement; what an
    # in-kernel per-octant traversal loop would do)
    oct_all = ((d2s[:, 0] < 0) * 1 + (d2s[:, 1] < 0) * 2 + (d2s[:, 2] < 0) * 4)
    tot = np.zeros(3)
    for k in range(8):
        maskk = live & (oct_all == k)
        for i in range(len(o2s) // P):
            seg = slice(i * P, (i + 1) * P)
            if maskk[seg].any():
                st = packet_visit_counts(nb, nm, o2s[seg], d2s[seg], maskk[seg])
                tot += st
    print(f"  {'octant-masked':14s}: total_inner={tot[0]:8.0f} total_leaf={tot[1]:7.0f} total_tris={tot[2]:9.0f}")

    # live-compacted, original order
    idx = np.where(live)[0]
    pad = (-len(idx)) % P
    idxp = np.concatenate([idx, np.repeat(idx[-1:], pad)])
    actp = np.concatenate([np.ones(len(idx), bool), np.zeros(pad, bool)])
    run_formation("live-compact", o2s[idxp], d2s[idxp], actp)

    # octant-grouped (stable sort by octant among live)
    oct_ = ((d2s[:, 0] < 0) * 1 + (d2s[:, 1] < 0) * 2 + (d2s[:, 2] < 0) * 4)
    key = oct_[idx]
    srt = idx[np.argsort(key, kind="stable")]
    srtp = np.concatenate([srt, np.repeat(srt[-1:], pad)])
    run_formation("octant", o2s[srtp], d2s[srtp], actp)

    # octant within ORIGINAL packet only (what a cheap local repack gives)
    local = []
    for i in range(len(o2s) // P):
        seg = np.arange(i * P, (i + 1) * P)
        lv = seg[live[seg]]
        lo = lv[np.argsort(oct_[lv], kind="stable")]
        dead = seg[~live[seg]]
        local.append(np.concatenate([lo, dead]))
    lidx = np.concatenate(local)
    run_formation("octant-local", o2s[lidx], d2s[lidx], live[lidx])

    # full sort: octant + origin morton-ish (tile of hit point)
    cell = np.floor((o2s - o2s.min(0)) / max(1e-6, (o2s.max() - o2s.min()) / 8)
                    ).astype(int)
    ckey = ((cell[:, 0] * 8 + cell[:, 1]) * 8 + cell[:, 2])
    full = idx[np.argsort(oct_[idx] * 4096 + ckey[idx], kind="stable")]
    fullp = np.concatenate([full, np.repeat(full[-1:], pad)])
    run_formation("octant+cell", o2s[fullp], d2s[fullp], actp)


if __name__ == "__main__":
    main()
