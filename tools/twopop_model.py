#!/usr/bin/env python3
"""Model two-pop inner-node batching BEFORE building it (VERDICT r4 #1).

The surviving round-5 kernel lever: fuse the slab reduction of TWO popped
inner nodes into one drained [sub, 2W] reduce, halving the per-inner-visit
vector->scalar drains (~60% of the ~26us/1024-ray-eq inner cost). The
catch: popping the next stack entry EARLY changes traversal order — the
second node is slab-tested before the first node's subtree tightened
best_t, so more children survive the push test (visit inflation), and
stale row masks keep more MT rows live.

This replays the EXACT 4-wide traversal (ops/pallas_packet.py body4:
per-packet shared stack, per-ray best_t, leaf MT updates) in numpy for
both pop disciplines and counts: inner visits, drains (fused pairs count
once), leaf visits, and live MT rows — the inputs to the cost model that
decides build/kill.

Cost model (round-4 measured, NOTES.md/BASELINE.md):
  inner visit ~26/120us of a 1024-ray-eq packet, ~60% of it drains
  -> drain ~0.35us, inner-work ~0.25us; leaf visit ~0.85-1.0us.
  twopop_gain = drains_saved * 0.35 - extra_leaf * 0.9 - extra_inner * 0.25

Run on CPU: JAX_PLATFORMS=cpu python tools/twopop_model.py
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BIG = np.float32(3.4e38)
EPS = 1e-8


def mt_hit_ts(o, d, v0, e1, e2):
    """Möller–Trumbore with backface cull (collision.h:33-74 semantics):
    rays [n,3] x tris [m,3] -> t matrix [n,m] (BIG where miss)."""
    pvec = np.cross(d[:, None, :], e2[None, :, :])  # [n,m,3]
    det = np.einsum("mk,nmk->nm", e1, pvec)
    tvec = o[:, None, :] - v0[None, :, :]
    u = np.einsum("nmk,nmk->nm", tvec, pvec)
    qvec = np.cross(tvec, e1[None, :, :])
    v = np.einsum("nk,nmk->nm", d, qvec)
    t = np.einsum("mk,nmk->nm", e2, qvec)
    ok = (det >= EPS) & (u >= 0) & (u <= det) & (v >= 0) & (u + v <= det)
    with np.errstate(divide="ignore", invalid="ignore"):
        tt = t / det
    ok &= tt > 1e-3  # kTMin-ish; visit-count model, not bit-parity
    return np.where(ok, tt, BIG).astype(np.float32)


class Replay4:
    """4-wide packet traversal replay mirroring body4 (pallas_packet.py)."""

    def __init__(self, n4b, n4m, nm, tri_v0, tri_e1, tri_e2, slot_tri,
                 sub_rows: int):
        self.n4b, self.n4m, self.nm = n4b, n4m, nm
        self.v0, self.e1, self.e2 = tri_v0, tri_e1, tri_e2
        self.slot_tri = slot_tri
        self.sub = sub_rows  # rows of `lanes` rays each (row_skip granularity)

    def slab_children(self, e, o, inv_d, best):
        """All W children of wide node e: per-ray tmin [W, n] (BIG=miss)."""
        row = self.n4b[e]
        W = len(row) // 6
        outs = np.empty((W, o.shape[0]), np.float32)
        for k in range(W):
            lo = (row[6 * k:6 * k + 3] - o) * inv_d
            hi = (row[6 * k + 3:6 * k + 6] - o) * inv_d
            tmn = np.minimum(lo, hi).max(axis=-1)
            tmx = np.maximum(lo, hi).min(axis=-1)
            hit = (tmx >= np.maximum(EPS, tmn)) & (tmn < best)
            outs[k] = np.where(hit, tmn, BIG)
        return outs

    def run(self, o, d, active, twopop: bool):
        n = o.shape[0]
        lanes = n // self.sub
        inv_d = np.clip(1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d),
                        -1e30, 1e30)
        best = np.where(active, BIG, -BIG).astype(np.float32)
        # stack entries: (encoded id, rowmask) — e>=0 wide inner, e<0 leaf
        stack = [(0, np.ones(self.sub, bool))]
        stats = dict(inner=0, drains=0, pairs=0, leaf=0, rows=0, tris=0)

        def visit_inner(e, best_now):
            """Slab all W children; returns list of pushes (child encodings
            far-to-near with row masks)."""
            ts = self.slab_children(e, o, inv_d, best_now)  # [W, n]
            m8 = self.n4m[e]
            W = ts.shape[0]
            ent = []
            for k in range(W):
                val, tag = int(m8[2 * k]), int(m8[2 * k + 1])
                if tag < 0:
                    continue
                rowhit = ts[k].reshape(self.sub, lanes).min(axis=1) < BIG
                tmin = ts[k].min()
                if tmin < BIG:
                    enc = -(val + 1) if tag == 1 else val
                    ent.append((tmin, enc, rowhit))
            ent.sort(key=lambda x: -x[0])  # far first -> near pops first
            return ent

        def visit_leaf(e, rowmask):
            node = -e - 1
            first, count = int(self.nm[node, 0]), int(self.nm[node, 1])
            stats["leaf"] += 1
            live_rows = rowmask & (
                best.reshape(self.sub, lanes).max(axis=1) > 0)
            stats["rows"] += int(live_rows.sum())
            stats["tris"] += count
            slots = self.slot_tri[first:first + count]
            keep = slots >= 0
            if not keep.any() or not live_rows.any():
                return
            tids = slots[keep]
            rmask = np.repeat(live_rows, lanes) & (best > 0)
            ridx = np.nonzero(rmask)[0]
            trow = mt_hit_ts(o[ridx], d[ridx], self.v0[tids], self.e1[tids],
                             self.e2[tids])
            best[ridx] = np.minimum(best[ridx], trow.min(axis=1))

        while stack:
            e1_, m1 = stack.pop()
            if e1_ < 0:
                visit_leaf(e1_, m1)
                continue
            if twopop and stack and stack[-1][0] >= 0:
                e2_, m2 = stack.pop()
                stats["inner"] += 2
                stats["drains"] += 1
                stats["pairs"] += 1
                snap = best.copy()  # both nodes see the SAME best_t
                ent1 = visit_inner(e1_, snap)
                ent2 = visit_inner(e2_, snap)
                # push e2's children first, then e1's -> e1's nearest pops
                # first (e1 was nearer: it was above e2 on the stack)
                for _, enc, rm in ent2:
                    stack.append((enc, rm))
                for _, enc, rm in ent1:
                    stack.append((enc, rm))
            else:
                stats["inner"] += 1
                stats["drains"] += 1
                for _, enc, rm in visit_inner(e1_, best):
                    stack.append((enc, rm))
        return stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene",
                    default="/root/reference/data/scenes/dragon.scn")
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--packets", type=int, default=12)
    ap.add_argument("--packet-size", type=int, default=4096)
    ap.add_argument("--leaf-size", type=int, default=128)
    ap.add_argument("--sub", type=int, default=32,
                    help="row granularity = packet/128 lanes")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tracy_tpu.accel.packet import build_packet_bvh, make_packet_intersector
    from tracy_tpu.config import RenderConfig
    from tracy_tpu.core.camera import pixel_samples_rows
    from tracy_tpu.core.rng import RngSpec
    from tracy_tpu.ops.pallas_packet import _collapse4
    from tracy_tpu.render import material as mtl
    from tracy_tpu.render.integrator import (
        DRAW_ROULETTE, DRAW_SPECULAR, DRAW_SPHERE_PHI, DRAW_SPHERE_Z,
        JITTER_BOUNCE,
    )
    from tracy_tpu.scene.scn_parser import load_scene

    b = load_scene(args.scene, data_root="/root/reference")
    b.width, b.height = args.width, args.height
    scene = b.build()
    print(f"scene {b.name}: {b.num_triangles} tris", flush=True)

    bvh, host = build_packet_bvh(scene, leaf_size=args.leaf_size,
                                 cost_mode="chunks")
    nb = np.asarray(bvh.node_bounds)[:, :6]
    nm = np.asarray(bvh.node_meta)[:, :3]
    # production tables realign leaves to chunk slots, then collapse; the
    # model only needs consistent (first,count) + a slot->tri map.
    tri_order = np.asarray(bvh.tri_order)
    wide = _collapse4(nb, np.asarray(bvh.node_meta), width=4)
    assert wide is not None
    n4b, n4m, depth4 = wide
    print(f"binary nodes={len(nb)} wide nodes={len(n4b)} depth4={depth4}",
          flush=True)

    pos = np.asarray(scene.vertex_pos, np.float32)
    idx = np.asarray(scene.indices)
    v0 = pos[idx[:, 0]]
    e1 = pos[idx[:, 1]] - v0
    e2v = pos[idx[:, 2]] - v0
    slot_tri = tri_order  # [T] slot -> tri id (no -1s in packed bvh)

    cfg = RenderConfig(width=args.width, height=args.height, spp=1,
                       accel="packet")
    rng = RngSpec(cfg.rng, cfg.seed)
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
    print("primary wave (XLA on CPU)...", flush=True)
    hit, attrs = jax.jit(isect)(jnp.asarray(o), jnp.asarray(d),
                                jnp.ones((h * w,), bool))

    P = args.packet_size
    npack = (h * w) // P
    hmask = np.asarray(hit.mask).reshape(npack, P)
    frac = hmask.mean(axis=1)
    chosen = np.argsort(-frac)[: args.packets]
    print(f"chosen packets hit frac {frac[chosen].min():.2f}.."
          f"{frac[chosen].max():.2f}", flush=True)

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
    o2, d2 = np.asarray(res.origin), np.asarray(res.direction)

    sub = args.sub
    rep = Replay4(n4b, n4m, nm, v0, e1, e2v, slot_tri, sub)

    def run_wave(name, o_, d_, act):
        tots = {m: dict(inner=0, drains=0, pairs=0, leaf=0, rows=0, tris=0)
                for m in ("single", "twopop")}
        for p in chosen:
            s, t = p * P, (p + 1) * P
            for mode in ("single", "twopop"):
                st = rep.run(o_[s:t], d_[s:t], act[s:t],
                             twopop=(mode == "twopop"))
                for k in tots[mode]:
                    tots[mode][k] += st[k]
        np_ = len(chosen)
        print(f"\n== {name} ({np_} packets x {P} rays) ==")
        for mode in ("single", "twopop"):
            t = tots[mode]
            print(f"  {mode:7s}: inner={t['inner']/np_:8.1f} "
                  f"drains={t['drains']/np_:8.1f} leaf={t['leaf']/np_:7.1f} "
                  f"mt_rows={t['rows']/np_:8.1f} tris={t['tris']/np_:9.0f}")
        s1, s2 = tots["single"], tots["twopop"]
        dr_saved = (s1["drains"] - s2["drains"]) / np_
        extra_leaf = (s2["leaf"] - s1["leaf"]) / np_
        extra_inner = (s2["inner"] - s1["inner"]) / np_
        extra_rows = (s2["rows"] - s1["rows"]) / np_
        # per-1024-ray-eq cost model constants (measured round 4)
        scale = 1024 / P
        gain_us = (dr_saved * 0.35 - extra_leaf * 0.9
                   - extra_inner * 0.25) * scale
        print(f"  drains saved/packet={dr_saved:.1f} extra_leaf={extra_leaf:.1f}"
              f" extra_inner={extra_inner:.1f} extra_mt_rows={extra_rows:.1f}")
        print(f"  modeled gain: {gain_us:+.1f} us per 1024-ray-eq "
              f"(vs ~120 us wave-2 packet cost)")

    run_wave("wave1 primaries", o, d, np.ones(h * w, bool))
    run_wave("wave2 scattered", o2, d2, alive2)


if __name__ == "__main__":
    main()
