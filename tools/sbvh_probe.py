#!/usr/bin/env python3
"""SBVH measure-then-decide probe (VERDICT r4 #9).

Spatial splits (SBVH) help when sibling-overlap makes rays visit leaves
that can never win. Before writing any builder code, measure the CEILING
on dragon/bunny with the 4-wide replay (tools/twopop_model.Replay4):

  * fruitless leaf visits — visits that improve NO ray's best_t. An
    upper bound on what ANY better tree could remove (SBVH removes only
    the subset caused by sibling overlap, not stale-best_t ordering).
  * entry-after-winner visits — fruitless AND the leaf's slab entry t of
    every live ray exceeds that ray's FINAL t: these are pure ordering/
    staleness waste that spatial splits cannot fix (the interval genuinely
    overlapped at push time). The SBVH-addressable pool is the difference.

Decision arithmetic: leaf share of a wave-2 packet ~28%, inner ~22%
(NOTES round-4 decomposition). If the SBVH-addressable pool is f of leaf
visits, the headline ceiling is roughly f * 0.28 + (proportional inner
reduction) * 0.22 — measured against SBVH's build-complexity cost.

Run on CPU: JAX_PLATFORMS=cpu python tools/sbvh_probe.py
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.twopop_model import BIG, Replay4, mt_hit_ts  # noqa: E402


class ReplayProbe(Replay4):
    """Replay4 + per-leaf-visit fruitfulness accounting."""

    def run_probe(self, o, d, active, final_t):
        n = o.shape[0]
        lanes = n // self.sub
        inv_d = np.clip(1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d),
                        -1e30, 1e30)
        best = np.where(active, BIG, -BIG).astype(np.float32)
        stack = [(0, np.ones(self.sub, bool), np.full(n, np.float32(0.0)))]
        stats = dict(inner=0, leaf=0, fruitless=0, unfixable=0)

        while stack:
            e, rowmask, entry_t = stack.pop()
            if e < 0:
                node = -e - 1
                first, count = int(self.nm[node, 0]), int(self.nm[node, 1])
                stats["leaf"] += 1
                live_rows = rowmask & (
                    best.reshape(self.sub, lanes).max(axis=1) > 0)
                slots = self.slot_tri[first:first + count]
                keep = slots >= 0
                if not keep.any() or not live_rows.any():
                    stats["fruitless"] += 1
                    stats["unfixable"] += 1
                    continue
                tids = slots[keep]
                rmask = np.repeat(live_rows, lanes) & (best > 0)
                ridx = np.nonzero(rmask)[0]
                trow = mt_hit_ts(o[ridx], d[ridx], self.v0[tids],
                                 self.e1[tids], self.e2[tids])
                tb = trow.min(axis=1)
                improved = tb < best[ridx]
                if not improved.any():
                    stats["fruitless"] += 1
                    # Split the waste: consider only rays that actually HIT
                    # this leaf's box (entry_t > 0; rows mix hitters and
                    # non-hitters at 128-lane granularity).
                    et = entry_t[ridx]
                    ft = final_t[ridx]
                    hitters = et > 0
                    if not hitters.any() or (
                            et[hitters] >= ft[hitters] - 1e-6).all():
                        # ordering/staleness or row-granularity waste:
                        # every box hitter entered AFTER its final t —
                        # tighter boxes can't remove the visit, only
                        # earlier best_t tightening could. NOT SBVH's.
                        stats["unfixable"] += 1
                best[ridx] = np.minimum(best[ridx], tb)
                continue
            stats["inner"] += 1
            ts = self.slab_children(e, o, inv_d, best)  # [W, n]
            m8 = self.n4m[e]
            ent = []
            for k in range(ts.shape[0]):
                val, tag = int(m8[2 * k]), int(m8[2 * k + 1])
                if tag < 0:
                    continue
                rowhit = ts[k].reshape(self.sub, lanes).min(axis=1) < BIG
                tmin = ts[k].min()
                if tmin < BIG:
                    enc = -(val + 1) if tag == 1 else val
                    ent.append((tmin, enc, rowhit,
                                np.where(ts[k] < BIG, ts[k], 0.0)))
            ent.sort(key=lambda x: -x[0])
            for _, enc, rm, et in ent:
                stack.append((enc, rm, et))
        return stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene",
                    default="/root/reference/data/scenes/dragon.scn")
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--packets", type=int, default=6)
    ap.add_argument("--packet-size", type=int, default=4096)
    ap.add_argument("--leaf-size", type=int, default=128)
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
    wide = _collapse4(nb, np.asarray(bvh.node_meta), width=4)
    n4b, n4m, _ = wide

    pos = np.asarray(scene.vertex_pos, np.float32)
    idx = np.asarray(scene.indices)
    v0 = pos[idx[:, 0]]
    e1 = pos[idx[:, 1]] - v0
    e2v = pos[idx[:, 2]] - v0

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
    hit, attrs = jax.jit(isect)(jnp.asarray(o), jnp.asarray(d),
                                jnp.ones((h * w,), bool))
    P = args.packet_size
    npack = (h * w) // P
    hmask = np.asarray(hit.mask).reshape(npack, P)
    chosen = np.argsort(-hmask.mean(axis=1))[: args.packets]

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

    hit2, _ = jax.jit(isect)(jnp.asarray(o2), jnp.asarray(d2),
                             jnp.asarray(alive2))
    final2 = np.where(np.asarray(hit2.mask), np.asarray(hit2.t),
                      np.float32(BIG))
    final1 = np.where(np.asarray(hit.mask), np.asarray(hit.t),
                      np.float32(BIG))

    rep = ReplayProbe(n4b, n4m, nm, v0, e1, e2v,
                      np.asarray(bvh.tri_order), P // 128)

    def run(name, o_, d_, act, fin):
        tot = dict(inner=0, leaf=0, fruitless=0, unfixable=0)
        for p in chosen:
            s, t = p * P, (p + 1) * P
            st = rep.run_probe(o_[s:t], d_[s:t], act[s:t], fin[s:t])
            for k in tot:
                tot[k] += st[k]
        np_ = len(chosen)
        fl = tot["fruitless"] / max(tot["leaf"], 1)
        uf = tot["unfixable"] / max(tot["leaf"], 1)
        addr = fl - uf
        print(f"{name}: inner={tot['inner']/np_:.0f} leaf={tot['leaf']/np_:.0f}"
              f" /packet; fruitless={100*fl:.1f}% of leaf visits, "
              f"ordering-waste(unfixable)={100*uf:.1f}%, "
              f"SBVH-ADDRESSABLE={100*addr:.1f}%", flush=True)
        # headline ceiling: addressable leaf fraction * leaf cost share
        # (0.28) + same proportional inner reduction * inner share (0.22)
        print(f"  -> headline ceiling ~{100*addr*(0.28+0.22):.1f}% "
              f"(leaf+inner shares, round-4 decomposition)", flush=True)

    run("wave1", o, d, np.ones(h * w, bool), final1)
    run("wave2", o2, d2, alive2, final2)


if __name__ == "__main__":
    main()
