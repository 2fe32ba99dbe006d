#!/usr/bin/env python3
"""Model best_t warm-starting (ray-history prediction) before building it.

Idea (PAPERS.md: "Hash-Based Ray Path Prediction", adapted): progressive
rendering re-traces the same pixels every frame with subpixel jitter; the
previous frame's winner chunk per pixel predicts where this frame's ray
will hit. Seed-then-verify is EXACT: MT the predicted chunk FIRST (any
hit found is a real upper bound on t), then traverse with best_t already
tight — only pruning improves, winners are unchanged strict-mins.

This measures the ORACLE ceiling with the 4-wide replay: initialize each
live ray's best_t to final_t * (1 + 1e-3) (a perfect one-chunk
prediction would achieve nearly this) and count inner/leaf visits vs the
cold baseline on dragon wave-1 and wave-2 packets. If the oracle saves
little, the real mechanism (extra input plane + phase-0 chunk MT) can't
pay; kill without kernel work.

Run on CPU: JAX_PLATFORMS=cpu python tools/warmstart_model.py
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.twopop_model import BIG, Replay4  # noqa: E402


class ReplayWarm(Replay4):
    def run_warm(self, o, d, active, seed_t=None, twopop=False):
        if seed_t is None:
            return self.run(o, d, active, twopop=twopop)
        # identical to run() but best starts at the seed for live rays
        orig = np.where(active, BIG, -BIG).astype(np.float32)
        self._seed = np.where(active, seed_t, orig).astype(np.float32)
        try:
            run = Replay4.run

            # monkey-light: temporarily wrap by copying run's body is
            # overkill — Replay4.run builds `best` internally, so just
            # re-implement the 3 lines here via subclass hook:
            return self._run_seeded(o, d, active, twopop)
        finally:
            self._seed = None

    def _run_seeded(self, o, d, active, twopop):
        n = o.shape[0]
        lanes = n // self.sub
        inv_d = np.clip(1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d),
                        -1e30, 1e30)
        best = self._seed.copy()
        stack = [(0, np.ones(self.sub, bool))]
        stats = dict(inner=0, drains=0, pairs=0, leaf=0, rows=0, tris=0)

        def visit_inner(e, best_now):
            ts = self.slab_children(e, o, inv_d, best_now)
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
                    ent.append((tmin, enc, rowhit))
            ent.sort(key=lambda x: -x[0])
            return ent

        from tools.twopop_model import mt_hit_ts

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
            trow = mt_hit_ts(o[ridx], d[ridx], self.v0[tids],
                             self.e1[tids], self.e2[tids])
            best[ridx] = np.minimum(best[ridx], trow.min(axis=1))

        while stack:
            e1_, m1 = stack.pop()
            if e1_ < 0:
                visit_leaf(e1_, m1)
                continue
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
    ap.add_argument("--packets", type=int, default=6)
    ap.add_argument("--packet-size", type=int, default=4096)
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

    bvh, _ = build_packet_bvh(scene, leaf_size=128, cost_mode="chunks")
    nb = np.asarray(bvh.node_bounds)[:, :6]
    nm = np.asarray(bvh.node_meta)[:, :3]
    n4b, n4m, _ = _collapse4(nb, np.asarray(bvh.node_meta), width=4)

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

    final1 = np.where(np.asarray(hit.mask), np.asarray(hit.t),
                      np.float32(BIG))

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

    rep = ReplayWarm(n4b, n4m, nm, v0, e1, e2v,
                     np.asarray(bvh.tri_order), P // 128)

    def run_wave(name, o_, d_, act, fin):
        for tag, seed in (("cold", None),
                          ("oracle", np.where(fin < BIG, fin * 1.001,
                                              np.float32(BIG)))):
            tot = dict(inner=0, leaf=0, rows=0)
            for p in chosen:
                s, t = p * P, (p + 1) * P
                st = rep.run_warm(o_[s:t], d_[s:t], act[s:t],
                                  None if seed is None else seed[s:t])
                for k in tot:
                    tot[k] += st[k]
            np_ = len(chosen)
            print(f"{name} {tag:6s}: inner={tot['inner']/np_:7.1f} "
                  f"leaf={tot['leaf']/np_:7.1f} rows={tot['rows']/np_:8.1f}"
                  f" /packet", flush=True)

    run_wave("wave1", o, d, np.ones(h * w, bool), final1)
    run_wave("wave2", o2, d2, alive2, final2)


if __name__ == "__main__":
    main()
