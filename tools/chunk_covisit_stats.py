#!/usr/bin/env python3
"""Would CHUNK-level leaves cut kernel visits? (host-side, CPU)

build_tables packs small adjacent leaves into shared 128-slot chunks in
tree order. The kernel visits each LEAF separately even when two leaves of
the same chunk are both hit by the same packet in the same wave — one
chunk visit (full-chunk MT, padding auto-misses via det=0) could cover
both, at the price of a looser chunk bbox. This replays the shared-stack
traversal and reports, per packet:

  leaf visits         (what the kernel pays today)
  distinct chunks     (lower bound if same-chunk leaf visits merged)
  chunk-bbox visits   (what a chunk-leaf BVH would ACTUALLY visit: replay
                       with each leaf's bbox replaced by its chunk's union
                       bbox — looser bounds add false-positive visits)

Run: JAX_PLATFORMS=cpu python tools/chunk_covisit_stats.py
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.traversal_stats import packet_visit_counts  # noqa: E402


def packet_leaf_sets(nb, nm, leaf_chunk, o, d, active):
    """Replay traversal; return (leaf visits, distinct chunk count)."""
    inv_d = np.clip(1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d), -1e30, 1e30)
    best = np.where(active, np.float32(3.4e38), -np.float32(3.4e38))
    stack = [0]
    leaves = []
    while stack:
        node = stack.pop()
        first, count, right = nm[node, 0], nm[node, 1], nm[node, 2]
        if count > 0:
            leaves.append(node)
            continue

        def slab(c):
            lo = (nb[c, 0:3] - o) * inv_d
            hi = (nb[c, 3:6] - o) * inv_d
            tmin = np.minimum(lo, hi).max(axis=-1)
            tmaxv = np.maximum(lo, hi).min(axis=-1)
            hit = (tmaxv >= np.maximum(1e-8, tmin)) & (tmin < best)
            return hit.any(), np.where(hit, tmin, 3.4e38).min()

        lhit, lt = slab(first)
        rhit, rt = slab(right)
        near, far, nh, fh = ((first, right, lhit, rhit) if lt <= rt
                             else (right, first, rhit, lhit))
        if fh:
            stack.append(far)
        if nh:
            stack.append(near)
    chunks = {leaf_chunk[n] for n in leaves}
    return len(leaves), len(chunks)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="/root/reference/data/scenes/dragon.scn")
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--packets", type=int, default=48)
    ap.add_argument("--leaf-size", type=int, default=128)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tracy_tpu.accel.packet import build_packet_bvh
    from tracy_tpu.config import RenderConfig
    from tracy_tpu.core.camera import pixel_samples_rows
    from tracy_tpu.core.rng import RngSpec
    from tracy_tpu.ops.pallas_packet import LEAF, build_tables
    from tracy_tpu.render.integrator import JITTER_BOUNCE
    from tracy_tpu.scene.scn_parser import load_scene

    b = load_scene(args.scene, data_root="/root/reference")
    b.width, b.height = args.width, args.height
    scene = b.build()
    bvh, _ = build_packet_bvh(scene, leaf_size=args.leaf_size)
    nb = np.asarray(bvh.node_bounds)
    nm0 = np.asarray(bvh.node_meta)

    # leaf -> chunk mapping from the REAL table build (same packing).
    tables = build_tables(scene, bvh, with_tangent=False)
    nm = np.asarray(tables.node_meta)  # realigned meta: leaf first = slot
    leaf_nodes = np.where(nm[:, 1] > 0)[0]
    leaf_chunk = {int(n): int(nm[n, 0]) // LEAF for n in leaf_nodes}
    n_chunks = max(leaf_chunk.values()) + 1
    print(f"{b.name}: {len(leaf_nodes)} leaves in {n_chunks} chunks "
          f"({len(leaf_nodes)/n_chunks:.2f} leaves/chunk)")

    # chunk-union bboxes -> a second node table with leaf bboxes widened.
    cmin = np.full((n_chunks, 3), np.inf, np.float32)
    cmax = np.full((n_chunks, 3), -np.inf, np.float32)
    for n in leaf_nodes:
        c = leaf_chunk[int(n)]
        cmin[c] = np.minimum(cmin[c], nb[n, 0:3])
        cmax[c] = np.maximum(cmax[c], nb[n, 3:6])
    nb_chunk = nb.copy()
    for n in leaf_nodes:
        c = leaf_chunk[int(n)]
        nb_chunk[n, 0:3] = cmin[c]
        nb_chunk[n, 3:6] = cmax[c]

    # wave-2 rays (reuse the saved probe file if present, else primary-only)
    rays_file = os.environ.get("PROBE_RAYS_FILE", "/tmp/tracy_probe_wave2.npz")
    if os.path.exists(rays_file):
        z = np.load(rays_file)
        o2, d2, act2 = z["o2"], z["d2"], z["act2"]
        print(f"wave-2 rays from {rays_file} (live {act2.mean():.3f})")
    else:
        print("no wave-2 file; using primary rays")
        h, w = args.height, args.width
        rng = RngSpec("fast", 0xABCDEF)
        rows = jnp.arange(h, dtype=jnp.int32)
        pix = (rows[:, None] * w
               + jnp.arange(w, dtype=jnp.int32)[None, :]).astype(jnp.uint32)
        ju = rng.uniform(pix, jnp.uint32(0), JITTER_BOUNCE, 0)
        jv = rng.uniform(pix, jnp.uint32(0), JITTER_BOUNCE, 1)
        ss, tt = pixel_samples_rows(w, h, rows, ju, jv)
        o_i, d_i = scene.camera.generate_rays(ss, tt)
        o2 = np.asarray(o_i).reshape(-1, 3)
        d2 = np.asarray(d_i).reshape(-1, 3)
        act2 = np.ones(len(o2), bool)

    npk = len(o2) // 1024
    step = max(1, npk // args.packets)
    tot_leaf = tot_chunk = tot_chunkbb = 0
    lives = 0
    for p in range(0, npk, step):
        sl = slice(p * 1024, (p + 1) * 1024)
        o, d, act = o2[sl], d2[sl], act2[sl]
        if not act.any():
            continue
        lives += 1
        lv, ck = packet_leaf_sets(nb, nm, leaf_chunk, o, d, act)
        # chunk-leaf BVH estimate: distinct chunks reached when every
        # leaf bbox is widened to its chunk's union.
        _, ck_cb = packet_leaf_sets(nb_chunk, nm, leaf_chunk, o, d, act)
        tot_leaf += lv
        tot_chunk += ck
        tot_chunkbb += ck_cb
    print(f"live packets measured: {lives}")
    print(f"leaf visits/packet:        {tot_leaf/max(lives,1):7.1f}")
    print(f"distinct chunks/packet:    {tot_chunk/max(lives,1):7.1f} "
          f"(ideal merge: {tot_leaf/max(tot_chunk,1):.2f}x fewer)")
    print(f"chunk-bbox visits/packet:  {tot_chunkbb/max(lives,1):7.1f} "
          f"(real chunk-leaf BVH: {tot_leaf/max(tot_chunkbb,1):.2f}x)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
