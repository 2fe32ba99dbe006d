#!/usr/bin/env python3
"""Measure the AoS<->packet-plane conversion cost on the chip.

The production bounce loop converts [N,3] AoS state to [k, planes, sub,
128] packet planes and back around BOTH kernels every wave (the round-2
"packing glue", measured 15 ms/frame on dragon). A planar PathState
(per-component [N] arrays) would replace the minor-dim-3 transposes with
contiguous reshapes/concats. This times, at production shapes
(N = 1920*1088, the dragon frame):

  A. aos-pack:    [N,3] x4 + [N] x2 -> [k, 14, sub, 128]  (today's path)
  B. planar-pack: [N] x14           -> [k, 14, sub, 128]  (refactored)
  C. aos-unpack:  planes -> [N,3] x4 stacks                (today)
  D. planar-unpack: planes -> [N] x14 slices               (refactored)

Each timed as its own jitted program (consumed by a trivial reduce so
XLA can't elide it), median of 5. The per-frame saving estimate is
(A - B + C - D) * waves.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = os.environ.get("TRACY_COMPILE_CACHE", "/tmp/tracy_jit_cache")
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)

    n = int(os.environ.get("LP_N", 1920 * 1088))
    sub = 32
    k = -(-n // (sub * 128))
    npad = k * sub * 128
    waves = int(os.environ.get("LP_WAVES", 5))
    print(f"[lp] device {jax.devices()[0]}; N={n} k={k} waves={waves}",
          flush=True)

    key = jax.random.PRNGKey(0)
    aos = [jax.random.normal(key, (npad, 3), jnp.float32) for _ in range(4)]
    flat = [jax.random.normal(key, (npad,), jnp.float32) for _ in range(2)]
    comp = [jax.random.normal(key, (npad,), jnp.float32) for _ in range(14)]
    planes = jax.random.normal(key, (k, 14, sub, 128), jnp.float32)

    def pack_aos(a0, a1, a2, a3, f0, f1):
        cols = []
        for a in (a0, a1, a2, a3):
            for c in range(3):
                cols.append(a[:, c].reshape(k, 1, sub, 128))
        cols.append(f0.reshape(k, 1, sub, 128))
        cols.append(f1.reshape(k, 1, sub, 128))
        return jnp.concatenate(cols, axis=1)

    def pack_aos_t(a0, a1, a2, a3, f0, f1):
        # today's pallas_intersect style: transpose then reshape
        parts = [a.T.reshape(3, k, sub, 128).transpose(1, 0, 2, 3)
                 for a in (a0, a1, a2, a3)]
        parts.append(f0.reshape(k, 1, sub, 128))
        parts.append(f1.reshape(k, 1, sub, 128))
        return jnp.concatenate(parts, axis=1)

    def pack_planar(*comps):
        return jnp.concatenate(
            [c.reshape(k, 1, sub, 128) for c in comps], axis=1)

    def unpack_aos(p):
        def fl(i):
            return p[:, i].reshape(npad)
        outs = [jnp.stack([fl(3 * j), fl(3 * j + 1), fl(3 * j + 2)],
                          axis=-1) for j in range(4)]
        return outs[0], outs[1], outs[2], outs[3], fl(12), fl(13)

    def unpack_planar(p):
        return tuple(p[:, i].reshape(npad) for i in range(14))

    def timed(name, fn, *args):
        red = jax.jit(lambda *a: jax.tree_util.tree_reduce(
            lambda x, y: x + jnp.sum(y),
            fn(*a), jnp.float32(0)))
        red(*args).block_until_ready()
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            red(*args).block_until_ready()
            ts.append(time.perf_counter() - t0)
        ms = float(np.median(ts)) * 1e3
        print(f"[lp] {name}: {ms:.2f} ms", flush=True)
        return ms

    base = timed("reduce-only planes", lambda p: (p,), planes)
    base_c = timed("reduce-only comps", lambda *c: c, *comp)
    a = timed("A aos-pack (transpose style)", pack_aos_t, *aos, *flat)
    a2 = timed("A2 aos-pack (slice style)", pack_aos, *aos, *flat)
    b = timed("B planar-pack", pack_planar, *comp)
    c = timed("C aos-unpack", unpack_aos, planes)
    d = timed("D planar-unpack", unpack_planar, planes)
    per_wave = (min(a, a2) - b) + (c - d)
    print(f"[lp] seam cost/wave ~{per_wave:.2f} ms (x2 kernels x{waves} "
          f"waves ~= {2 * waves * per_wave:.1f} ms/frame upper estimate; "
          f"baselines: planes {base:.2f}, comps {base_c:.2f})", flush=True)
    return 0


if __name__ == "__main__":
    main()
