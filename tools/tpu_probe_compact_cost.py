#!/usr/bin/env python3
"""Isolate the per-wave live-ray compaction cost (accel/reorder.py).

The butterfly router runs log2(group) staged shifts over the whole
wavefront per bounce (down-route rays + up-route 10-13 result planes).
This times compact_rays + scatter_results alone — no intersection — at
the headline wavefront size, for a sweep of group sizes, so the frame
budget can attribute XLA-side routing cost separately from the kernel.

Env: PROBE_N (rays, default 1920*1088), PROBE_GROUPS (comma list),
PROBE_REPS (default 20).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from tracy_tpu.accel.reorder import compact_rays, scatter_results

    n = int(os.environ.get("PROBE_N", 1920 * 1088))
    reps = int(os.environ.get("PROBE_REPS", 20))
    groups = tuple(
        int(x) for x in os.environ.get(
            "PROBE_GROUPS", "4096,65536,262144,2097152").split(",")
    )
    print(f"[ccost] device: {jax.devices()[0]} n={n}", flush=True)

    key = jax.random.PRNGKey(0)
    o = jax.random.normal(key, (n, 3), jnp.float32)
    d = jax.random.normal(jax.random.PRNGKey(1), (n, 3), jnp.float32)
    act = jax.random.uniform(jax.random.PRNGKey(2), (n,)) < 0.3
    planes = jax.random.normal(jax.random.PRNGKey(3), (n, 13), jnp.float32)

    for g in groups:
        npad = -(-n // g) * g

        def prog(o, d, act, planes):
            def body(i, carry):
                s, oo = carry
                oo = oo.at[0, 0].add(jnp.float32(i) * 1e-6)  # defeat CSE
                oc, dc, ac, dist, valid = compact_rays(
                    oo[:npad], d[:npad], act[:npad], g)
                r = scatter_results(planes[:npad], dist, valid, g)
                return s + jnp.sum(oc[0]) + jnp.sum(r[0]) + jnp.sum(
                    jnp.where(ac[:1], 1.0, 0.0)), oo
            return jax.lax.fori_loop(0, reps, body, (jnp.float32(0), o))

        opad = jnp.pad(o, ((0, npad - n), (0, 0)))
        dpad = jnp.pad(d, ((0, npad - n), (0, 0)))
        apad = jnp.pad(act, (0, npad - n))
        ppad = jnp.pad(planes, ((0, npad - n), (0, 0)))
        f = jax.jit(prog)
        t0 = time.perf_counter()
        r = f(opad, dpad, apad, ppad)
        r[0].block_until_ready()
        comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        r = f(opad, dpad, apad, ppad)
        r[0].block_until_ready()
        el = (time.perf_counter() - t0) / reps
        print(f"[ccost] group={g:8d}: {el*1e3:7.2f} ms/wave "
              f"(x5 waves = {el*5e3:6.1f} ms/frame) compile {comp:.0f}s",
              flush=True)

    print("[ccost] DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
