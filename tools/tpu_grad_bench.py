#!/usr/bin/env python3
"""Inverse-rendering training-step throughput on the TPU.

Times one jitted train step (render -> MSE -> backprop through the bounce
loop -> adam update) on dragon 640x480 1spp for the two production
configurations:

  A. material/texture optimization: Pallas kernel forward via the
     zero-VJP wrapper (needs_geometry_grads=False);
  B. geometry optimization: Pallas kernel forward + winner-recompute
     backward (needs_geometry_grads=True, GeometryDiffIntersector).

Run AFTER tools/tpu_gate.py (tpu_session.sh does this automatically).
Env: GRAD_W/GRAD_H (default 640x480), GRAD_SCENE (default dragon).
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
    import optax

    from tracy_tpu.config import RenderConfig
    from tracy_tpu.diff import (
        extract_params, make_train_step, make_training_intersector,
    )
    from tracy_tpu.render.renderer import sample_radiance
    from tracy_tpu.scene.scn_parser import load_scene

    w = int(os.environ.get("GRAD_W", 640))
    h = int(os.environ.get("GRAD_H", 480))
    name = os.environ.get("GRAD_SCENE", "dragon")
    print(f"[grad] device: {jax.devices()[0]}  scene {name} {w}x{h}", flush=True)

    b = load_scene(f"/root/reference/data/scenes/{name}.scn",
                   data_root="/root/reference")
    b.width, b.height = w, h
    scene = b.build()
    from tracy_tpu.accel.reorder import pick_compact_group

    # Bounded-padding group (640x480 = 307200 rays with the old 262144
    # default padded the wave to 524288: +71% dead lanes traced on every
    # bounce — part of round 2's 263.8 ms/step).
    cfg = RenderConfig(width=w, height=h, spp=1, max_bounces=5,
                       tonemap="none", accel="packet",
                       wave_compact_group=int(
                           os.environ.get("GRAD_COMPACT",
                                          pick_compact_group(w * h))),
                       pallas_bvh_width=int(os.environ.get("GRAD_BVHW", 4)))

    frame = jnp.asarray(0, jnp.int32)
    fwd_isect = make_training_intersector(scene, cfg,
                                          needs_geometry_grads=False)
    target = jax.jit(
        lambda: sample_radiance(scene, cfg, frame, fwd_isect)[0]
    )()
    target.block_until_ready()
    print("[grad] target rendered", flush=True)

    opt = optax.adam(1e-2)
    for label, geom in (("materials", False), ("geometry", True)):
        isect = make_training_intersector(scene, cfg,
                                          needs_geometry_grads=geom)
        step, opt_state = make_train_step(scene, cfg, opt, intersect_fn=isect)
        params = extract_params(scene)
        t0 = time.perf_counter()
        params, opt_state, loss = step(params, opt_state, target, frame)
        jax.block_until_ready(loss)
        compile_s = time.perf_counter() - t0
        reps = 4
        t0 = time.perf_counter()
        for _ in range(reps):
            params, opt_state, loss = step(params, opt_state, target, frame)
        jax.block_until_ready(loss)
        el = (time.perf_counter() - t0) / reps
        # Ray accounting: primary rays only (conservative lower bound on
        # segments), matching BASELINE.md's gradient-step metric.
        mrays = (w * h) / 1e6 / el
        print(f"[grad] {label:9s}: {el*1e3:8.1f} ms/step  "
              f"{mrays:6.3f} MRays/s (primary)  loss={float(loss):.3e} "
              f"(compile {compile_s:.0f}s)", flush=True)

    print("[grad] DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
