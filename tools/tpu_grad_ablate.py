#!/usr/bin/env python3
"""Training-step cost bisection on the TPU (VERDICT r3 #5).

The train step (tools/tpu_grad_bench.py: materials 151.3 ms, geometry
230.5 ms at dragon 640x480) never moved with any traversal win — "not
traversal-bound" — but nothing ever named the actual bound. This probe
splits one step into:

  fwd    — render_loss forward only (Pallas intersect + XLA shade chain)
  vag    — value_and_grad (forward + backprop through the bounce loop)
  step   — vag + optax adam update (full production step)

for both production modes (materials = zero-VJP kernel forward; geometry
= winner-recompute VJP), plus a max_bounces sweep (GRAD_BOUNCES, default
"1,3,5") on the vag of each mode — if vag scales super-linearly with
bounces, the bound is the saved-residual HBM traffic of the backward
bounce chain, not compute.

Each timed program runs REPS times inside one jit (the ~30ms tunnel
dispatch amortizes). Env: GRAD_W/GRAD_H (640x480), GRAD_SCENE (dragon),
GRAD_REPS (4), GRAD_BOUNCES, GRAD_COMPACT.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp
    import optax

    from tracy_tpu.accel.reorder import pick_compact_group
    from tracy_tpu.config import RenderConfig
    from tracy_tpu.diff import (
        extract_params, make_train_step, make_training_intersector,
        render_loss,
    )
    from tracy_tpu.render.renderer import sample_radiance
    from tracy_tpu.scene.scn_parser import load_scene

    w = int(os.environ.get("GRAD_W", 640))
    h = int(os.environ.get("GRAD_H", 480))
    name = os.environ.get("GRAD_SCENE", "dragon")
    reps = int(os.environ.get("GRAD_REPS", 4))
    bounces = [int(x) for x in
               os.environ.get("GRAD_BOUNCES", "1,3,5").split(",")]
    print(f"[gab] device: {jax.devices()[0]}  scene {name} {w}x{h}",
          flush=True)

    b = load_scene(f"/root/reference/data/scenes/{name}.scn",
                   data_root="/root/reference")
    b.width, b.height = w, h
    scene = b.build()

    def make_cfg(mb):
        return RenderConfig(
            width=w, height=h, spp=1, max_bounces=mb, tonemap="none",
            accel="packet",
            wave_compact_group=int(os.environ.get(
                "GRAD_COMPACT", pick_compact_group(w * h))),
            pallas_bvh_width=int(os.environ.get("GRAD_BVHW", 4)))

    cfg = make_cfg(5)
    frame = jnp.asarray(0, jnp.int32)
    fwd_isect = make_training_intersector(scene, cfg,
                                          needs_geometry_grads=False)
    target = jax.jit(
        lambda: sample_radiance(scene, cfg, frame, fwd_isect)[0])()
    target.block_until_ready()
    print("[gab] target rendered", flush=True)

    def timed(label, fn, *args):
        # args[0] is always the TrainableParams pytree: perturb one albedo
        # element by the loop index so the body is NOT loop-invariant (an
        # invariant body gets hoisted out of the fori — the first cut of
        # this probe reported 0.2 ms for a 307K-ray render).
        def prog(*a):
            def body(i, carry):
                p = a[0]
                p = p._replace(albedo=p.albedo.at[0, 0].add(
                    jnp.float32(i) * 1e-12))
                out = fn(p, *a[1:])
                leaf = jax.tree_util.tree_leaves(out)[0]
                return carry + jnp.sum(leaf * 0.0) + jnp.float32(i) * 0.0
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

        f = jax.jit(prog)
        t0 = time.perf_counter()
        f(*args).block_until_ready()
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        f(*args).block_until_ready()
        ms = (time.perf_counter() - t0) / reps * 1e3
        print(f"[gab] {label}: {ms:8.1f} ms  (compile {compile_s:.0f}s)",
              flush=True)
        return ms

    opt = optax.adam(1e-2)
    for label, geom in (("materials", False), ("geometry", True)):
        isect = make_training_intersector(scene, cfg,
                                          needs_geometry_grads=geom)
        params = extract_params(scene)

        timed(f"{label} fwd ", lambda p: render_loss(
            p, scene, target, cfg, frame, isect), params)
        timed(f"{label} vag ", lambda p: jax.value_and_grad(render_loss)(
            p, scene, target, cfg, frame, isect), params)

        step, opt_state = make_train_step(scene, cfg, opt,
                                          intersect_fn=isect, jit=False)
        timed(f"{label} step", lambda p, o: step(p, o, target, frame),
              params, opt_state)

        for mb in bounces:
            if mb == cfg.max_bounces:
                continue
            cfg_b = make_cfg(mb)
            isect_b = make_training_intersector(scene, cfg_b,
                                                needs_geometry_grads=geom)
            timed(f"{label} vag mb={mb}",
                  lambda p: jax.value_and_grad(render_loss)(
                      p, scene, target, cfg_b, frame, isect_b), params)
    print("[gab] DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
