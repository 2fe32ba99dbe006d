#!/usr/bin/env python3
"""Leaf-visit microbenchmark: per-piece cost of the Pallas packet kernel's
inner loop, measured in ISOLATION (fixed trip count, no BVH, no ray deps).

Every ablation-delta reading of the full kernel has been confounded —
minloop phase-2 (24 iters), list appends (210 visits), and fused per-visit
resolve (210 visits) all add the SAME ~170us/packet on dragon wave 2, which
no additive cost model explains. This tool times each building block in a
bare fori_loop so the numbers stop lying:

  v0   empty loop (loop/branch skeleton)
  vd   chunk DMA (start+wait) + minimal consume — the invariant base all
       real visits pay; WITHOUT a varying DMA the compiler hoists the MT
       out of the loop entirely (first micro run measured 4-30 ns/iter)
  vmt  vd + the 8-row MT fori (the [LEAF,128] Moller-Trumbore tiles)
  vacc vmt + the 4 acc-plane writes under the improved mask
  vred vacc + a vector->scalar max consumed by an SMEM write (the 'list'
       append's sync, minus the SMEM bookkeeping)
  vres vacc + attr DMA + resolve (7 in-row gathers + bf16-pair unpack +
       interpolation + masked puts) — the 'fused' leaf visit

Usage: PROBE_MICRO=v0,vmt,... python tools/tpu_micro.py  (default: all)
Each variant runs REPS(8) x ITERS(2000) iterations inside one jit program.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LEAF = 128
ITERS = int(os.environ.get("MICRO_ITERS", 2000))
REPS = int(os.environ.get("MICRO_REPS", 4))


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print(f"[micro] device: {jax.devices()[0]} iters={ITERS}", flush=True)

    rng = np.random.default_rng(0)
    woop_h = jnp.asarray(rng.standard_normal((16, 4096)).astype(np.float32))
    attr_h = jnp.asarray(rng.standard_normal((8, 4096)).astype(np.float32))
    rays_h = jnp.asarray(rng.standard_normal((7, 8, 128)).astype(np.float32))

    def make_kernel(variant):
        def kernel(woop_ref, attr_ref, rays_ref, out_ref, w_s, a_s, acc_ref,
                   sm_ref, dma_sems):
            ox, oy, oz = rays_ref[0], rays_ref[1], rays_ref[2]
            dx, dy, dz = rays_ref[3], rays_ref[4], rays_ref[5]
            zero = jnp.zeros((8, 128), jnp.float32)
            for k in range(8):
                acc_ref[k] = zero
            sm_ref[0] = 0
            sub_iota = jax.lax.broadcasted_iota(jnp.int32, (LEAF, 128), 0)
            r_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

            # resident fake tables (so vres isolates gather+interp cost)
            w_res = [w_s[k, :].reshape(LEAF, 1) for k in range(12)]

            def mt_rows(bt, W):
                def row_body(r, carry):
                    cand_t, cand_idx, cand_u, cand_v = carry
                    r_mask = r_iota == r

                    def row(plane):
                        return jnp.sum(jnp.where(r_mask, plane, 0.0), axis=0)

                    orx, ory, orz = row(ox), row(oy), row(oz)
                    drx, dry, drz = row(dx), row(dy), row(dz)
                    opz = W[8] * orx + W[9] * ory + W[10] * orz + W[11]
                    dpz = W[8] * drx + W[9] * dry + W[10] * drz
                    dz_ok = dpz < 0.0
                    inv_dz = jnp.where(
                        dz_ok, 1.0 / jnp.where(dz_ok, dpz, -1.0), 0.0)
                    tt = -opz * inv_dz
                    opx = W[0] * orx + W[1] * ory + W[2] * orz + W[3]
                    dpx = W[0] * drx + W[1] * dry + W[2] * drz
                    opy = W[4] * orx + W[5] * ory + W[6] * orz + W[7]
                    dpy = W[4] * drx + W[5] * dry + W[6] * drz
                    uu = opx + tt * dpx
                    vv = opy + tt * dpy
                    bt_r = row(bt)
                    ok = (dz_ok & (uu >= 0.0) & (vv >= 0.0)
                          & (uu + vv <= 1.0) & (tt > 1e-3) & (tt < bt_r))
                    tt = jnp.where(ok, tt, jnp.float32(3e38))
                    row_best = jnp.min(tt, axis=0)
                    oh_raw = (tt == row_best) & ok
                    win_idx = jnp.min(
                        jnp.where(oh_raw, sub_iota, jnp.int32(LEAF)), axis=0)
                    oh1 = oh_raw & (sub_iota == win_idx[None, :])
                    u_row = jnp.min(
                        jnp.where(oh1, uu, jnp.float32(3e38)), axis=0)
                    v_row = jnp.min(
                        jnp.where(oh1, vv, jnp.float32(3e38)), axis=0)
                    upd = r_mask
                    return (jnp.where(upd, row_best[None, :], cand_t),
                            jnp.where(upd, win_idx[None, :], cand_idx),
                            jnp.where(upd, u_row[None, :], cand_u),
                            jnp.where(upd, v_row[None, :], cand_v))

                return jax.lax.fori_loop(
                    0, 8, row_body,
                    (jnp.full((8, 128), jnp.float32(3e38)),
                     jnp.full((8, 128), jnp.int32(LEAF)),
                     jnp.zeros((8, 128), jnp.float32),
                     jnp.zeros((8, 128), jnp.float32)))

            def mt_one(bt, W):
                # single fused pass: tile = [LEAF, 128] where lane r of
                # sublane-tile... here simply one row pass reused — an
                # OPTIMISTIC floor (1/8th the row loop's work).
                return mt_rows(bt, W) if False else None

            def resolve_from(buf_rows, imp, gidx, uu, vv):
                def pick(k):
                    w = jnp.broadcast_to(
                        buf_rows[k].reshape(1, LEAF), (8, LEAF))
                    return jnp.take_along_axis(w, gidx, axis=1)

                def pick_pair(base, j):
                    bits = jax.lax.bitcast_convert_type(
                        pick(base + j // 2), jnp.uint32)
                    if j % 2 == 0:
                        bits = bits & jnp.uint32(0xFFFF0000)
                    else:
                        bits = bits << 16
                    return jax.lax.bitcast_convert_type(bits, jnp.float32)

                w_sel = 1.0 - uu - vv
                k_out = 4
                for comp in range(3):
                    val = (w_sel * pick_pair(1, comp)
                           + uu * pick_pair(1, 3 + comp)
                           + vv * pick_pair(1, 6 + comp))
                    acc_ref[k_out] = jnp.where(imp, val, acc_ref[k_out])
                    k_out += 1
                acc_ref[k_out] = jnp.where(imp, pick(0), acc_ref[k_out])

            # Fill the scratch tables once (non-DMA variants read them).
            pltpu.make_async_copy(
                woop_ref.at[:, pl.ds(0, LEAF)], w_s, dma_sems.at[0]).start()
            pltpu.make_async_copy(
                attr_ref.at[:, pl.ds(0, LEAF)], a_s, dma_sems.at[1]).start()
            pltpu.make_async_copy(
                woop_ref.at[:, pl.ds(0, LEAF)], w_s, dma_sems.at[0]).wait()
            pltpu.make_async_copy(
                attr_ref.at[:, pl.ds(0, LEAF)], a_s, dma_sems.at[1]).wait()

            def body(i, bt):
                if variant == "v0":
                    return bt + 1e-7
                chunk = (i % 31) * LEAF  # wander the tables
                chunk = pl.multiple_of(chunk, LEAF)
                cp_w = pltpu.make_async_copy(
                    woop_ref.at[:, pl.ds(chunk, LEAF)], w_s,
                    dma_sems.at[0])
                cp_w.start()
                if variant == "vres":
                    cp_a = pltpu.make_async_copy(
                        attr_ref.at[:, pl.ds(chunk, LEAF)], a_s,
                        dma_sems.at[1])
                    cp_a.start()
                cp_w.wait()
                if variant == "vd":
                    return jnp.minimum(bt, w_s[0, :].reshape(1, LEAF) + bt)
                W = w_res
                cand_t, cand_idx, cand_u, cand_v = mt_rows(bt, W)
                imp = cand_t < bt
                if variant == "vmt":
                    return jnp.where(imp, cand_t, bt)
                acc_ref[0] = jnp.where(imp, jnp.float32(1.0) * chunk,
                                       acc_ref[0])
                acc_ref[1] = jnp.where(imp, cand_idx.astype(jnp.float32),
                                       acc_ref[1])
                acc_ref[2] = jnp.where(imp, cand_u, acc_ref[2])
                acc_ref[3] = jnp.where(imp, cand_v, acc_ref[3])
                if variant == "vred":
                    imp_any = jnp.max(imp.astype(jnp.int32))

                    @pl.when(imp_any > 0)
                    def _():
                        sm_ref[0] = sm_ref[0] + 1
                if variant == "vres":
                    gidx = jnp.clip(cand_idx, 0, LEAF - 1)
                    cp_a.wait()
                    rows = [a_s[k, 0:LEAF] for k in range(6)]
                    resolve_from(rows, imp, gidx, cand_u, cand_v)
                return jnp.where(imp, cand_t, bt)

            bt0 = jnp.full((8, 128), jnp.float32(3e38))
            btn = jax.lax.fori_loop(0, ITERS, body, bt0)
            out_ref[0] = btn
            for k in range(1, 8):
                out_ref[k] = acc_ref[k % 8]

        return kernel

    variants = os.environ.get(
        "PROBE_MICRO", "v0,vd,vmt,vacc,vred,vres").split(",")

    for variant in variants:
        kern = make_kernel(variant)
        interp = os.environ.get("MICRO_INTERPRET", "0") == "1"
        f = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, 8, 128), jnp.float32),
            interpret=interp,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(rays_h.shape, lambda: (0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 8, 128), lambda: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((16, LEAF), jnp.float32),
                pltpu.VMEM((8, LEAF), jnp.float32),
                pltpu.VMEM((8, 8, 128), jnp.float32),
                pltpu.SMEM((4,), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        fj = jax.jit(lambda w, a, r: f(w, a, r))
        t0 = time.perf_counter()
        out = fj(woop_h, attr_h, rays_h)
        out.block_until_ready()
        compile_s = time.perf_counter() - t0
        best = 1e9
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = fj(woop_h, attr_h, rays_h)
            out.block_until_ready()
            best = min(best, time.perf_counter() - t0)
        print(f"[micro] {variant:5s}: {best / ITERS * 1e9:8.1f} ns/iter "
              f"(total {best*1e3:.2f} ms, compile {compile_s:.0f}s)",
              flush=True)
    print("[micro] DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
