"""Renderer: jitted progressive render steps over a whole image.

Replaces the reference's frame loop + kernel dispatch (win_raytracer.cpp main
loop -> TracyModule::OnUpdate). One call = one progressive frame (spp samples
per pixel), jit-compiled end-to-end: jittered ray generation, the wavefront
bounce loop, accumulation. MRays/s accounting matches the reference's
definition (one ray per live bounce iteration, win_raytracer.cpp:521-553).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tracy_tpu.config import RenderConfig
from tracy_tpu.core.camera import pixel_samples, pixel_samples_rows
from tracy_tpu.core.rng import RngSpec
from tracy_tpu.render import film
from tracy_tpu.render.integrator import (
    JITTER_BOUNCE,
    make_bruteforce_intersector,
    trace_aov,
    trace_paths,
)
from tracy_tpu.scene.scene import SceneArrays
from tracy_tpu.utils.timer import Timer


class RenderState(NamedTuple):
    """Progressive accumulation state (reference render_data_.output +
    frame_counter_, cpu_details.h)."""

    accum: jnp.ndarray  # [H, W, 3] linear radiance running average
    frame: jnp.ndarray  # [] int32 completed frames


def init_state(cfg: RenderConfig) -> RenderState:
    return RenderState(
        accum=jnp.zeros((cfg.height, cfg.width, 3), dtype=jnp.float32),
        frame=jnp.zeros((), dtype=jnp.int32),
    )


def pick_tile(num_rows: int, w: int) -> Tuple[int, int]:
    """Packet tile shape (th, tw), th*tw = 1024 rays.

    32x32 is the most coherent (square footprint) and stays the default
    whenever its dead-row padding is negligible (<=2% of the band). When a
    row band is far from a 32-multiple — 'data'-sharded images hand each
    shard H/n rows, e.g. 1080/8 = 135 — flatter tiles pad less: pick the
    candidate minimizing pad, preferring taller tiles on ties. Returns
    (0, 0) when no tile width divides w (scanline fallback)."""
    best = (0, 0)
    best_pad = None
    for th, tw in ((32, 32), (16, 64), (8, 128)):
        if w % tw:
            continue
        pad = (-num_rows) % th
        if th == 32 and pad * 50 <= num_rows:  # <=2%: keep the square tile
            return (32, 32)
        if best_pad is None or pad < best_pad:
            best, best_pad = (th, tw), pad
    return best


def sample_radiance_rows(
    scene: SceneArrays,
    cfg: RenderConfig,
    frame: jnp.ndarray,
    intersect_fn=None,
    shade_fn=None,  # optional on-core shading stage (see trace_paths)
    bounce_fn=None,  # optional fused bounce megakernel (see trace_paths)
    first_intersect_fn=None,  # uncompacted bounce-0 variants (see
    first_bounce_fn=None,  # trace_paths: the primary wave is all-live)
    row_offset=0,  # traced or static: first image row this shard renders
    num_rows: Optional[int] = None,  # static: rows rendered here
    spp_offset=0,  # traced or static: first sample id this shard renders
    spp_count: Optional[int] = None,  # static: samples rendered here
    total_spp: Optional[int] = None,  # static: global spp (RNG stream stride)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """spp_count jittered samples over a horizontal band of the image.

    Returns (mean radiance [num_rows, W, 3], rays []). Differentiable w.r.t.
    scene arrays. RNG streams are keyed by GLOBAL pixel index and GLOBAL
    sample id, so any row/sample sharding renders the identical image.
    """
    h, w = cfg.height, cfg.width
    num_rows = h if num_rows is None else num_rows
    spp_count = cfg.spp if spp_count is None else spp_count
    total_spp = cfg.spp if total_spp is None else total_spp
    if intersect_fn is None:
        intersect_fn = make_bruteforce_intersector(scene)

    rng = RngSpec(cfg.rng, cfg.seed)

    # Tile the pixel order so each traversal packet covers a compact image
    # tile instead of a thin scanline strip — much smaller BVH footprint per
    # packet. Pure reshape/transpose (zero gathers); untile() restores image
    # order. Tiles hold 1024 rays = one packet. Row bands that are NOT a
    # tile multiple (1080 % 32 = 24: the 1080p headline!) are PADDED with
    # dead rows — otherwise they silently degrade to 1024x1 scanline
    # packets, each with a huge BVH footprint (measured ~10% frame cost at
    # 1080p even before visit-count effects). Pad lanes trace dead: not
    # ray-counted, results discarded. The tile SHAPE adapts to the shard's
    # row count (pick_tile): a 'data'-sharded 1080p image gives each of 8
    # shards 135 rows, which 32-row tiles would pad +18.5%; 8x128 tiles
    # pad +0.7% (the <5% scaling-overhead budget, tests/test_sharding.py).
    tile_h, tile_w = pick_tile(num_rows, w) if cfg.accel in (
        "packet", "tlas") else (0, 0)
    rpad = (-num_rows) % tile_h if tile_h else 0
    rows_r = num_rows + rpad
    rows = row_offset + jnp.arange(rows_r, dtype=jnp.int32)  # global rows
    cols = jnp.arange(w, dtype=jnp.int32)
    pixel_idx = (rows[:, None] * w + cols[None, :]).astype(jnp.uint32)
    live_rows = (
        jnp.broadcast_to(
            (jnp.arange(rows_r, dtype=jnp.int32) < num_rows)[:, None],
            (rows_r, w),
        )
        if rpad
        else None
    )
    use_tiles = tile_h > 0

    def tile_fold(x):  # [R, W, ...] -> [R*W, ...] in tile-major order
        extra = x.shape[2:]
        x = x.reshape((rows_r // tile_h, tile_h, w // tile_w, tile_w) + extra)
        x = jnp.swapaxes(x, 1, 2)
        return x.reshape((rows_r * w,) + extra)

    def tile_unfold(x):  # inverse of tile_fold
        extra = x.shape[1:]
        x = x.reshape((rows_r // tile_h, w // tile_w, tile_h, tile_w) + extra)
        x = jnp.swapaxes(x, 1, 2)
        return x.reshape((rows_r, w) + extra)

    def one_sample(s):
        sample_key = frame.astype(jnp.uint32) * jnp.uint32(total_spp) + s.astype(jnp.uint32)
        ju = rng.uniform(pixel_idx, sample_key, JITTER_BOUNCE, 0)
        jv = rng.uniform(pixel_idx, sample_key, JITTER_BOUNCE, 1)
        ss, tt = pixel_samples_rows(w, h, rows, ju, jv)
        origin, direction = scene.camera.generate_rays(ss, tt)

        if use_tiles:
            origin = tile_fold(origin)
            direction = tile_fold(direction)
            flat_pix = tile_fold(pixel_idx)
            alive0 = tile_fold(live_rows) if rpad else None
        else:
            origin = origin.reshape(-1, 3)
            direction = direction.reshape(-1, 3)
            flat_pix = pixel_idx.reshape(-1)
            alive0 = live_rows.reshape(-1) if rpad else None

        if cfg.aov != "beauty":
            radiance = trace_aov(scene, origin, direction, cfg, intersect_fn)
            rays = jnp.asarray(num_rows * w, dtype=jnp.int32)
        else:
            def run(o, d, pix, act):
                return trace_paths(scene, o, d, pix, sample_key, cfg,
                                   intersect_fn, active0=act,
                                   shade_fn=shade_fn, bounce_fn=bounce_fn,
                                   first_intersect_fn=first_intersect_fn,
                                   first_bounce_fn=first_bounce_fn)

            n = origin.shape[0]
            chunk = cfg.ray_chunk
            if 0 < chunk < n and n % chunk == 0:
                k = n // chunk
                act_c = (alive0 if alive0 is not None
                         else jnp.ones((n,), bool)).reshape(k, chunk)
                rad_c, rays_c = jax.lax.map(
                    lambda args: run(*args),
                    (
                        origin.reshape(k, chunk, 3),
                        direction.reshape(k, chunk, 3),
                        flat_pix.reshape(k, chunk),
                        act_c,
                    ),
                )
                radiance, rays = rad_c.reshape(n, 3), jnp.sum(rays_c)
            else:
                radiance, rays = run(origin, direction, flat_pix, alive0)
        if use_tiles:
            return tile_unfold(radiance)[:num_rows], rays
        return radiance.reshape(rows_r, w, 3)[:num_rows], rays

    if spp_count == 1:
        return one_sample(jnp.asarray(spp_offset, jnp.uint32))

    # Sequential running sum instead of lax.map+stack: avoids materializing
    # [spp, H, W, 3] and a nested-map structure that faults the TPU compiler.
    def spp_body(i, carry):
        acc, rays = carry
        r, k = one_sample(jnp.asarray(spp_offset, jnp.uint32) + i.astype(jnp.uint32))
        return acc + r, rays + k

    acc, rays = jax.lax.fori_loop(
        0, spp_count,
        spp_body,
        (jnp.zeros((num_rows, w, 3), dtype=jnp.float32), jnp.zeros((), jnp.int32)),
    )
    return acc / spp_count, rays


def sample_radiance(
    scene: SceneArrays,
    cfg: RenderConfig,
    frame: jnp.ndarray,
    intersect_fn=None,
    shade_fn=None,
    bounce_fn=None,
    first_intersect_fn=None,
    first_bounce_fn=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One frame of spp jittered samples -> (mean radiance [H,W,3], rays [])."""
    return sample_radiance_rows(scene, cfg, frame, intersect_fn,
                                shade_fn=shade_fn, bounce_fn=bounce_fn,
                                first_intersect_fn=first_intersect_fn,
                                first_bounce_fn=first_bounce_fn)


def render_step(
    scene: SceneArrays, state: RenderState, cfg: RenderConfig,
    intersect_fn=None, shade_fn=None, bounce_fn=None,
    first_intersect_fn=None, first_bounce_fn=None,
) -> Tuple[RenderState, jnp.ndarray]:
    """One progressive frame: sample, accumulate, bump the frame counter."""
    radiance, rays = sample_radiance(scene, cfg, state.frame, intersect_fn,
                                     shade_fn=shade_fn, bounce_fn=bounce_fn,
                                     first_intersect_fn=first_intersect_fn,
                                     first_bounce_fn=first_bounce_fn)
    if cfg.accumulate:
        accum = film.accumulate(state.accum, radiance, state.frame.astype(radiance.dtype))
    else:
        accum = radiance
    return RenderState(accum=accum, frame=state.frame + 1), rays


class Renderer:
    """Holds a config and jit-compiled step functions.

    Usage:
        r = Renderer(cfg)
        state = r.reset()
        for _ in range(frames): state, rays = r.step(scene, state)
        img = r.display(state)     # tonemapped [H, W, 3] float
    """

    def __init__(self, cfg: RenderConfig, intersector_factory=None):
        self.cfg = cfg
        self._bind = None
        self._bind_first = None  # uncompacted bounce-0 intersector
        self._accel_data = ()
        self._shade_bind = None   # binder: shade_data pytree -> shade_fn
        self._shade_data = ()     # jit-argument arrays for the shade stage
        self._bounce_bind = None
        self._bounce_bind_first = None
        if intersector_factory is not None:
            # Back-compat: factory(scene) -> IntersectFn (closure-based).
            self._bind = lambda sc, acc: intersector_factory(sc)
        # Scoped-VMEM limit override (TPU only). XLA reserves 16 MiB of
        # the chip's 128 MiB VMEM for "scoped" (stack) allocations by
        # default; big node tables blow it at some frame shapes and the
        # remote compile 500s (round 4, logs/r4_session_{z,b2,n2}). The
        # XLA_FLAGS route is a client-side FATAL (the CPU jaxlib parser
        # doesn't know TPU flags), but per-jit compiler_options forward
        # to the compile service as DebugOptions.
        copts = None
        kib = int(os.environ.get("TRACY_SCOPED_VMEM_KIB", "0") or 0)
        if kib and jax.default_backend() not in ("cpu",):
            copts = {"xla_tpu_scoped_vmem_limit_kib": kib}
        self._jit_step = jax.jit(self._step_impl, donate_argnums=(1,),
                                 compiler_options=copts)
        self._jit_steps = jax.jit(self._steps_impl, donate_argnums=(1,),
                                  static_argnums=(4,),
                                  compiler_options=copts)
        self.timer = Timer()
        self.total_rays = 0.0

    def _ensure_accel(self, scene: SceneArrays):
        """Build the acceleration structure once per renderer (host-side;
        equivalent of the reference kernel Startup -> ProcessScene boundary,
        cpu_details.cpp:26-86).

        Accel arrays are threaded through the jit boundary as ARGUMENTS
        (self._accel_data) rather than closure constants — closed-over
        concrete arrays get embedded as literals in the HLO, which balloons
        the module past what the compile service accepts (~10MB for the
        dragon tables).
        """
        if self._bind is not None:
            return
        if self.cfg.accel == "tlas":
            from tracy_tpu.accel.packet import pack_bvh
            from tracy_tpu.accel.tlas import build_two_level
            from tracy_tpu.scene.scene import TEX_NORMAL

            two = build_two_level(scene, leaf_size=self.cfg.packet_leaf_size,
                                  max_depth=max(self.cfg.traversal_stack_depth - 8, 8))
            self._two_level = two
            packed = pack_bvh(two.stitched, self.cfg.packet_leaf_size)
            # The stitched tree can be deeper than any single BLAS (TLAS
            # levels + left-deep multi-object-leaf chains), and the packet
            # traversal's stack clamp silently corrupts pops on overflow —
            # size the traversal stack from the stitched depth, not the
            # config default.
            stitched_depth = int(two.stitched.max_depth) + 4
            with_tangent = bool(
                (np.asarray(scene.materials.tex_index)[:, TEX_NORMAL] >= 0).any()
            )
            from tracy_tpu.accel.packet import (
                intersect_packet, prepare_packet_tri_data_host,
            )

            leaf = self.cfg.packet_leaf_size
            depth = max(self.cfg.traversal_stack_depth, stitched_depth)
            psize = self.cfg.packet_size
            tri = prepare_packet_tri_data_host(scene, packed, with_tangent)
            self._accel_data = (packed, tri)

            def bind(sc, acc):
                bvh_a, tri_a = acc
                return lambda o, d, act: intersect_packet(
                    o, d, tri_a, bvh_a, active=act, leaf_size=leaf,
                    stack_depth=depth, packet_size=psize,
                    with_tangent=with_tangent,
                )

            self._bind = bind
        elif self.cfg.accel == "packet":


            from tracy_tpu.accel.packet import (
                build_packet_bvh,
                intersect_packet,
                prepare_packet_tri_data_host,
            )
            from tracy_tpu.scene.scene import TEX_NORMAL

            # Tangent interpolation only matters when some material has a
            # normal map (static decision from the concrete scene).
            with_tangent = bool(
                (np.asarray(scene.materials.tex_index)[:, TEX_NORMAL] >= 0).any()
            )
            bvh = None
            tables = None
            if self.cfg.use_pallas and jax.default_backend() not in ("cpu",):
                from tracy_tpu.ops.pallas_packet import build_tables

                # The kernel tests a whole 128-slot chunk per leaf visit, so
                # build with wide leaves (see config.pallas_leaf_size).
                bvh, host = build_packet_bvh(
                    scene, leaf_size=self.cfg.pallas_leaf_size,
                    max_depth=max(self.cfg.traversal_stack_depth - 4, 8),
                    cost_mode="chunks",
                )
                cand = build_tables(
                    scene, bvh, with_tangent,
                    pack_pairs=(self.cfg.pallas_rb_gather != "onehot"),
                    width=self.cfg.pallas_bvh_width,
                    pack_woop=self.cfg.pallas_woop_bf16,
                )
                budget = self.cfg.pallas_vmem_budget
                if cand.vmem_bytes <= budget:  # node tables (VMEM)
                    tables = cand
                    if cand.vmem_bytes > 1024 * 1024 and not int(
                            os.environ.get("TRACY_SCOPED_VMEM_KIB", "0")
                            or 0):
                        # Big node tables blow XLA's DEFAULT 16 MiB
                        # scoped-vmem budget at some frame shapes (the
                        # round-4 compile 500s). Auto-raise it for this
                        # renderer's programs: 96 MiB validated on chip
                        # for 5.4 MB tables at 720p/1080p (session Q2);
                        # v5e VMEM is 128 MiB. Env TRACY_SCOPED_VMEM_KIB
                        # overrides (set at __init__). Threshold 1 MB:
                        # round-5 scene-size sweep 500'd at a 1.37 MB
                        # table (1.04M tris, 1080p) while 0.71 MB/520K
                        # compiled — the 2 MB trigger left a gap.
                        copts = {"xla_tpu_scoped_vmem_limit_kib": 98304}
                        self._jit_step = jax.jit(
                            self._step_impl, donate_argnums=(1,),
                            compiler_options=copts)
                        self._jit_steps = jax.jit(
                            self._steps_impl, donate_argnums=(1,),
                            static_argnums=(4,), compiler_options=copts)
                else:
                    import warnings

                    from tracy_tpu.utils.log import log

                    msg = (
                        f"BVH node tables ({cand.vmem_bytes / 1e6:.1f} MB) "
                        f"exceed the Pallas VMEM budget "
                        f"({budget / 1e6:.1f} MB) — falling back to the "
                        "XLA packet path, which is ~10-30x SLOWER. Raise "
                        "cfg.pallas_vmem_budget (v5e has 128 MB VMEM) or "
                        "cfg.pallas_leaf_size to shrink the node count."
                    )
                    log(msg)
                    warnings.warn(msg, RuntimeWarning, stacklevel=2)
            if tables is None:
                # XLA packet path: narrower leaves (its leaf test cost
                # scales with leaf_size, unlike the kernel's).
                bvh, host = build_packet_bvh(
                    scene, leaf_size=self.cfg.packet_leaf_size,
                    max_depth=max(self.cfg.traversal_stack_depth - 4, 8),
                )

            if tables is not None:
                from tracy_tpu.ops.pallas_packet import (
                    nondiff_intersector, pallas_intersect,
                )

                depth = self.cfg.traversal_stack_depth
                pps = self.cfg.pallas_packets_per_step
                rbw = self.cfg.pallas_rb_window
                rbp = self.cfg.pallas_rb_prefetch
                rbg = self.cfg.pallas_rb_gather
                rbm = self.cfg.pallas_rb_mode
                pipe = self.cfg.pallas_leaf_pipeline
                prays = self.cfg.pallas_packet_rays
                sbatch = self.cfg.pallas_slab_batch
                rskip = self.cfg.pallas_row_skip
                duv = (self.cfg.pallas_defer_uv and rbm == "vlist")
                mtp = self.cfg.pallas_mt_point
                mtx = self.cfg.pallas_mt_mxu
                bskip = self.cfg.pallas_block_skip
                tpop = self.cfg.pallas_two_pop
                self._accel_data = tables

                def bind(sc, acc):
                    return nondiff_intersector(
                        lambda o, d, act: pallas_intersect(
                            o, d, act, acc, stack_depth=depth,
                            packets_per_step=pps, rb_window=rbw,
                            rb_prefetch=rbp, rb_gather=rbg, rb_mode=rbm,
                            leaf_pipeline=pipe, packet_rays=prays,
                            slab_batch=sbatch, row_skip=rskip,
                            defer_uv=duv, mt_point=mtp, mt_mxu=mtx,
                            block_skip=bskip, two_pop=tpop,
                        )
                    )

                self._bind = bind
            else:
                leaf = self.cfg.packet_leaf_size
                depth = self.cfg.traversal_stack_depth
                psize = self.cfg.packet_size
                tri = prepare_packet_tri_data_host(scene, bvh, with_tangent)
                self._accel_data = (bvh, tri)

                def bind(sc, acc):
                    bvh_a, tri_a = acc
                    return lambda o, d, act: intersect_packet(
                        o, d, tri_a, bvh_a, active=act, leaf_size=leaf,
                        stack_depth=depth, packet_size=psize,
                        with_tangent=with_tangent,
                    )

                self._bind = bind
        elif self.cfg.accel == "bvh":
            from tracy_tpu.accel.bvh import build_scene_bvh, make_bvh_intersector

            host, dev = build_scene_bvh(
                scene,
                leaf_size=self.cfg.bvh_leaf_size,
                max_depth=max(self.cfg.traversal_stack_depth - 4, 8),
            )
            leaf = self.cfg.bvh_leaf_size
            depth = self.cfg.traversal_stack_depth
            self._accel_data = dev

            def bind(sc, acc):
                return make_bvh_intersector(sc, acc, leaf_size=leaf, stack_depth=depth)

            self._bind = bind
        else:
            self._accel_data = ()
            self._bind = lambda sc, acc: make_bruteforce_intersector(sc)

        # Per-wave live-ray compaction around the rich packet intersectors
        # (bit-exact routing, accel/reorder.py). The brute-force/bvh tiers
        # return bare Hit records and traverse per ray, so compaction
        # neither applies nor helps there.
        if self.cfg.wave_compact_group > 0 and self.cfg.accel in (
            "packet", "tlas"
        ):
            from tracy_tpu.accel.reorder import compact_intersector
            from tracy_tpu.scene.scene import TEX_NORMAL

            inner_bind = self._bind
            grp = self.cfg.wave_compact_group
            wt = bool(
                (np.asarray(scene.materials.tex_index)[:, TEX_NORMAL] >= 0).any()
            )

            def bind_compact(sc, acc):
                return compact_intersector(inner_bind(sc, acc), grp,
                                           route_tangent=wt)

            self._bind = bind_compact
            if self.cfg.wave_compact_skip_first:
                # Bounce 0 is all-live: run it uncompacted (trace_paths
                # peels it; identical results, two routings saved/sample).
                self._bind_first = inner_bind
        elif (self.cfg.pallas_pair_merge > 0 and self.cfg.accel in (
                "packet", "tlas")):
            # Pair-merge sparsity routing for the compaction-off regime
            # (see config.pallas_pair_merge). Bounce 0 is all-live:
            # nothing to merge, skip the wrapper there.
            from tracy_tpu.accel.reorder import pair_merge_intersector
            from tracy_tpu.scene.scene import TEX_NORMAL

            inner_bind = self._bind
            pm_rounds = self.cfg.pallas_pair_merge
            pm_probes = self.cfg.pallas_pair_probes
            pm_packet = self.cfg.pallas_packet_rays
            wt = bool(
                (np.asarray(scene.materials.tex_index)[:, TEX_NORMAL] >= 0).any()
            )

            def bind_pm(sc, acc):
                return pair_merge_intersector(
                    inner_bind(sc, acc), rounds=pm_rounds, probes=pm_probes,
                    packet=pm_packet, route_tangent=wt)

            self._bind = bind_pm
            self._bind_first = inner_bind

        self._maybe_bind_shade(scene)
        self._maybe_bind_bounce(scene)

    def _maybe_bind_shade(self, scene: SceneArrays):
        """On-core shading stage (ops/pallas_shade.py) when eligible:
        TPU backend, Pallas on, rich packet intersector, beauty AOV,
        <=128 materials. Textured scenes route through the texture fetch
        kernel (ops/pallas_texfetch.py) when the scene's maps fit the
        page layout. Bit-identical to the XLA shading math, so
        eligibility only affects speed."""
        cfg = self.cfg
        if not (cfg.use_pallas_shade and cfg.use_pallas
                and cfg.aov == "beauty" and cfg.accel in ("packet", "tlas")
                and jax.default_backend() not in ("cpu",)):
            return
        from tracy_tpu.render.material import scene_has_textures

        num_m = int(np.asarray(scene.materials.albedo).shape[0])
        seed = cfg.seed
        rr = cfg.russian_roulette

        if scene_has_textures(scene):
            from tracy_tpu.ops.pallas_shade import (
                build_material_table_tex, shade_packets_textured,
            )
            from tracy_tpu.ops.pallas_texfetch import build_texture_pages

            pages = build_texture_pages(scene)
            if pages is None:
                return  # page layout not applicable: XLA shading path
            mtab = build_material_table_tex(scene.materials, pages)
            if mtab is None:
                return
            # The page store is hundreds of MB on textured scenes: it MUST
            # cross the jit boundary as an ARGUMENT (closure-captured
            # device arrays are baked into the HLO as literals — helmet's
            # 270MB pages blew the remote-compile request limit, HTTP 413).
            # The host-side addressing constants stay in the closure.
            self._shade_data = (mtab, pages.pages)
            pages_host = pages._replace(pages=None)

            def shade_bind(sd):
                mtab_a, pages_a = sd
                pg = pages_host._replace(pages=pages_a)

                def shade_fn(o, d, thr, rad, alive, pix, hmask, t, normal,
                             tangent, uv, mat, skey, bounce):
                    return shade_packets_textured(
                        o, d, thr, rad, alive, pix, hmask, t, normal,
                        tangent, uv, mat, mtab_a, pg, skey, bounce,
                        num_materials=num_m, seed=seed, russian_roulette=rr,
                        fetch_batch=cfg.pallas_texfetch_batch,
                    )

                return shade_fn

            self._shade_bind = shade_bind
            return
        from tracy_tpu.ops.pallas_shade import (
            build_material_table, shade_packets,
        )

        mtab = build_material_table(scene.materials)
        if mtab is None:
            return
        self._shade_data = (jnp.asarray(mtab),)

        def shade_bind(sd):
            (mtab_a,) = sd

            def shade_fn(o, d, thr, rad, alive, pix, hmask, t, normal,
                         tangent, uv, mat, skey, bounce):
                return shade_packets(
                    o, d, thr, rad, alive, pix, hmask, t, normal, mat,
                    mtab_a, skey, bounce, num_materials=num_m, seed=seed,
                    russian_roulette=rr,
                )

            return shade_fn

        self._shade_bind = shade_bind

    def _maybe_bind_bounce(self, scene: SceneArrays):
        """FUSED bounce megakernel (intersect + shade in one kernel) when
        eligible: everything _maybe_bind_shade requires PLUS the Pallas
        intersect path actually selected, rb_mode='fused', untextured
        tables. Bit-identical to the two-stage path (tested), so
        eligibility only affects speed."""
        cfg = self.cfg
        if not (cfg.use_pallas_bounce and cfg.use_pallas
                and cfg.aov == "beauty" and cfg.accel == "packet"
                and cfg.pallas_rb_mode == "fused"
                and jax.default_backend() not in ("cpu",)):
            return
        from tracy_tpu.ops.pallas_packet import PallasSceneTables

        if not isinstance(self._accel_data, PallasSceneTables):
            return  # XLA packet fallback selected — no kernel to fuse into
        if self._accel_data.has_uv or self._accel_data.with_tangent:
            return
        from tracy_tpu.render.material import scene_has_textures

        if scene_has_textures(scene):
            return
        from tracy_tpu.ops.pallas_shade import build_material_table

        mtab = build_material_table(scene.materials)
        if mtab is None:
            return
        from tracy_tpu.ops.pallas_packet import pallas_trace_bounce

        num_m = int(np.asarray(scene.materials.albedo).shape[0])
        seed, rr = cfg.seed, cfg.russian_roulette
        depth = cfg.traversal_stack_depth
        pps = cfg.pallas_packets_per_step
        pipe = cfg.pallas_leaf_pipeline
        sbatch = cfg.pallas_slab_batch
        rskip = cfg.pallas_row_skip
        mtp = cfg.pallas_mt_point
        mtx = cfg.pallas_mt_mxu

        def bounce_bind(acc):
            def bounce(o, d, thr, rad, alive, pix, skey, bounce_i):
                return pallas_trace_bounce(
                    o, d, thr, rad, alive, pix, acc, mtab, skey, bounce_i,
                    num_materials=num_m, seed=seed, russian_roulette=rr,
                    stack_depth=depth, packets_per_step=pps,
                    leaf_pipeline=pipe, slab_batch=sbatch, row_skip=rskip,
                    mt_point=mtp, mt_mxu=mtx,
                )

            if cfg.wave_compact_group > 0:
                from tracy_tpu.accel.reorder import compact_bounce

                return compact_bounce(bounce, cfg.wave_compact_group)
            return bounce

        self._bounce_bind = bounce_bind
        if cfg.wave_compact_group > 0 and cfg.wave_compact_skip_first:
            def bounce_bind_first(acc):
                def bounce(o, d, thr, rad, alive, pix, skey, bounce_i):
                    return pallas_trace_bounce(
                        o, d, thr, rad, alive, pix, acc, mtab, skey,
                        bounce_i, num_materials=num_m, seed=seed,
                        russian_roulette=rr, stack_depth=depth,
                        packets_per_step=pps, leaf_pipeline=pipe,
                        slab_batch=sbatch, row_skip=rskip, mt_point=mtp,
                        mt_mxu=mtx,
                    )

                return bounce

            self._bounce_bind_first = bounce_bind_first

    def _step_impl(self, scene: SceneArrays, state: RenderState, accel,
                   shade_data):
        bf = self._bounce_bind(accel) if self._bounce_bind else None
        bf1 = (self._bounce_bind_first(accel)
               if self._bounce_bind_first else None)
        i1 = self._bind_first(scene, accel) if self._bind_first else None
        sf = self._shade_bind(shade_data) if self._shade_bind else None
        return render_step(scene, state, self.cfg, self._bind(scene, accel),
                           shade_fn=sf, bounce_fn=bf,
                           first_intersect_fn=i1, first_bounce_fn=bf1)

    def _steps_impl(self, scene: SceneArrays, state: RenderState, accel,
                    shade_data, num_steps: int):
        """`num_steps` progressive frames inside ONE device program — the
        per-dispatch overhead (~30ms through the axon tunnel, measured)
        amortizes across frames."""
        isect = self._bind(scene, accel)
        bf = self._bounce_bind(accel) if self._bounce_bind else None
        bf1 = (self._bounce_bind_first(accel)
               if self._bounce_bind_first else None)
        i1 = self._bind_first(scene, accel) if self._bind_first else None
        sf = self._shade_bind(shade_data) if self._shade_bind else None

        def body(_, carry):
            st, rays = carry
            st2, r = render_step(scene, st, self.cfg, isect,
                                 shade_fn=sf, bounce_fn=bf,
                                 first_intersect_fn=i1, first_bounce_fn=bf1)
            return st2, rays + r

        return jax.lax.fori_loop(
            0, num_steps, body, (state, jnp.zeros((), jnp.int32))
        )

    def reset(self) -> RenderState:
        self.total_rays = 0.0
        self.timer.reset()
        return init_state(self.cfg)

    def step(self, scene: SceneArrays, state: RenderState):
        self._ensure_accel(scene)
        self.timer.begin()
        state, rays = self._jit_step(scene, state, self._accel_data,
                                     self._shade_data)
        state.accum.block_until_ready()
        self.timer.end()
        self.total_rays += float(rays)
        return state, rays

    def step_many(self, scene: SceneArrays, state: RenderState, num_steps: int):
        """num_steps progressive frames in one device dispatch."""
        self._ensure_accel(scene)
        self.timer.begin()
        state, rays = self._jit_steps(scene, state, self._accel_data,
                                      self._shade_data, num_steps)
        state.accum.block_until_ready()
        self.timer.end()
        self.total_rays += float(rays)
        return state, rays

    def render_progressive(self, scene: SceneArrays, frames: int,
                           state: Optional[RenderState] = None,
                           steps_per_dispatch: int = 4):
        """Run `frames` progressive steps; returns the final state.

        Prefer spp=1 configs with more frames on TPU — the sample axis then
        advances via the frame counter (statistically identical) and each
        step stays a single well-tested device program.
        """
        state = init_state(self.cfg) if state is None else state
        done = 0
        while done < frames:
            k = min(steps_per_dispatch, frames - done)
            state, _ = self.step_many(scene, state, k)
            done += k
        return state

    def display(self, state: RenderState) -> np.ndarray:
        return np.asarray(film.tonemap(state.accum, self.cfg))

    def display_u8(self, state: RenderState) -> np.ndarray:
        return np.asarray(film.to_u8(film.tonemap(state.accum, self.cfg)))

    @property
    def mrays_per_sec(self) -> float:
        t = self.timer.total
        return (self.total_rays / 1e6) / t if t > 0 else 0.0
