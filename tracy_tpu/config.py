"""Runtime render configuration.

The reference exposes its knobs as a two-tier config: argv flags (`-scene`,
`-kernel`) plus a large compile-time CMake-cache -> preprocessor-define layer
(reference `CMakeLists.txt:23-116,169-215`: tonemap operator, exposure, max
bounces, russian roulette, sample accumulation, acceleration structure choice,
AOV debug views, RNG algorithm, tiling). TPU-natively all of those become one
runtime dataclass — everything is a `jit`-static field, so flipping a knob just
triggers a retrace instead of a rebuild.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


# AOV debug views, mirroring DEBUG_SHOW_* of reference CMakeLists.txt:23-35 /
# cpu_trace.cpp:127-137.
AOV_BEAUTY = "beauty"
AOV_BASECOLOR = "basecolor"
AOV_NORMALS = "normals"
AOV_METALNESS = "metalness"
AOV_ROUGHNESS = "roughness"
AOV_EMISSIVE = "emissive"
AOV_DEPTH = "depth"  # extra (not in reference): hit distance
AOVS = (
    AOV_BEAUTY,
    AOV_BASECOLOR,
    AOV_NORMALS,
    AOV_METALNESS,
    AOV_ROUGHNESS,
    AOV_EMISSIVE,
    AOV_DEPTH,
)

TONEMAP_NONE = "none"
TONEMAP_SRGB = "srgb"
TONEMAP_ACES = "aces"
TONEMAP_REINHARD = "reinhard"
TONEMAPS = (TONEMAP_NONE, TONEMAP_SRGB, TONEMAP_ACES, TONEMAP_REINHARD)

ACCEL_NONE = "none"  # brute force over all triangles (reference CUDA kernel behavior)
ACCEL_BVH = "bvh"  # per-ray-stack BVH traversal (gather-bound on TPU; CPU-fine)
ACCEL_PACKET = "packet"  # packet traversal — gather-free, the TPU default
ACCEL_TLAS = "tlas"  # two-level TLAS/BLAS, stitched flat -> packet traversal
ACCELS = (ACCEL_NONE, ACCEL_BVH, ACCEL_PACKET, ACCEL_TLAS)

RNG_FAST = "fast"  # counter-based PCG-style hash (cheap, TPU friendly)
RNG_XORSHIFT = "xorshift"  # xorshift32 permutation (reference random.h:22)
RNG_LCG = "lcg"  # Numerical-Recipes LCG (reference random.h:36)
RNG_THREEFRY = "threefry"  # jax.random keyed per (pixel, frame, bounce)
RNGS = (RNG_FAST, RNG_XORSHIFT, RNG_LCG, RNG_THREEFRY)


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static configuration of a render. Hashable; safe as a jit-static arg."""

    width: int = 640
    height: int = 480

    # Path tracing quality — defaults match reference CMakeLists.txt:92-116.
    max_bounces: int = 5
    russian_roulette: bool = True
    accumulate: bool = True
    spp: int = 1  # samples per pixel per call (reference: 1 per frame, progressive)

    # Post-processing — reference TRACY_TONEMAPPING / TRACY_EXPOSURE.
    tonemap: str = TONEMAP_SRGB
    exposure: float = 1.0

    # Debug AOV view (reference DEBUG_VIEW).
    aov: str = AOV_BEAUTY

    # Intersection backend.
    accel: str = ACCEL_PACKET
    bvh_leaf_size: int = 8
    traversal_stack_depth: int = 40
    packet_leaf_size: int = 64  # dense-test granularity for accel='packet'
    packet_size: int = 1024  # rays per shared-stack packet
    # BVH leaf size for the Pallas kernel build. The kernel's leaf test is a
    # fixed 128-wide chunk regardless of count, so bigger leaves mean
    # strictly fewer leaf visits at identical per-visit cost (dragon wave-2:
    # 244 -> 210 leaf visits/packet, 653 -> 470 inner, tools/traversal_stats).
    pallas_leaf_size: int = 128
    # Winner-readback window, in 128-slot chunks (power of two). Each
    # readback iteration DMAs and resolves one WINDOW of adjacent chunks;
    # chunks pack in BVH tree order, so clustered winners collapse into
    # fewer iterations on incoherent waves (the measured phase-2 dominator).
    pallas_rb_window: int = 1
    # Software-pipelined winner readback: each loop iteration resolves two
    # windows with alternating VMEM buffers so one window's attr DMA
    # overlaps the other's gathers.
    pallas_rb_prefetch: bool = False
    # Winner extraction mechanism: 'take' = Mosaic in-tile dynamic gather
    # (rb_window=1 only; serializes ~per lane), 'onehot' = exact MXU
    # one-hot contraction (any window width).
    pallas_rb_gather: str = "take"
    # Phase-2 loop structure: 'minloop' extracts the next distinct winning
    # chunk per iteration (vector->scalar min + mask: a serial chain that
    # measures ~7us/iteration on v5e regardless of body work); 'list'
    # records improving leaf chunks in an SMEM list during traversal and
    # resolves them in a counter-bounded fori (control never touches
    # vector state); 'arena' additionally batches the list's chunk DMAs
    # all-in-flight into a VMEM arena and resolves with a static unrolled
    # vector loop; 'fused' resolves attributes AT EVERY LEAF VISIT with
    # pure vector ops — no phase 2, no scalar read of vector state
    # anywhere (any such read drains the vector pipeline: the measured
    # ~170us/packet incoherent-wave dominator that the other modes only
    # relocated); 'mt' goes further and min-extracts the interpolated
    # attributes INSIDE the MT row loop via its one-hot winner masks —
    # zero dynamic gathers ('fused''s per-visit take_along_axis resolve
    # measured ~2.6us/leaf visit, 72% of incoherent live-packet cost).
    # 'list'/'arena'/'fused'/'mt' require rb_window=1, no prefetch.
    # Default 'vlist': the fastest measured mode on the dragon headline
    # (round-3 sessions T-W; ~equal to 'fused' once row_skip landed);
    # only the TPU Pallas path consumes this knob.
    pallas_rb_mode: str = "vlist"

    # RNG algorithm (reference CPU_RAND_ALGORITHM).
    rng: str = RNG_FAST
    seed: int = 0xABCDEF  # reference random.h fixed seed

    # Ray chunking: rays per device-side wavefront chunk (0 = all at once).
    ray_chunk: int = 0

    # Per-wave live-ray compaction block (rays; 0 = off). Power of two,
    # a multiple of packet_size: each bounce, live rays are routed to the
    # front of every block by the gather-free butterfly in accel/reorder.py
    # so late waves hit few dense packets instead of many sparse ones.
    # Applies to the rich packet intersectors (accel='packet'/'tlas').
    wave_compact_group: int = 0
    # Peel bounce 0 out of the compacted bounce scan: the primary wave is
    # all-live, so its butterfly routing is an identity permutation — pure
    # overhead (2 full routings/sample). Bit-identical by construction;
    # only meaningful when wave_compact_group > 0.
    wave_compact_skip_first: bool = True

    # Pallas kernels (TPU only; automatic XLA fallback when the scene doesn't
    # fit the kernel's VMEM budget or the backend is CPU).
    use_pallas: bool = True
    # Packets per Pallas grid step. The kernel unrolls packets with static
    # indices (dynamic block indexing serializes on Mosaic, ~50us/packet);
    # keep small — the per-grid-step overhead is negligible (measured) and
    # big values inflate compile time linearly.
    pallas_packets_per_step: int = 2

    # Rays per Pallas packet (8/16/32 sublanes x 128 lanes). Wider packets
    # amortize the traversal's SERIAL per-visit cost (vector->scalar
    # drains + stack scalar ops) over more rays: per-ray inner visits drop
    # ~3x from 1024 to 4096 at wave-2 incoherence (tools/traversal_stats),
    # while the added vector work rides the underutilized VPU. Results are
    # ray-wise identical for any value. 1024/2048/4096 measured
    # 8.46/8.62/9.18 dragon 1080p in round 4 (wide packets flipped
    # POSITIVE once row_skip landed: the extra rows are mostly masked
    # off); default 4096.
    pallas_packet_rays: int = 4096

    # Batch the traversal's per-child slab min-reductions into ONE fused
    # vector->scalar drain per inner visit (bit-identical: min is exact
    # and order-independent). The per-child scalar reads each pay the
    # full drain of the preceding vector chain (~4 drains/visit at
    # width 4 = the measured inner-visit dominator, session V: inner
    # 85 -> ~48 us/packet, headline 5.04 -> 5.44, session W).
    pallas_slab_batch: bool = True

    # ROW SKIP: push an 8-bit per-row mask with every stack entry (bit r
    # set iff some lane of ray-row r passed the child's slab test) and run
    # the leaf MT row loop only for masked-live rows. EXACT, not a
    # heuristic: child AABBs nest inside parent AABBs and best_t only
    # tightens, so a ray that missed a node's box at push time can never
    # hit a triangle inside it. At wave-2 incoherence most of a leaf's 8
    # rows carry no ray that touched its box — this cuts the MT row-loop
    # dominator (~119 us/packet, 60% of wave-2 cost, NOTES.md round 3) at
    # row granularity. The masks ride the slab_batch reduction (one extra
    # small reduce on an already-drained vector); requires
    # pallas_slab_batch (silently off otherwise).
    pallas_row_skip: bool = True

    # Batched texel-page fetch: the textured shade stage's page loop
    # extracts up to N candidate pages per vector->scalar drain (per-row
    # mins; 16 masks the first round's winners and reduces again on the
    # same drained chain) and issues their 8 KB DMAs all-in-flight — the
    # serial per-distinct-page drain + DMA wait measured as the helmet
    # bound (53.6 pages/packet, BASELINE.md round-4 SoL). 0 = simple
    # per-page drain loop; 8/16 = candidates per drain. Bit-identical.
    # Default 16 (session L2: helmet 21.35 -> 21.80, on-chip parity OK).
    pallas_texfetch_batch: int = 16

    # VMEM budget for the Pallas kernel's RESIDENT BVH node tables (the
    # per-triangle tables stream from HBM). ~2.6 B/triangle at the default
    # chunk-SAH leaf width incl. the 4-wide tables, so 6 MB holds ~2.4M
    # triangles (a 520K-tri scene measures 0.7 MB); scenes past the budget
    # fall back to the XLA packet path with a loud RuntimeWarning
    # (~10-30x slower). Round 4 originally capped this at 2.5 MB because
    # >=3 MB tables 500'd the remote compile service; those 500s decoded
    # as scoped-vmem OOMs (XLA's DEFAULT scoped budget is 16 MiB of the
    # 128 MiB VMEM) and the renderer now auto-raises the limit to 96 MiB
    # for big tables (validated on chip: 5.4 MB tables render at
    # 720p/1080p, sessions P2/Q2).
    pallas_vmem_budget: int = 6 * 1024 * 1024

    # Point-form Möller–Trumbore: compute the hit point p = o + t d once
    # per (tri, ray) and evaluate u/v as single R-row contractions of p —
    # 11 plane ops for both coordinates vs the two-chain form's 26.
    # Algebraically identical, ulp-different (winner flips possible on
    # knife edges): a statistical-parity knob like woop_bf16, validated
    # by the on-chip gate + 9-scene parity rather than bit-identity.
    # Default ON since round 4 (neutral at 1024-ray packets, +0.9% at the
    # 4096 default where the MT row loop is ~49% of wave-2; parity
    # metrics are unchanged to 4 decimals on every scene checked).
    pallas_mt_point: bool = True

    # PAIR-MERGE sparsity routing (accel/reorder.py pair_merge_*): move
    # sparse late-wave survivors into sibling packets' dead lanes with
    # O(rounds*probes) elementwise selects instead of the butterfly's
    # log2(group) full routing stages. Targets traversal-light scenes
    # that run compaction OFF (helmet regime): fully-dead merged packets
    # cost nothing (block_skip) and survivors run denser. 0 = off;
    # N = merge rounds (stride doubles per round). Bit-exact per ray up
    # to packet-composition tie winners (the accepted statistical class).
    pallas_pair_merge: int = 0
    pallas_pair_probes: int = 3

    # TWO-POP inner batching: when the popped stack entry AND the next
    # one are both inner nodes, resolve both with ONE drained [sub, 2W]
    # slab reduction (the drain is ~60% of inner-visit cost). The second
    # node is slab-tested before the first's subtree tightened best_t:
    # a few extra child visits (modeled +2.7% inner / +2.9% leaf on
    # dragon wave-2 for -44% drains, tools/twopop_model.py) and equal-t
    # tie winners can flip -> statistical-parity knob like mt_point.
    # Measured round 5 (in-session A/B, median-of-3): dragon 9.335 vs
    # 9.270 (+0.7%), bunny 11.90 vs 11.82 (+0.7%), helmet 39.33 vs
    # 39.33 (exactly neutral) — small but consistently non-negative;
    # default ON (the model's +4% didn't materialize: the fused
    # [sub,2W] reduce's extra vector work eats most of the saved drain).
    pallas_two_pop: bool = True

    # Dead-step BLOCK SKIP: late compacted waves are mostly all-dead
    # packets, and even the in-kernel dead-packet fast path pays the full
    # block-pipeline machinery (in/out block DMAs + grid step). With
    # block_skip a prefetched step map routes every dead grid step's
    # in/out block indices to the previous live step's — the pipeline
    # re-fetches nothing, the body is guarded off, and the XLA side
    # substitutes the exact miss constants the fast path would have
    # written. Bit-identical to off (tested); speed-only. Default ON
    # (helmet +2.5% at compact=0 — dead packets cluster naturally when
    # rays die at bounce 1; dragon neutral; sessions V2/X2).
    pallas_block_skip: bool = True

    # MXU Möller–Trumbore transform: evaluate the whole per-row Woop
    # transform (o'u/d'u/o'v/d'v/o'z/d'z) as ONE [3*128,4] @ [4,256]
    # contraction on the systolic array instead of ~26 serial VPU plane
    # ops. '' = off (VPU chains); 'default' = one bf16 pass, 'high' =
    # error-compensated bf16x3, 'highest' = bf16x6 (~f32). Like
    # woop_bf16/mt_point this changes accept-test ulps -> statistical-
    # parity knob (gate variants + tpu_parity validate on chip).
    pallas_mt_mxu: str = ""

    # Defer winner-u/v extraction out of the MT row loop (vlist only):
    # phase 2 re-gathers the winner's Woop coefficient columns and
    # recomputes u/v from the stored winner t with the SAME expression
    # tree (oh1 + two masked sublane min-reduces per row leave the loop;
    # measured 9.6 us/packet at wave 2, session X).
    # Default ON (round 4: 8.32 -> 8.46 MRays/s); silently inert unless
    # rb_mode == 'vlist' (the renderer guards the combination).
    pallas_defer_uv: bool = True

    # Pallas traversal branching factor: 4 collapses the binary BVH to
    # 4-wide nodes (halves stack pops on the dragon: 316 -> 160 inner
    # visits/packet, identical leaf visits) at ~1.7x the slab math per
    # pop. Results identical (same closest-hit minima).
    pallas_bvh_width: int = 4

    # bf16-pair-pack the Woop triangle-transform rows of the fused table
    # (12 -> 6, pad8 -> 8): the per-leaf-visit DMA drops from 24 to 16
    # rows — the measured per-visit cost lever (NOTES.md session P).
    # LOSSY: ~0.2% coefficient error moves intersection t/u/v, so renders
    # are statistically (not bit-) identical to the f32 path. Opt-in
    # speed mode; ignored by the XLA/differentiable intersectors.
    pallas_woop_bf16: bool = False

    # Software-pipelined leaf processing in the Pallas packet kernel:
    # a leaf's chunk DMA is started at DISCOVERY and its MT test runs when
    # the NEXT leaf is found (or at traversal end), overlapping the DMA
    # with inner-node work. Bit-identical results (best-t tightening lags
    # one leaf — pruning hint only). Requires pallas_rb_mode='fused'.
    pallas_leaf_pipeline: bool = False

    # FUSED bounce megakernel: intersect + shade in ONE Pallas kernel per
    # wave (ops/pallas_packet.pallas_trace_bounce) — the wavefront state
    # never round-trips HBM between intersection and shading. Same
    # eligibility as use_pallas_shade plus rb_mode='fused'; supersedes the
    # two-stage path when it engages. Bit-identical (tested).
    use_pallas_bounce: bool = False

    # On-core shading stage (ops/pallas_shade.py): run the whole bounce's
    # material lookup + scatter + sky + RR + RNG as a Pallas kernel on the
    # wavefront planes. Engages only when ALL of: TPU backend, use_pallas,
    # accel packet/tlas, beauty AOV, untextured scene, <=128 materials —
    # otherwise the bit-identical XLA shading math runs. Not differentiable
    # (training paths construct their own intersectors and never see it).
    use_pallas_shade: bool = True

    # Compute dtype for shading math.
    dtype: str = "float32"

    def __post_init__(self):
        if self.tonemap not in TONEMAPS:
            raise ValueError(f"unknown tonemap {self.tonemap!r}; pick one of {TONEMAPS}")
        if self.aov not in AOVS:
            raise ValueError(f"unknown AOV {self.aov!r}; pick one of {AOVS}")
        if self.accel not in ACCELS:
            raise ValueError(f"unknown accel {self.accel!r}; pick one of {ACCELS}")
        if self.rng not in RNGS:
            raise ValueError(f"unknown rng {self.rng!r}; pick one of {RNGS}")
        if self.max_bounces < 1:
            raise ValueError("max_bounces must be >= 1")
        if self.spp < 1:
            raise ValueError("spp must be >= 1")
        g = self.wave_compact_group
        if g and (g & (g - 1) or g % self.packet_size):
            raise ValueError(
                "wave_compact_group must be a power of two multiple of "
                f"packet_size, got {g}"
            )
        rbw = self.pallas_rb_window
        if rbw not in (1, 2, 4, 8):
            raise ValueError(
                f"pallas_rb_window must be 1, 2, 4 or 8, got {rbw}"
            )
        if self.pallas_rb_gather not in ("take", "onehot"):
            raise ValueError("pallas_rb_gather must be 'take' or 'onehot'")
        if rbw > 1 and self.pallas_rb_gather != "onehot":
            raise ValueError(
                "pallas_rb_window > 1 requires pallas_rb_gather='onehot' "
                "(Mosaic's dynamic gather is in-tile / 128 lanes)"
            )
        if self.pallas_rb_mode not in ("minloop", "list", "arena", "vlist",
                                       "fused", "mt"):
            raise ValueError(
                "pallas_rb_mode must be 'minloop', 'list', 'arena', "
                f"'vlist', 'fused' or 'mt', got {self.pallas_rb_mode!r}"
            )
        if self.pallas_bvh_width not in (2, 4, 8):
            raise ValueError("pallas_bvh_width must be 2, 4 or 8")
        if self.pallas_packet_rays not in (1024, 2048, 4096, 8192):
            raise ValueError(
                "pallas_packet_rays must be 1024, 2048, 4096 or 8192")
        if self.pallas_leaf_pipeline and self.pallas_rb_mode != "fused":
            raise ValueError(
                "pallas_leaf_pipeline requires pallas_rb_mode='fused'"
            )
        if self.pallas_rb_mode in ("list", "arena", "vlist", "fused",
                                   "mt") and (
                rbw != 1 or self.pallas_rb_prefetch):
            raise ValueError(
                f"pallas_rb_mode={self.pallas_rb_mode!r} requires "
                "pallas_rb_window=1 and pallas_rb_prefetch=False"
            )

    @property
    def resolution(self) -> Tuple[int, int]:
        return (self.width, self.height)

    @property
    def num_pixels(self) -> int:
        return self.width * self.height

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)
