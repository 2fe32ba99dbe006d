"""Pallas TPU kernel: packet BVH traversal + leaf intersection + attributes.

The XLA packet path (accel/packet.py) is correct but pays multi-microsecond
per-iteration overheads (op dispatch, conditionals, tiny MXU calls). This
kernel runs the same algorithm on-core:

* grid = one step per packet of 1024 rays, laid out as [8, 128] vreg planes;
* the NODE tables (bounds + meta) live in VMEM; the per-triangle tables
  (Woop transforms + attributes) live in HBM and are DMA'd into VMEM
  scratch one 128-slot leaf chunk at a time. The VMEM budget therefore
  scales with node count only: 48 B/node binary + 128 B/4-wide node,
  ~1.3 B/triangle measured at the default chunk-SAH leaf width (115
  tris/leaf on the dragon) -> the 8 MB budget holds ~6M triangles.
  Larger scenes fall back to the XLA packet path (with a loud warning:
  the fallback is ~10-30x slower);
* the shared traversal stack is an SMEM scratch array with a scalar sp in
  the while-loop carry; node fetches are scalar-indexed VMEM reads;
* a leaf visit intersects its whole 128-slot chunk in a [128 tris,
  128 rays] vreg tiling, one ray-row at a time: Möller–Trumbore, min-reduce
  over the sublane (triangle) axis, first-match one-hot, and attribute
  interpolation as masked multiply-sums — everything stays in vector
  registers. Per-visit cost is count-independent, so the BVH is built with
  WIDE leaves (config.pallas_leaf_size=128: fewer visits, same visit cost);
* outputs: t, barycentric u/v, hit mask, and interpolated normal/uv/
  material (+tangent when normal maps are present), as [packets, C, 8, 128]
  planes;
* winner-attribute readback comes in six measured structures (`rb_mode`:
  minloop/list/arena/vlist/fused/mt — see config.py); 'vlist' (batched
  phase-2 resolve over a traversal-recorded visit list) is the
  production default, with `defer_uv` recomputing winner u/v there;
* ROW SKIP (the round-4 headline lever, +53%): every stack entry carries
  per-ray-row slab masks and the leaf MT row loop runs only live rows —
  exact by AABB nesting + monotone best_t;
* `leaf_pipeline` double-buffers the leaf chunk DMA (start at discovery,
  MT at the next leaf) so the copy overlaps inner-node traversal;
* `pallas_trace_bounce` fuses the WHOLE bounce (this traversal + the
  shading step of ops/pallas_shade.py, incl. in-kernel counter RNG) into
  one megakernel for untextured scenes — the TPU-native analogue of the
  reference CUDA megakernel (cuda_trace.cu:73-135).

The kernel has no VJP of its own. `nondiff_intersector` wraps it in a
zero-gradient custom_vjp that is exact for material/texture/emissive
inverse rendering (those gradients flow through the kernel's discrete
outputs). Geometry optimization ALSO runs on this kernel: the winner-slot
output plane + `slot_tri` feed diff/gradients.GeometryDiffIntersector,
which recomputes t/uv/normal differentiably at the detached winning
triangle. Interpret mode works on CPU for correctness tests.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tracy_tpu.core import math as tm
from tracy_tpu.render.intersect import FLT_MAX, Hit
from tracy_tpu.accel.packet import PackedBVH, PacketAttrs

# Probe-only ablation knobs (comma list): 'noleaf' skips leaf visits
# entirely, 'nodma' skips the per-leaf chunk DMAs (stale scratch data),
# 'noreadback' skips winner gathers/attribute interpolation, 'nomt' skips
# the MT row loop, 'notrav' skips the traversal while-loop entirely
# (isolates per-packet plumbing: ray reads + acc init + out writes),
# 'noout' writes only the t plane, 'noinit' skips the acc scratch init.
# Phase-2 (readback) bisection: 'nodma2' skips the per-chunk attr DMA,
# 'nogather2' replaces the in-row winner gathers with broadcasts,
# 'noput2' skips interpolation + output-plane selects (the loop still
# walks every distinct chunk), 'nobody2' empties the list/arena loop body
# entirely (skeleton cost only), 'dmaonly2' keeps only the DMA in the
# list body, 'noresolve2' skips the arena's static resolve, 'noappend'
# skips the traversal-side chunk-list append (list/arena/vlist),
# 'nofastpath' disables the dead-packet fast path, 'dma16' copies only
# the woop rows of the fused table, 'countvisits'
# overwrites the t plane with the packet's LEAF visit count and the u
# plane with its INNER visit count (borrows rbl SMEM slots — minloop
# rb_mode only). Results are WRONG under ablation — perf bisection only
# (tools/tpu_probe_r2.py).
_ABLATE = frozenset(
    x for x in os.environ.get("TRACY_PALLAS_ABLATE", "").split(",") if x
)
# Every timing-probe token the kernel recognizes. An UNKNOWN token must
# fail loudly: a silently-ignored one runs the FULL kernel and the probe
# reports full-kernel numbers under the ablation's name — this exact
# artifact produced round 2's dead-wave baselines AND round 4's phantom
# "emptybody machinery floor" (session J2 ran from a snapshot predating
# the emptybody token; its 480us/packet "emptybody" was the full kernel).
_ABLATE_KNOWN = frozenset((
    "countrb", "countvisits", "dma16", "dmaonly2", "emptybody", "mtnotr",
    "mtnouv", "mtnowin", "mtnoxy", "noappend", "nobody2", "nodma",
    "nodma2", "nofastpath", "nogather2", "noinit", "noleaf", "nomt",
    "noout", "noput2", "noreadback", "noresolve2", "notrav",
))
if not _ABLATE <= _ABLATE_KNOWN:
    raise ValueError(
        f"unknown TRACY_PALLAS_ABLATE tokens {sorted(_ABLATE - _ABLATE_KNOWN)}"
        " — a silently-ignored token would report full-kernel numbers"
        f" under the ablation's name (known: {sorted(_ABLATE_KNOWN)})")

LEAF = 128  # static leaf window; every leaf owns an ALIGNED 128-slot chunk
# (Mosaic vector loads from the lane dimension must be 128-aligned)
PACKET = 1024  # rays per packet: [8, 128]
# Rows 0..11 of the fused per-triangle table are the Woop transform
# (pad8 -> 16); attribute rows start here. Attrs ride in the SAME
# HBM array so a leaf visit is ONE DMA + ONE wait: a second per-visit
# semaphore wait measured ~2.6us (it drains the in-flight vector chain,
# the same law as scalar reads of vector state) — 170us/packet at
# incoherence, the round-2 session-P dominator.
WOOP_ROWS = 16
# rb_mode='list'/'arena' chunk-list capacity (SMEM i32 entries per packet).
# Sized above the worst measured improving-leaf-visit count; overflow falls
# back to the min-extract loop (correct, just slower).
LIST_CAP = 510
# rb_mode='arena' VMEM arena size in 128-slot chunks: one batch of DMAs is
# issued all-in-flight, then a STATIC unrolled resolve walks the arena.
# Batches repeat while list entries remain (kk p50=24, p90=67 on dragon
# wave 2), so the cap bounds VMEM, not correctness.
ARENA_BATCH = 32
EPS = float(tm.EPS)
BIG = 3.4028235e38

# MXU MT-transform precision menu (config.pallas_mt_mxu): TPU f32 matmuls
# decompose into bf16 passes — 1 ('default'), 3 error-compensated ('high'),
# 6 (~f32, 'highest').
_MXU_PREC = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class PallasSceneTables:
    """VMEM-resident scene: everything the kernel needs, as flat planes.

    A registered pytree whose layout flags are STATIC aux data — the
    tables flow through jit as arguments (Renderer passes them as the
    step's accel operand), and NamedTuple fields would get traced."""

    node_bounds: jnp.ndarray  # [Nn, 8] f32
    node_meta: jnp.ndarray  # [Nn, 4] i32
    # ONE fused per-triangle HBM table. Rows 0..11 (pad8 -> WOOP_ROWS=16):
    # Woop affine rows (R_k0,R_k1,R_k2,b_k) k=0..2. Rows 16..: attributes —
    # uv corners (6 f32 rows, ONLY when some non-sky material has a
    # texture), material (1 f32 row), then bf16 PAIRS bitcast into f32
    # lanes ((hi<<16)|lo): normal corners 9 -> 5 rows[, tangent corners
    # 9 -> 5 rows]. bf16 packing halves the per-chunk readback work (a
    # bf16 value is exactly the top half of an f32). One array so a leaf
    # visit is ONE DMA + ONE semaphore wait (see WOOP_ROWS).
    tab: jnp.ndarray  # [16 + (8|16|24), Tpad] f32
    # Host-side slot -> original triangle id (not a kernel input): consumed
    # by the winner-recompute differentiable intersector (diff/gradients.py)
    # to map the kernel's winner-slot output back to scene.indices rows.
    slot_tri: jnp.ndarray  # [Tpad] i32
    # 4-WIDE traversal tables (width=4 only; (1, .) dummies otherwise):
    # per 4-wide node, 4 child bboxes [N4, 24] f32 (invalid children get
    # inverted never-hit bounds) and 4 child entries [N4, 8] i32 as
    # (val, tag) pairs — tag 0: val = 4-wide child id; tag 1: val = the
    # child LEAF's node id in the (realigned) BINARY node_meta, so the
    # leaf path is shared verbatim between widths; tag -1: no child.
    # Collapsing the binary tree to branching factor 4 halves stack pops
    # on the dragon (316 -> 160 inner visits/packet, wave-2 replay) at
    # identical leaf visits.
    node4_bounds: jnp.ndarray = None  # [N4, 24] f32
    node4_meta: jnp.ndarray = None  # [N4, 8] i32
    # Static layout flags (NOT shape-derived: packed and flat layouts can
    # pad to the same row count).
    has_uv: bool = True
    has_tangent: bool = False
    # bf16-pair packing of normal/tangent rows. Required FLAT (False) for
    # the 'onehot' readback: packed bit patterns can be denormal f32s,
    # which the MXU contraction flushes to zero (a take_along gather is a
    # pure permute and preserves bits).
    packed: bool = True
    width: int = 2  # traversal branching factor (2 or 4)
    # Deepest 4-wide inner-node chain (root = 1; 0 when width == 2). Each
    # inner pop pushes up to 4 entries, so a DFS holds at most
    # 3*depth4 + 1 stack slots — pallas_intersect auto-raises its SMEM
    # stack to that bound (the binary sizing rule max_depth=stack_depth-4
    # does NOT bound 4-wide occupancy; a silent clamp would corrupt pops).
    depth4: int = 0
    # bf16-pair packing of the WOOP rows themselves (12 -> 6, pad8 -> 8):
    # shrinks the per-leaf-visit DMA from 24 to 16 rows — the measured
    # cost lever (session P: per-visit cost tracks DMA row count, 16-row
    # noreadback 66us/packet vs 24-row 232us). LOSSY: intersection t/u/v
    # carry ~0.2% bf16 coefficient error, so this is an opt-in speed mode
    # (cfg.pallas_woop_bf16) validated by statistical image parity, NOT
    # bit-identity.
    woop_bf16: bool = False

    def tree_flatten(self):
        return (
            (self.node_bounds, self.node_meta, self.tab, self.slot_tri,
             self.node4_bounds, self.node4_meta),
            (self.has_uv, self.has_tangent, self.packed, self.width,
             self.woop_bf16, self.depth4),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        (nb, nm, tab, slot_tri, n4b, n4m) = children
        (has_uv, has_tangent, packed, width, woop_bf16, depth4) = aux
        return cls(nb, nm, tab, slot_tri, n4b, n4m,
                   has_uv=has_uv, has_tangent=has_tangent, packed=packed,
                   width=width, woop_bf16=woop_bf16, depth4=depth4)

    @property
    def woop_rows(self) -> int:
        return 8 if self.woop_bf16 else WOOP_ROWS

    @property
    def with_tangent(self) -> bool:
        return self.has_tangent

    @property
    def vmem_bytes(self) -> int:
        """VMEM-resident bytes: node tables only — the per-triangle tables
        live in HBM and are DMA'd per leaf chunk."""
        n4 = (self.node4_bounds.size + self.node4_meta.size
              if self.node4_bounds is not None else 0)
        return (self.node_bounds.size + self.node_meta.size + n4) * 4


def _collapse4(nb: np.ndarray, meta: np.ndarray, width: int = 4):
    """Collapse the (realigned) binary BVH to branching factor `width`.

    A wide node corresponds to a kept binary inner node; its child slots
    fill by repeatedly expanding the first inner child (FIFO) until
    `width` slots are used or every child is a leaf — so a 4-wide node is
    "each binary child if a leaf, else that child's two children", and an
    8-wide node expands one level deeper. Returns (node_bounds [N, 6W]
    f32, node_meta [N, 2W] i32, depthW) with (val, tag) child entries
    (see PallasSceneTables) and depthW = the deepest chain of wide INNER
    nodes (root = 1) — the traversal stack must hold (W-1)*depthW + 1
    entries (each inner pop pushes up to W), or None when the root is a
    leaf (nothing to collapse)."""
    if meta[0, 1] > 0:
        return None
    n4b, n4m = [], []
    idmap = {}
    stack = [0]
    idmap[0] = 0
    depth = {0: 1}
    max_depth = 1
    n4b.append(np.zeros(6 * width, np.float32))
    n4m.append(np.zeros(2 * width, np.int32))

    def is_leaf(c):
        return meta[c, 1] > 0

    while stack:
        n = stack.pop()
        me = idmap[n]
        kids = [int(meta[n, 0]), int(meta[n, 2])]
        # Level-order expansion: one binary level per round (leaves stay),
        # so width 4 = one round (bit-identical to the round-3 collapse)
        # and width 8 = two rounds. A round at most doubles the list, so
        # it can never exceed `width`.
        for _ in range(width.bit_length() - 2):
            kids = [g for c in kids
                    for g in ([c] if is_leaf(c)
                              else [int(meta[c, 0]), int(meta[c, 2])])]
        brow = np.empty(6 * width, np.float32)
        mrow = np.empty(2 * width, np.int32)
        for k in range(width):
            if k < len(kids):
                b = kids[k]
                brow[6 * k:6 * k + 6] = nb[b, 0:6]
                if is_leaf(b):
                    mrow[2 * k], mrow[2 * k + 1] = b, 1  # leaf: binary id
                else:
                    if b not in idmap:
                        idmap[b] = len(n4b)
                        n4b.append(np.zeros(6 * width, np.float32))
                        n4m.append(np.zeros(2 * width, np.int32))
                        depth[b] = depth[n] + 1
                        max_depth = max(max_depth, depth[b])
                        stack.append(b)
                    mrow[2 * k], mrow[2 * k + 1] = idmap[b], 0
            else:
                # never-hit bounds: lo > hi makes the slab test miss
                brow[6 * k:6 * k + 3] = BIG
                brow[6 * k + 3:6 * k + 6] = -BIG
                mrow[2 * k], mrow[2 * k + 1] = 0, -1
        n4b[me] = brow
        n4m[me] = mrow
    return np.stack(n4b), np.stack(n4m), max_depth


def build_tables(scene, bvh: PackedBVH, with_tangent: bool,
                 pack_pairs: bool = True, width: int = 2,
                 pack_woop: bool = False) -> PallasSceneTables:
    """Host-side packing of slot-ordered scene data into kernel planes.

    Leaves are REALIGNED: every leaf gets its own 128-slot chunk (partial
    leaves zero-padded; padding is masked by the leaf count and has det=0).
    This satisfies Mosaic's 128-lane alignment requirement for the dynamic
    window loads in the kernel.
    """
    meta = np.asarray(bvh.node_meta).copy()
    node_bounds = np.asarray(bvh.node_bounds, np.float32).copy()
    order0 = np.asarray(bvh.tri_order)
    leaf_nodes = np.where(meta[:, 1] > 0)[0]
    oversized = leaf_nodes[meta[leaf_nodes, 1] > LEAF]
    if len(oversized):
        # A leaf wider than one 128-slot chunk cannot be masked by the
        # kernel's single-chunk window — SPLIT it into a balanced binary
        # subtree of <=LEAF-count leaves (tight child boxes from the
        # slot-ordered tri bounds). Makes pallas_leaf_size > 128 a valid
        # build knob instead of silently dropping triangles (round-5
        # session I shipped a fast-because-wrong 10.9 MRays/s this way).
        pos_s = np.asarray(scene.vertex_pos, np.float32)
        tri_s = np.asarray(scene.indices)[order0]
        va, vb, vc = pos_s[tri_s[:, 0]], pos_s[tri_s[:, 1]], pos_s[tri_s[:, 2]]
        slot_min = np.minimum(np.minimum(va, vb), vc)
        slot_max = np.maximum(np.maximum(va, vb), vc)
        meta_l = meta.tolist()
        nb_l = node_bounds.tolist()
        nbw = node_bounds.shape[1]

        def brow(first, count):
            lo = slot_min[first:first + count].min(axis=0)
            hi = slot_max[first:first + count].max(axis=0)
            return list(lo) + list(hi) + [0.0] * (nbw - 6)

        work = [int(n) for n in oversized]
        while work:
            n = work.pop()
            first, count = int(meta_l[n][0]), int(meta_l[n][1])
            half = (count + 1) // 2
            l_id, r_id = len(meta_l), len(meta_l) + 1
            meta_l.append([first, half] + [0] * (len(meta_l[n]) - 2))
            nb_l.append(brow(first, half))
            meta_l.append([first + half, count - half]
                          + [0] * (len(meta_l[n]) - 2))
            nb_l.append(brow(first + half, count - half))
            meta_l[n] = [l_id, 0, r_id] + [0] * (len(meta_l[n]) - 3)
            if half > LEAF:
                work.append(l_id)
            if count - half > LEAF:
                work.append(r_id)
        meta = np.asarray(meta_l, meta.dtype)
        node_bounds = np.asarray(nb_l, np.float32)
        leaf_nodes = np.where(meta[:, 1] > 0)[0]
        assert int(meta[leaf_nodes, 1].max()) <= LEAF
    # Pack leaves into 128-slot chunks IN TREE ORDER (greedy sequential
    # first-fit: fill the current chunk until the next leaf doesn't fit).
    # The flattened BVH's leaf order is depth-first, i.e. spatially
    # coherent, so a packet's winning triangles cluster into FEW distinct
    # chunks — the phase-2 winner readback (one iteration per distinct
    # winning chunk) is the incoherent-wave dominator, and round 2's
    # first-fit-decreasing packing scattered adjacent leaves across
    # arbitrary chunks. Slot waste vs FFD is bounded by one partial leaf
    # per chunk (measured +8% chunks on the dragon). A leaf's meta[0]
    # becomes chunk*128 + sub_offset; the kernel masks
    # [sub_offset, sub_offset + count) within the chunk.
    chunk_fill = [0]  # used slots per chunk
    placement = {}
    # meta[:,0] (segment start in tri_order) is exactly the left-to-right
    # DFS position of each leaf.
    for n in leaf_nodes[np.argsort(meta[leaf_nodes, 0], kind="stable")]:
        c = int(min(meta[n, 1], LEAF))
        if chunk_fill[-1] + c > LEAF:
            chunk_fill.append(0)
        placement[n] = (len(chunk_fill) - 1, chunk_fill[-1])
        chunk_fill[-1] += c
    # Pad to a multiple of 8 chunks so windowed readback (rb_window <= 8)
    # never DMAs past the table end; padding slots are invalid (det=0).
    aligned_slots = -(-max(len(chunk_fill), 1) // 8) * 8 * LEAF
    order = np.zeros((aligned_slots,), np.int64)
    valid = np.zeros((aligned_slots,), bool)
    for n in leaf_nodes:
        f, c = int(meta[n, 0]), int(min(meta[n, 1], LEAF))
        ci, sub = placement[n]
        off = ci * LEAF + sub
        order[off : off + c] = order0[f : f + c]
        valid[off : off + c] = True
        meta[n, 0] = off
        meta[n, 1] = c

    idx = np.asarray(scene.indices)[order]
    pos = np.asarray(scene.vertex_pos, np.float64)
    nrm = np.asarray(scene.vertex_normal, np.float32)
    uv = np.asarray(scene.vertex_uv, np.float32)
    p0, p1, p2 = pos[idx[:, 0]], pos[idx[:, 1]], pos[idx[:, 2]]
    e1, e2 = p1 - p0, p2 - p0

    def plane(x):
        out = np.where(valid, np.asarray(x, np.float32), 0.0).astype(np.float32)
        return out

    # Woop unit-triangle transform per slot (f64 host precompute): with
    # B = [e1 e2 n] (columns, n = e1 x e2), R = B^-1, b = -R p0, a ray maps
    # to o' = R o + b, d' = R d; then t = -o'z/d'z, u = o'x + t d'x,
    # v = o'y + t d'y, front-facing iff d'z < 0 (det_MT = -d.n).
    n_vec = np.cross(e1, e2)
    n2 = np.einsum("ij,ij->i", n_vec, n_vec)
    ok_tri = (n2 > 1e-30) & valid
    B = np.stack([e1, e2, n_vec], axis=-1)  # [S, 3, 3]
    B_safe = np.where(ok_tri[:, None, None], B, np.eye(3)[None])
    R = np.linalg.inv(B_safe)
    R = np.where(ok_tri[:, None, None], R, 0.0)
    bvec = -np.einsum("sij,sj->si", R, p0)
    woop_vals = [
        R[:, 0, 0], R[:, 0, 1], R[:, 0, 2], bvec[:, 0],
        R[:, 1, 0], R[:, 1, 1], R[:, 1, 2], bvec[:, 1],
        R[:, 2, 0], R[:, 2, 1], R[:, 2, 2], bvec[:, 2],
    ]

    n0, n1, n2 = nrm[idx[:, 0]], nrm[idx[:, 1]], nrm[idx[:, 2]]
    u0, u1, u2 = uv[idx[:, 0]], uv[idx[:, 1]], uv[idx[:, 2]]
    mat = np.asarray(scene.tri_material)[order].astype(np.float32)

    def pack_rows(vals):
        """bf16-quantize each plane; pack pairs as (hi<<16)|lo bitcast f32.
        A lone last plane packs against zeros."""
        rows = []
        for i in range(0, len(vals), 2):
            hi = plane(vals[i])
            # bf16 bits are exactly the top half of the f32 they round to.
            hi_bits = np.asarray(
                jnp.asarray(hi, jnp.bfloat16).astype(jnp.float32)
            ).view(np.uint32) & 0xFFFF0000
            if i + 1 < len(vals):
                lo = plane(vals[i + 1])
                lo_bits = np.asarray(
                    jnp.asarray(lo, jnp.bfloat16).astype(jnp.float32)
                ).view(np.uint32) >> 16
            else:
                lo_bits = np.zeros_like(hi_bits)
            rows.append((hi_bits | lo_bits).view(np.float32))
        return rows

    # f32 rows: texture uvs (precision matters for texel addressing) + mat;
    # bf16-pair rows: shading normals (and tangents) tolerate ~0.4% error.
    # uv corner rows are OMITTED when no non-sky material references any
    # texture (sky equirect uvs come from the ray direction, not attrs.uv):
    # 6 fewer gathers per readback chunk on untextured scenes.
    tex_idx = np.asarray(scene.materials.tex_index)
    has_uv = bool((tex_idx[1:] >= 0).any()) if tex_idx.shape[0] > 1 else False
    attr_rows = []
    if has_uv:
        attr_rows += [plane(a) for a in
                      [u0[:, 0], u0[:, 1], u1[:, 0], u1[:, 1],
                       u2[:, 0], u2[:, 1]]]
    attr_rows.append(plane(mat))

    def corner_rows(vals):
        return pack_rows(vals) if pack_pairs else [plane(v) for v in vals]

    attr_rows += corner_rows([n0[:, 0], n0[:, 1], n0[:, 2],
                              n1[:, 0], n1[:, 1], n1[:, 2],
                              n2[:, 0], n2[:, 1], n2[:, 2]])
    if with_tangent and not has_uv:
        # Tangents exist only to orient normal maps, which need uvs; and the
        # shape-derived layout flags require tangent => uv.
        with_tangent = False
    if with_tangent:
        tan = np.asarray(scene.vertex_tangent, np.float32)
        t0, t1c, t2c = tan[idx[:, 0]], tan[idx[:, 1]], tan[idx[:, 2]]
        attr_rows += corner_rows([t0[:, 0], t0[:, 1], t0[:, 2],
                                  t1c[:, 0], t1c[:, 1], t1c[:, 2],
                                  t2c[:, 0], t2c[:, 1], t2c[:, 2]])
    attrs = np.stack(attr_rows)  # packed 6|12|17, flat 10|16|25 (-> pad8)

    def pad8(arr):
        # DMA slices require the (sublane) plane dimension to be a multiple
        # of the 8-row tiling.
        rows = arr.shape[0]
        pad = (-rows) % 8
        if pad:
            arr = np.concatenate(
                [arr, np.zeros((pad, arr.shape[1]), arr.dtype)], axis=0
            )
        return arr

    # pack_woop: bf16-pair the 12 Woop rows -> 6 (pad8 -> 8), halving the
    # per-visit DMA's traversal half (lossy; see PallasSceneTables).
    woop = np.stack(pack_rows(woop_vals) if pack_woop
                    else [plane(v) for v in woop_vals])
    woop = pad8(woop)
    assert woop.shape[0] == (8 if pack_woop else WOOP_ROWS)
    attrs = pad8(attrs)
    tab = np.concatenate([woop, attrs], axis=0)

    n4b = np.zeros((1, 24), np.float32)
    n4m = np.zeros((1, 8), np.int32)
    depth4 = 0
    if width in (4, 8):
        four = _collapse4(node_bounds, meta, width)
        if four is None:
            width = 2  # root is a leaf: nothing to collapse
        else:
            n4b, n4m, depth4 = four
    return PallasSceneTables(
        node_bounds=jnp.asarray(node_bounds),
        node_meta=jnp.asarray(meta.astype(np.int32)),
        tab=jnp.asarray(tab),
        slot_tri=jnp.asarray(np.where(valid, order, 0).astype(np.int32)),
        node4_bounds=jnp.asarray(n4b),
        node4_meta=jnp.asarray(n4m),
        has_uv=has_uv,
        has_tangent=with_tangent,
        packed=pack_pairs,
        woop_bf16=pack_woop,
        width=width,
        depth4=depth4,
    )


def _kernel(nb_ref, nm_ref, n4b_ref, n4m_ref, tab_ref, rays_ref, out_ref,
            stack_ref, rmask_ref, w_s, a_s, a_s2, acc_ref, rbl_ref, dma_sems,
            *, stack_depth: int, has_uv: bool, with_tangent: bool,
            num_out: int, packets_per_step: int, rb_window: int,
            rb_prefetch: bool, rb_gather: str, rb_packed: bool,
            rb_mode: str, leaf_pipeline: bool = False,
            bvh_width: int = 2, woop_bf16: bool = False,
            shade: dict = None, mtab_ref=None, sc_ref=None,
            sub: int = 8, slab_batch: bool = False,
            row_skip: bool = False, defer_uv: bool = False,
            mt_point: bool = False, mt_mxu: str = "",
            two_pop: bool = False):
    """One grid step = `packets_per_step` packets, unrolled with STATIC
    packet indices. Round 1 looped packets with fori and indexed
    rays_ref/out_ref by the traced loop index — a value-level dynamic
    block access that Mosaic serializes at ~50us PER PACKET (measured:
    23-visit coherent packets cost 55us while 897-visit incoherent ones
    cost only 294us — a flat ~50us both pay). Static indices remove it.
    rays_ref [PPS, 7, 8, 128]; out_ref [PPS, 3 + num_out, 8, 128]."""

    from tracy_tpu.ops import pallas_shade as _ps

    if shade is not None:
        sample_key = sc_ref[0].astype(jnp.uint32)
        bounce = sc_ref[1].astype(jnp.uint32)

    for pkt in range(packets_per_step):
        if shade is not None:
            # Fused bounce: intersect THEN shade in one kernel; the state
            # planes pass through verbatim for dead packets.
            any_live = jnp.max(rays_ref[pkt, _ps._S_ALIVE]) > 0.0

            @pl.when(any_live)
            def _(pkt=pkt):
                _packet_body(nb_ref, nm_ref, n4b_ref, n4m_ref, tab_ref,
                             rays_ref, out_ref, pkt, stack_ref, rmask_ref,
                             w_s, a_s,
                             a_s2, acc_ref, rbl_ref, dma_sems,
                             stack_depth=stack_depth,
                             has_uv=has_uv, with_tangent=with_tangent,
                             num_out=num_out, rb_window=rb_window,
                             rb_prefetch=rb_prefetch, rb_gather=rb_gather,
                             rb_packed=rb_packed, rb_mode=rb_mode,
                             leaf_pipeline=leaf_pipeline,
                             bvh_width=bvh_width, woop_bf16=woop_bf16,
                             shade=shade,
                             shade_keys=(sample_key, bounce),
                             mtab_ref=mtab_ref, sub=sub,
                             slab_batch=slab_batch, row_skip=row_skip,
                             defer_uv=defer_uv, mt_point=mt_point,
                             mt_mxu=mt_mxu, two_pop=two_pop)

            @pl.when(jnp.logical_not(any_live))
            def _(pkt=pkt):
                for k in range(_ps.STATE_PLANES - 1):
                    out_ref[pkt, k] = rays_ref[pkt, k]
            continue
        if "emptybody" in _ABLATE:
            # Machinery-floor probe: the packet body writes ONE constant
            # plane and nothing else (grid step + block pipeline cost
            # only; results wrong by design).
            out_ref[pkt, 0] = jnp.zeros((sub, 128), jnp.float32) - BIG
            continue
        if "nofastpath" in _ABLATE:
            # Timing bisection: run every packet body unconditionally (the
            # pre-892d708 structure; dead packets pay the ~13.7us floor).
            _packet_body(nb_ref, nm_ref, n4b_ref, n4m_ref, tab_ref,
                         rays_ref, out_ref, pkt, stack_ref, rmask_ref,
                         w_s, a_s, a_s2,
                         acc_ref, rbl_ref, dma_sems, stack_depth=stack_depth,
                         has_uv=has_uv, with_tangent=with_tangent,
                         num_out=num_out, rb_window=rb_window,
                         rb_prefetch=rb_prefetch, rb_gather=rb_gather,
                         rb_packed=rb_packed, rb_mode=rb_mode,
                         leaf_pipeline=leaf_pipeline, bvh_width=bvh_width,
                         woop_bf16=woop_bf16, sub=sub,
                         slab_batch=slab_batch, row_skip=row_skip,
                         defer_uv=defer_uv, mt_point=mt_point,
                         mt_mxu=mt_mxu, two_pop=two_pop)
            continue
        # Dead-packet fast path: per-wave compaction leaves late waves
        # mostly dead packets, and the full body's plumbing floor (ray
        # loads + acc init + out writes) measured ~13.7us even with zero
        # visits. A dead packet only needs constant miss outputs.
        any_live = jnp.max(rays_ref[pkt, 6]) > 0.0

        @pl.when(any_live)
        def _(pkt=pkt):
            _packet_body(nb_ref, nm_ref, n4b_ref, n4m_ref, tab_ref,
                         rays_ref, out_ref, pkt, stack_ref, rmask_ref,
                         w_s, a_s, a_s2,
                         acc_ref, rbl_ref, dma_sems, stack_depth=stack_depth,
                         has_uv=has_uv, with_tangent=with_tangent,
                         num_out=num_out, rb_window=rb_window,
                         rb_prefetch=rb_prefetch, rb_gather=rb_gather,
                         rb_packed=rb_packed, rb_mode=rb_mode,
                         leaf_pipeline=leaf_pipeline, bvh_width=bvh_width,
                         woop_bf16=woop_bf16, sub=sub,
                         slab_batch=slab_batch, row_skip=row_skip,
                         defer_uv=defer_uv, mt_point=mt_point,
                         mt_mxu=mt_mxu, two_pop=two_pop)

        @pl.when(jnp.logical_not(any_live))
        def _(pkt=pkt):
            zero = jnp.zeros((sub, 128), jnp.float32)
            out_ref[pkt, 0] = zero - BIG  # t: -BIG = inactive miss
            for k in range(1, 3 + num_out):
                out_ref[pkt, k] = zero  # u/v/attrs
            out_ref[pkt, 3 + num_out] = zero - 1.0  # winner slot: none


def _packet_body(nb_ref, nm_ref, n4b_ref, n4m_ref, tab_ref, rays_ref,
                 out_ref,
                 pkt, stack_ref, rmask_ref, w_s, a_s, a_s2, acc_ref, rbl_ref,
                 dma_sems,
                 *, stack_depth: int, has_uv: bool, with_tangent: bool,
                 num_out: int, rb_window: int, rb_prefetch: bool,
                 rb_gather: str, rb_packed: bool, rb_mode: str,
                 leaf_pipeline: bool = False, bvh_width: int = 2,
                 woop_bf16: bool = False, shade: dict = None,
                 shade_keys=None, mtab_ref=None, sub: int = 8,
                 slab_batch: bool = False, row_skip: bool = False,
                 defer_uv: bool = False, mt_point: bool = False,
                 mt_mxu: str = "", two_pop: bool = False):
    from tracy_tpu.ops import pallas_shade as _ps

    woop_rows = 8 if woop_bf16 else WOOP_ROWS

    # Per-plane reads (a whole-block read would materialize all 7 planes
    # into vregs before the dead-packet branch could skip them).
    ox = rays_ref[pkt, 0]
    oy = rays_ref[pkt, 1]
    oz = rays_ref[pkt, 2]
    dx = rays_ref[pkt, 3]
    dy = rays_ref[pkt, 4]
    dz = rays_ref[pkt, 5]
    active = rays_ref[pkt, _ps._S_ALIVE if shade is not None else 6] > 0.0

    def safe_inv(x):
        return jnp.clip(
            1.0 / jnp.where(jnp.abs(x) < 1e-12, jnp.float32(1e-12), x),
            -1e30, 1e30,
        )

    ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

    stack_ref[0] = 0
    if row_skip:
        # Root row mask: all rows. Rows of DEAD rays drop out one level
        # below on their own (dead lanes carry best_t = -BIG, so their
        # child slab tests never hit and never set a row bit). At sub>=32
        # the all-ones word doesn't fit a positive i32 — same BITS as -1;
        # sub=64 uses TWO words (word 1 at [stack_depth + idx]).
        rmask_ref[0] = (1 << min(sub, 32)) - 1 if sub < 32 else -1
        if sub > 32:
            rmask_ref[stack_depth] = -1
    if rb_mode in ("list", "arena", "vlist"):
        rbl_ref[0] = 0  # chunk-list count
        rbl_ref[1] = 0  # overflow flag
    if leaf_pipeline:
        rbl_ref[0] = 0  # buffer parity for the next leaf DMA
        rbl_ref[1] = -1  # pending chunk base (-1 = none)
    if "countvisits" in _ABLATE:
        rbl_ref[2] = 0  # leaf visits (probe; minloop only — list/arena
        rbl_ref[3] = 0  # inner visits  use these slots as entries)
        rbl_ref[4] = 0  # live MT rows actually run (row_skip popcounts)

    # Slim while-loop carry: (sp, best_t) ONLY. Traversal records just the
    # per-ray WINNER (chunk base + in-chunk slot) in VMEM scratch planes;
    # the expensive winner readback (attribute DMAs + ~28 in-row gathers +
    # interpolation — measured 0.8us/visit, ~75% of incoherent packet cost)
    # runs ONCE PER DISTINCT WINNING CHUNK in a second phase, not once per
    # leaf visit.
    # acc planes: [0]=win chunk base (f32, -1 = none), [1]=win slot,
    # [2]=u, [3]=v, [4:]=attributes.
    zero = jnp.zeros((sub, 128), jnp.float32)
    acc_ref[0] = zero - 1.0
    if rb_mode == "arena":
        # per-ray ARENA ENTRY index (position in the recorded chunk list;
        # -1 = no winner). Like acc[0] this init is required for
        # correctness (phase 2 matches entries by equality).
        acc_ref[4 + num_out] = zero - 1.0
    if "noinit" not in _ABLATE:
        for k in range(1, 4 + num_out):
            acc_ref[k] = zero
    init = (
        jnp.int32(1),
        jnp.where(active, jnp.float32(BIG), jnp.float32(-BIG)),  # dead lanes hit nothing
    )

    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (LEAF, 128), 0)

    def _row_masks(rowsub, nch):
        """Per-child row-mask words from the [sub, nch] per-row mins:
        (lo [nch] i32, hi [nch] i32 | None) — hi only at sub=64."""
        iota_s = jax.lax.broadcasted_iota(jnp.int32, (sub, nch), 0)
        live = rowsub < jnp.float32(BIG)
        bit = jnp.left_shift(jnp.int32(1), iota_s & 31)
        lo = jnp.sum(jnp.where(live & (iota_s < 32), bit, 0), axis=0)
        hi = (jnp.sum(jnp.where(live & (iota_s >= 32), bit, 0), axis=0)
              if sub > 32 else None)
        return lo, hi

    def _mask_write(idx, m):
        rmask_ref[idx] = m[0]
        if sub > 32:
            rmask_ref[stack_depth + idx] = m[1]

    def _mask_read(idx):
        return (rmask_ref[idx],
                rmask_ref[stack_depth + idx] if sub > 32 else None)

    WW = rb_window * LEAF

    def resolve(buf, sel, gidx, u_sel, v_sel, tfin=None):
        """Gathers + interpolation + output selects for one window.

        buf is a [rows, WW] array; pure VECTOR ops throughout — safe to
        run per leaf visit (rb_mode='fused') without stalling the scalar
        pipe (any scalar read of vector state drains the whole preceding
        vector dependency chain: measured ~0.85us after the MT fori and
        ~7us after a full resolve chain)."""
        if "nogather2" in _ABLATE:
            def pick(k):  # row broadcast, no dynamic gather (perf probe)
                return jnp.broadcast_to(
                    buf[k, :].reshape(1, WW)[:, :128], (sub, 128)
                )
        elif rb_gather == "onehot":
            # Exact winner extraction as ONE MXU contraction per ray-row:
            # vals[k, l] = sum_s buf[k, s] * onehot[s, l]. The one-hot is
            # exact in bf16 (0.0/1.0) and precision=HIGHEST decomposes
            # the f32 table exactly (bf16x3), so this IS a gather — for
            # ANY window width (Mosaic's tpu.dynamic_gather is an
            # in-tile permute, 128 lanes max, and serializes ~per lane).
            nrows = buf.shape[0]
            iota_w = jax.lax.broadcasted_iota(jnp.int32, (WW, 128), 0)
            planes = [jnp.zeros((sub, 128), jnp.float32)
                      for _ in range(nrows)]
            for r in range(sub):
                r_mask = jax.lax.broadcasted_iota(
                    jnp.int32, (sub, 1), 0) == r
                gidx_r = jnp.sum(jnp.where(r_mask, gidx, 0), axis=0)
                oh = (iota_w == gidx_r[None, :]).astype(jnp.float32)
                vals = jax.lax.dot_general(
                    buf[:, :], oh,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )  # [nrows, 128]
                for k in range(nrows):
                    planes[k] = jnp.where(
                        r_mask, vals[k:k + 1, :], planes[k]
                    )

            def pick(k):
                return planes[k]
        else:
            def pick(k):
                w = jnp.broadcast_to(buf[k, :].reshape(1, WW), (sub, WW))
                if WW == 128:
                    return jnp.take_along_axis(w, gidx, axis=1)
                # Mosaic's dynamic_gather is in-tile only: route >128-
                # lane windows through the onehot mode instead.
                raise NotImplementedError(
                    "rb_window > 1 requires rb_gather='onehot'"
                )

        def pick_pair(base, j):
            # packed bf16 pair row: component j of a 9-list packed at
            # rows base + j//2; hi half for even j, lo half for odd.
            bits = jax.lax.bitcast_convert_type(
                pick(base + j // 2), jnp.uint32
            )
            if j % 2 == 0:
                bits = bits & jnp.uint32(0xFFFF0000)
            else:
                bits = bits << 16
            return jax.lax.bitcast_convert_type(bits, jnp.float32)

        # defer_uv: the row loop never extracted winner u/v; recompute
        # them here from the winner's gathered Woop coefficient columns
        # and the stored winner t (t_final carries the winner's EXACT
        # row-loop bits), with the SAME expression tree as the row loop
        # (opx = W0*ox + W1*oy + W2*oz + W3; u = opx + t*dpx).
        a_off = 0
        if defer_uv:
            a_off = woop_rows  # buf holds the whole fused table
            Wg = [pick(kk) for kk in range(8)]
            if mt_point:
                pxw = ox + tfin * dx
                pyw = oy + tfin * dy
                pzw = oz + tfin * dz
                u_sel = Wg[0] * pxw + Wg[1] * pyw + Wg[2] * pzw + Wg[3]
                v_sel = Wg[4] * pxw + Wg[5] * pyw + Wg[6] * pzw + Wg[7]
            else:
                opx_w = Wg[0] * ox + Wg[1] * oy + Wg[2] * oz + Wg[3]
                dpx_w = Wg[0] * dx + Wg[1] * dy + Wg[2] * dz
                opy_w = Wg[4] * ox + Wg[5] * oy + Wg[6] * oz + Wg[7]
                dpy_w = Wg[4] * dx + Wg[5] * dy + Wg[6] * dz
                u_sel = opx_w + tfin * dpx_w
                v_sel = opy_w + tfin * dpy_w
            acc_ref[2] = jnp.where(sel, u_sel, acc_ref[2])
            acc_ref[3] = jnp.where(sel, v_sel, acc_ref[3])
        w_sel = 1.0 - u_sel - v_sel

        def put(idx, val):
            acc_ref[idx] = jnp.where(sel, val, acc_ref[idx])

        # Fused rows: [uv corners 0..5 when has_uv,] mat, normal
        # corners [, tangent corners] — bf16 pairs (packed) or plain
        # f32 rows (flat). Offsets are static per layout.
        mat_row = a_off + (6 if has_uv else 0)
        n_base = mat_row + 1
        t_base = n_base + (5 if rb_packed else 9)

        def corner_val(base, j):
            # j = corner*3 + component in the 9-value corner list.
            return pick_pair(base, j) if rb_packed else pick(base + j)

        if "noput2" not in _ABLATE:
            k_out = 4
            for comp in range(3):  # normal xyz
                put(k_out, w_sel * corner_val(n_base, comp)
                    + u_sel * corner_val(n_base, 3 + comp)
                    + v_sel * corner_val(n_base, 6 + comp))
                k_out += 1
            if has_uv:
                for comp in range(2):  # uv (f32 rows)
                    put(k_out, w_sel * pick(a_off + comp)
                        + u_sel * pick(a_off + 2 + comp)
                        + v_sel * pick(a_off + 4 + comp))
                    k_out += 1
            put(k_out, pick(mat_row))  # material id
            k_out += 1
            if with_tangent:  # tangent xyz
                for comp in range(3):
                    put(k_out, w_sel * corner_val(t_base, comp)
                        + u_sel * corner_val(t_base, 3 + comp)
                        + v_sel * corner_val(t_base, 6 + comp))
                    k_out += 1

    # ---- leaf MT test: one 128-slot chunk against the packet -------------
    # Factored out of leaf_case so the leaf-pipeline mode can run it on the
    # PREVIOUS leaf (whose chunk DMA overlapped the traversal since its
    # discovery) while the current leaf's DMA flies. wrow = the chunk's row
    # base inside w_s (0 when single-buffered; par * ROWS_W when
    # double-buffered — a traced scalar), chunk_i = the chunk base (for
    # winner recording + list appends), sub_off/m_count = the leaf's window
    # inside the chunk, bt = best-t plane BEFORE this leaf. Returns the
    # tightened best-t plane; updates acc planes (+ fused resolve).
    ROWS_W = w_s.shape[0] // 2 if leaf_pipeline else w_s.shape[0]

    def leaf_mt(wrow, chunk_i, sub_off, m_count, bt, rowmask=None):
        if leaf_pipeline:
            def wr(k):
                return w_s[pl.ds(wrow + k, 1), :].reshape(LEAF, 1)

            def attr_buf():
                return w_s[pl.ds(wrow + woop_rows, ROWS_W - woop_rows), :]
        else:
            def wr(k):
                return w_s[k, :].reshape(LEAF, 1)

            def attr_buf():
                return w_s[woop_rows:, :]

        # Woop coefficient windows as [LEAF, 1] for the pair grid.
        if woop_bf16:
            # Packed table: coefficient k lives in the hi (even k) / lo
            # (odd k) bf16 half of row k//2 (build_tables::pack_rows).
            def wcol(k):
                bits = jax.lax.bitcast_convert_type(wr(k // 2), jnp.uint32)
                bits = (bits & jnp.uint32(0xFFFF0000)) if k % 2 == 0 \
                    else (bits << 16)
                return jax.lax.bitcast_convert_type(bits, jnp.float32)

            W = [wcol(k) for k in range(12)]
        else:
            W = [wr(k) for k in range(12)]
        if "mtnotr" in _ABLATE:
            # Timing probe: constant coefficient columns — no wr() reads,
            # no [1,128]->[LEAF,1] relayouts (results wrong by design).
            W = [jnp.full((LEAF, 1), jnp.float32(0.01 * (k + 1)))
                 for k in range(12)]

        A_mt = None
        if mt_mxu:
            # MXU Möller–Trumbore transform (round-5 lead #1): the whole
            # per-row Woop transform — six [LEAF,4]·[4] chains (o'u, d'u,
            # o'v, d'v, o'z, d'z) — is ONE [3*LEAF, 4] @ [4, 256]
            # contraction per ray row on the systolic array, replacing
            # ~26 serial VPU plane ops. The coefficient matrix is loop-
            # invariant per leaf visit (Mosaic hoists it); only the tiny
            # [4, 256] RHS (o|d rows) is built per row. Precision rides
            # the lax dot knob: 'default' = one bf16 pass (statistical
            # parity, like woop_bf16), 'high' = error-compensated bf16x3,
            # 'highest' = bf16x6 (~f32). Accept-test numerics differ from
            # the VPU chain by association order -> statistical-parity
            # knob: gate variants + tpu_parity validate on chip.
            A_mt = jnp.concatenate(
                [jnp.concatenate(W[0:4], axis=1),
                 jnp.concatenate(W[4:8], axis=1),
                 jnp.concatenate(W[8:12], axis=1)], axis=0)  # [3*LEAF, 4]

        mt_comps = ()
        if rb_mode == "mt" and "noreadback" not in _ABLATE:
            # rb_mode='mt': winner attributes are extracted INSIDE the
            # MT row loop by the same masked-min trick as u/v, from
            # per-triangle corner COLUMNS — zero dynamic gathers. The
            # 'fused' mode's per-visit resolve is pure vector ops too,
            # but its 6-17 take_along_axis gathers measured ~2.6us per
            # leaf visit (the incoherent-wave dominator, 72% of live
            # packet cost); interpolate-then-min-extract rides the
            # one-hot masks the loop already builds for a few FMAs and
            # one extra sublane reduction per attribute component.
            def acol(k):  # attr row k as a [LEAF, 1] column
                return wr(woop_rows + k)

            mat_row = 6 if has_uv else 0
            n_base = mat_row + 1
            t_base = n_base + (5 if rb_packed else 9)

            def corner_col(base, j):
                # component j of a 9-value corner list (see resolve()).
                if not rb_packed:
                    return acol(base + j)
                bits = jax.lax.bitcast_convert_type(
                    acol(base + j // 2), jnp.uint32
                )
                if j % 2 == 0:
                    bits = bits & jnp.uint32(0xFFFF0000)
                else:
                    bits = bits << 16
                return jax.lax.bitcast_convert_type(bits, jnp.float32)

            # (c0, c1, c2) corner-column triples in OUTPUT-PLANE order
            # (the resolve()'s put sequence): normal3 [, uv2], mat
            # [, tangent3]. mat is per-triangle (no interpolation).
            comps = []
            for c in range(3):
                comps.append((corner_col(n_base, c),
                              corner_col(n_base, 3 + c),
                              corner_col(n_base, 6 + c)))
            if has_uv:
                for c in range(2):
                    comps.append((acol(c), acol(2 + c), acol(4 + c)))
            comps.append((acol(mat_row), None, None))
            if with_tangent:
                for c in range(3):
                    comps.append((corner_col(t_base, c),
                                  corner_col(t_base, 3 + c),
                                  corner_col(t_base, 6 + c)))
            mt_comps = tuple(comps)

        lane_ok = (sub_iota >= sub_off) & (sub_iota < sub_off + m_count)

        # One ray row (8 sublanes of the packet) per fori iteration:
        # [LEAF, 128] vreg tiles (128 tris x 128 rays). The loop only
        # finds each ray's candidate (t, tri index); the winner readback
        # (gathers + attribute interpolation) happens ONCE per leaf on
        # [8, 128] planes afterwards.
        best_t_plane = bt

        def row_body(r, carry):
            cand_t, cand_idx, cand_u, cand_v, cand_att = carry
            r_mask = jax.lax.broadcasted_iota(jnp.int32, (sub, 1), 0) == r

            def row(plane):  # row r of [8,128] without dynamic_slice
                return jnp.sum(jnp.where(r_mask, plane, 0.0), axis=0)

            orx, ory, orz = row(ox), row(oy), row(oz)  # [128]
            drx, dry, drz = row(dx), row(dy), row(dz)

            # o'_k = R_k . o + b_k ; d'_k = R_k . d   -> [LEAF, 128]
            mxu = None
            if mt_mxu:
                o4 = jnp.stack(
                    [orx, ory, orz, jnp.ones_like(orx)], axis=0)
                d4 = jnp.stack(
                    [drx, dry, drz, jnp.zeros_like(drx)], axis=0)
                rhs = jnp.concatenate([o4, d4], axis=1)  # [4, 256]
                big = jax.lax.dot_general(
                    A_mt, rhs, (((1,), (0,)), ((), ())),
                    precision=_MXU_PREC[mt_mxu],
                    preferred_element_type=jnp.float32)  # [3*LEAF, 256]
                mxu = (big[:LEAF, :128], big[:LEAF, 128:],
                       big[LEAF:2 * LEAF, :128], big[LEAF:2 * LEAF, 128:])
                opz = big[2 * LEAF:, :128]
                dpz = big[2 * LEAF:, 128:]
            else:
                opz = W[8] * orx + W[9] * ory + W[10] * orz + W[11]
                dpz = W[8] * drx + W[9] * dry + W[10] * drz
            # Front-facing iff d'z < 0 (MT det = -d.n); guard the rcp.
            dz_ok = dpz < 0.0
            inv_dz = jnp.where(dz_ok, 1.0 / jnp.where(dz_ok, dpz, -1.0), 0.0)
            tt = -opz * inv_dz
            if mxu is not None:
                ou_, du_, ov_, dv_ = mxu
                uu = ou_ + tt * du_
                vv = ov_ + tt * dv_
            elif "mtnoxy" in _ABLATE:
                # Timing probe: skip the x/y Woop chains (results wrong) —
                # sizes the transform-math share of the MT row loop.
                uu = tt * jnp.float32(1e-6)
                vv = tt * jnp.float32(2e-6)
            elif mt_point:
                # Point form: u = (R(p - p0))_x with p = o + t d — 11
                # plane ops for BOTH u and v vs the two-chain form's 26
                # (algebraically equal, ulp-different: statistical-parity
                # knob like woop_bf16; gate/parity validate on chip).
                px = orx + tt * drx
                py = ory + tt * dry
                pz = orz + tt * drz
                uu = W[0] * px + W[1] * py + W[2] * pz + W[3]
                vv = W[4] * px + W[5] * py + W[6] * pz + W[7]
            else:
                opx = W[0] * orx + W[1] * ory + W[2] * orz + W[3]
                dpx = W[0] * drx + W[1] * dry + W[2] * drz
                opy = W[4] * orx + W[5] * ory + W[6] * orz + W[7]
                dpy = W[4] * drx + W[5] * dry + W[6] * drz
                uu = opx + tt * dpx
                vv = opy + tt * dpy
            bt_r = row(best_t_plane)  # [128] best before this leaf
            ok = (
                dz_ok & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                & (tt > EPS) & (tt < bt_r) & lane_ok
            )
            tt = jnp.where(ok, tt, jnp.float32(BIG))
            row_best = jnp.min(tt, axis=0)  # [128]
            if "mtnowin" in _ABLATE:
                # Timing probe: skip winner-index extraction (results wrong).
                win_idx = jnp.zeros((128,), jnp.int32)
                oh1 = oh_raw = tt < jnp.float32(BIG)
            else:
                oh_raw = (tt == row_best) & ok  # [LEAF, 128]
                # First-match tie-break: smallest sublane index among ties.
                win_idx = jnp.min(
                    jnp.where(oh_raw, sub_iota, jnp.int32(LEAF)), axis=0
                )  # [128]
                # Winner u/v by min-trick over the ONE-hot (u,v >= 0, so a
                # masked min extracts the winning slot's value): this keeps
                # the woop table out of the phase-2 readback entirely.
                # defer_uv: phase 2 recomputes u/v from the winner's
                # gathered coefficients instead — the one-hot and the two
                # masked sublane min-reduces leave the loop.
                if not defer_uv or mt_comps:
                    oh1 = oh_raw & (sub_iota == win_idx[None, :])
            if defer_uv:
                u_row = v_row = None
            elif "mtnouv" in _ABLATE:
                # Timing probe: skip winner u/v extraction (results wrong) —
                # sizes lever (a), deferring u/v recompute to phase 2.
                u_row = row_best * jnp.float32(1e-6)
                v_row = row_best * jnp.float32(2e-6)
            else:
                u_row = jnp.min(jnp.where(oh1, uu, jnp.float32(BIG)), axis=0)
                v_row = jnp.min(jnp.where(oh1, vv, jnp.float32(BIG)), axis=0)
            upd = r_mask  # write this row's results
            cand_t = jnp.where(upd, row_best[None, :], cand_t)
            cand_idx = jnp.where(upd, win_idx[None, :], cand_idx)
            if not defer_uv:
                cand_u = jnp.where(upd, u_row[None, :], cand_u)
                cand_v = jnp.where(upd, v_row[None, :], cand_v)
            if mt_comps:
                # Interpolate on the [LEAF, 128] grid, then min-extract
                # the single winning slot per lane (oh1 is one-hot per
                # column; any value < BIG extracts exactly). Numerics
                # match resolve(): same w*c0 + u*c1 + v*c2 FMA order on
                # the same (bf16-unpacked) corner values.
                wbar = 1.0 - uu - vv
                new_att = []
                for (c0, c1, c2), plane in zip(mt_comps, cand_att):
                    val = c0 if c1 is None else (
                        wbar * c0 + uu * c1 + vv * c2
                    )
                    a_row = jnp.min(
                        jnp.where(oh1, val, jnp.float32(BIG)), axis=0
                    )
                    new_att.append(
                        jnp.where(upd, a_row[None, :], plane)
                    )
                cand_att = tuple(new_att)
            return (cand_t, cand_idx, cand_u, cand_v, cand_att)

        att0 = tuple(
            jnp.zeros((sub, 128), jnp.float32) for _ in mt_comps
        )
        if "nomt" in _ABLATE:
            cand_t = jnp.full((sub, 128), jnp.float32(BIG)) - ox
            cand_idx = jnp.zeros((sub, 128), jnp.int32)
            cand_u = cand_v = jnp.zeros((sub, 128), jnp.float32)
            cand_att = att0
        else:
            if row_skip and rowmask is not None:
                # ROW SKIP: run the [LEAF, 128] MT math only for ray rows
                # with at least one lane that passed this node's slab test
                # at push time (the pushed row mask). EXACT, not a
                # heuristic: child AABBs nest inside parent AABBs and
                # best_t only tightens, so a ray that missed the child box
                # at push time can never beat best_t on any triangle
                # inside it. At wave-2 incoherence most of a leaf's 8 rows
                # carry no such ray — this skips the MT dominator's work
                # at row granularity for a scalar branch each.
                def row_step(r, carry):
                    lo, hi = rowmask
                    if hi is None:
                        bit = jnp.right_shift(lo, r) & 1
                    else:
                        bit = jnp.where(r < 32,
                                        jnp.right_shift(lo, r & 31) & 1,
                                        jnp.right_shift(hi, r & 31) & 1)
                    return jax.lax.cond(
                        bit == 1, lambda c: row_body(r, c), lambda c: c,
                        carry)
            else:
                row_step = row_body
            cand_t, cand_idx, cand_u, cand_v, cand_att = jax.lax.fori_loop(
                0, sub, row_step,
                (jnp.full((sub, 128), jnp.float32(BIG)),
                 jnp.full((sub, 128), jnp.int32(LEAF)),
                 jnp.zeros((sub, 128), jnp.float32),
                 jnp.zeros((sub, 128), jnp.float32),
                 att0),
            )

        imp = cand_t < best_t_plane  # [8, 128]
        # record the winner identity + its barycentrics; the attribute
        # fetch resolves in phase 2, once per distinct winning chunk.
        acc_ref[0] = jnp.where(imp, jnp.float32(1.0) * chunk_i, acc_ref[0])
        acc_ref[1] = jnp.where(imp, cand_idx.astype(jnp.float32), acc_ref[1])
        if not defer_uv:  # deferred: phase 2 recomputes + writes u/v
            acc_ref[2] = jnp.where(imp, cand_u, acc_ref[2])
            acc_ref[3] = jnp.where(imp, cand_v, acc_ref[3])
        if mt_comps:
            # 'mt' readback: the loop already extracted the winner's
            # interpolated attributes — commit the improving lanes.
            for k, plane in enumerate(cand_att):
                acc_ref[4 + k] = jnp.where(imp, plane, acc_ref[4 + k])
        if rb_mode in ("list", "arena", "vlist") and (
                "noappend" not in _ABLATE):
            # Append this chunk to the phase-2 candidate list (scalar
            # SMEM ops, consecutive-dup suppressed). The final winner
            # chunk of every lane is the chunk of its LAST improving
            # visit, so (absent overflow) the list is a superset of the
            # distinct winner chunks — phase 2 then runs as a counter-
            # bounded loop with NO vector->scalar extraction in its
            # control path. 'list'/'arena' gate the append on "did this
            # visit improve any lane" — but that imp_any read IS a
            # vector->scalar sync (~0.85us/visit, session K). 'vlist'
            # appends EVERY leaf visit unconditionally: chunk_base and
            # the counter are pure scalars, so traversal never touches
            # vector state; the longer list is cheap because its phase
            # 2 batches DMAs and resolves statically (arena-style).
            kk = rbl_ref[0]
            prev = rbl_ref[kk + 1]  # entry kk-1 (rbl_ref[1]=ovf if kk==0)
            dup = jnp.logical_and(kk > 0, prev == chunk_i)
            if rb_mode == "vlist":
                want = jnp.logical_not(dup)
            else:
                imp_any = jnp.max(imp.astype(jnp.int32))
                want = jnp.logical_and(imp_any > 0, jnp.logical_not(dup))

            @pl.when(jnp.logical_and(want, kk < LIST_CAP))
            def _():
                rbl_ref[kk + 2] = chunk_i
                rbl_ref[0] = kk + 1

            @pl.when(jnp.logical_and(want, kk >= LIST_CAP))
            def _():
                rbl_ref[1] = 1

            if rb_mode == "arena":
                # Stamp improving lanes with this visit's list entry
                # (the just-appended index, or the previous one on a
                # consecutive dup). On overflow the stamp is stale —
                # the ovf flag routes the whole packet to the minloop.
                ent = jnp.where(dup, kk - 1, kk).astype(jnp.float32)
                acc_ref[4 + num_out] = jnp.where(
                    imp, ent, acc_ref[4 + num_out]
                )
        if rb_mode == "fused" and "noreadback" not in _ABLATE:
            # Per-visit winner readback, PURE vector ops: the chunk's
            # attributes arrived with the woop rows in the single
            # visit DMA, the winning slot's values come out by in-row
            # gather under the improved mask, and nothing scalar ever
            # reads vector state — so the scalar pipe keeps running
            # ahead.
            resolve(attr_buf(), imp,
                    jnp.clip(cand_idx, 0, LEAF - 1), cand_u, cand_v)
        return jnp.where(imp, cand_t, bt)


    def leaf_visit(m_first, m_count, sp_in, bt, rowmask=None):
        """One leaf visit (shared by the binary and 4-wide traversals):
        chunk DMA (or pipeline hand-off) + the MT test + readback."""
        if "noleaf" in _ABLATE:
            return bt
        if "countvisits" in _ABLATE:
            rbl_ref[2] = rbl_ref[2] + 1
            # Live MT rows this visit: popcount of the pushed row mask
            # (SWAR on the int32 scalar; logical shifts — bit 31 is live
            # at sub=32). Without row_skip every visit runs all rows.
            if row_skip and rowmask is not None:
                def popc(x):
                    sr = jax.lax.shift_right_logical
                    x = x - (sr(x, 1) & 0x55555555)
                    x = (x & 0x33333333) + (sr(x, 2) & 0x33333333)
                    x = (x + sr(x, 4)) & 0x0F0F0F0F
                    return sr(x * 0x01010101, 24) & 0x3F

                lo, hi = rowmask
                nrows = popc(lo) + (popc(hi) if hi is not None else 0)
            else:
                nrows = sub
            rbl_ref[4] = rbl_ref[4] + nrows
        first = m_first

        # The leaf's CHUNK is 128-aligned by construction (build_tables
        # bin-packs leaves into chunks; the multiple_of hint asserts it).
        # The big per-triangle tables live in HBM — DMA this leaf's
        # [*, 128] chunk into VMEM scratch (keeps VMEM usage independent
        # of scene size; ~1-2us per leaf visit, dwarfed by the math).
        chunk_base = pl.multiple_of((first // LEAF) * LEAF, LEAF)
        sub_off = first - chunk_base

        # ONE DMA + ONE wait per leaf visit. For 'fused'/'mt' the w_s
        # scratch covers the WHOLE fused table (woop rows 0..15 +
        # attribute rows 16..): the attributes ride in the same copy.
        # A SECOND make_async_copy + wait per visit measured ~2.6us
        # (the wait drains the in-flight vector chain — session P
        # ablation: mt-noreadback 236us/packet vs fused-noreadback
        # 66us differed ONLY by the extra cp_a.wait()).
        # 'dma16' ablation: copy only the woop rows even when w_s
        # covers the whole fused table (fused/mt results then read
        # stale attr rows — timing bisection of the DMA row count).
        if not leaf_pipeline:
            rows_dma = (woop_rows if "dma16" in _ABLATE and
                        w_s.shape[0] > woop_rows else w_s.shape[0])
            dst = (w_s if rows_dma == w_s.shape[0]
                   else w_s.at[pl.ds(0, rows_dma), :])
            cp_w = pltpu.make_async_copy(
                tab_ref.at[pl.ds(0, rows_dma), pl.ds(chunk_base, LEAF)],
                dst, dma_sems.at[0])
            if "nodma" not in _ABLATE:
                cp_w.start()
                cp_w.wait()

        if leaf_pipeline:
            # Software-pipelined leaf processing: start the CURRENT
            # leaf's chunk DMA, then MT the PENDING leaf (its DMA has
            # been in flight since its discovery, overlapped with the
            # inner-node traversal in between). best_t tightening lags
            # one leaf — a pruning hint only; winners are closest-hit
            # minima, so results are bit-identical (the lag can only
            # ADD visits whose candidates lose the strict < test).
            # SMEM state: rbl[0] = buffer parity for the current leaf,
            # rbl[1] = pending chunk base (-1 none), rbl[2]/[3] =
            # pending sub_off / count.
            par = rbl_ref[0]
            opp = 1 - par

            def cpr(par_, chunk_):
                return pltpu.make_async_copy(
                    tab_ref.at[:, pl.ds(chunk_, LEAF)],
                    w_s.at[pl.ds(par_ * ROWS_W, ROWS_W), :],
                    dma_sems.at[par_])

            cpr(par, chunk_base).start()
            pend = rbl_ref[1]

            def mt_pending(b):
                pch = pl.multiple_of(rbl_ref[1], LEAF)
                cpr(opp, pch).wait()
                pm = ((rbl_ref[4], rbl_ref[5] if sub > 32 else None)
                      if row_skip else None)
                return leaf_mt(opp * ROWS_W, pch, rbl_ref[2],
                               rbl_ref[3], b, pm)

            bt2 = jax.lax.cond(pend >= 0, mt_pending, lambda b: b, bt)
            rbl_ref[1] = chunk_base
            rbl_ref[2] = sub_off
            rbl_ref[3] = m_count
            if row_skip:
                full = (1 << sub) - 1 if sub < 32 else -1
                rbl_ref[4] = rowmask[0] if rowmask is not None else full
                if sub > 32:
                    rbl_ref[5] = (rowmask[1] if rowmask is not None
                                  else -1)
            rbl_ref[0] = opp
            return bt2

        return leaf_mt(0, chunk_base, sub_off, m_count, bt, rowmask)

    def cond(c):
        return c[0] > 0

    def body(c):
        sp = c[0]
        best_t = c[1]
        node = stack_ref[sp - 1]
        sp = sp - 1
        meta = nm_ref[pl.ds(node, 1), :]  # [1, 4]
        m_first = meta[0, 0]
        m_count = meta[0, 1]
        m_right = meta[0, 2]
        is_leaf = m_count > 0

        def slab_plane(child):
            row = nb_ref[pl.ds(child, 1), :]  # [1, 8]
            t0x = (row[0, 0] - ox) * ix
            t1x = (row[0, 3] - ox) * ix
            t0y = (row[0, 1] - oy) * iy
            t1y = (row[0, 4] - oy) * iy
            t0z = (row[0, 2] - oz) * iz
            t1z = (row[0, 5] - oz) * iz
            tmin = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.minimum(t0z, t1z),
            )
            tmax = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.maximum(t0z, t1z),
            )
            hit = (tmax >= jnp.maximum(jnp.float32(EPS), tmin)) & (tmin < best_t)
            return jnp.where(hit, tmin, jnp.float32(BIG))

        def slab(child):
            return jnp.min(slab_plane(child))

        def inner_case(sp_in, bt):
            if "countvisits" in _ABLATE:
                rbl_ref[3] = rbl_ref[3] + 1
            left, right = m_first, m_right
            lmask = rmask = None
            if slab_batch and row_skip:
                # Per-ROW mins feed both the child scalar mins (exact: min
                # is associative, row-then-column == column-then-row) and
                # the pushed row masks (bit r set iff some lane of row r
                # hit the child) in ONE drained [sub, 2] vector.
                rowsub = jnp.concatenate(
                    [jnp.min(slab_plane(left), axis=1, keepdims=True),
                     jnp.min(slab_plane(right), axis=1, keepdims=True)],
                    axis=1)  # [sub, 2]
                mins = jnp.min(rowsub, axis=0)  # [2]
                mlo, mhi = _row_masks(rowsub, 2)
                lmin, rmin = mins[0], mins[1]
                lmask = (mlo[0], mhi[0] if sub > 32 else None)
                rmask = (mlo[1], mhi[1] if sub > 32 else None)
            elif slab_batch:
                # One fused reduction for both children (see body4): the
                # two per-child scalar min-reads each pay a full vector
                # drain; batched, the chain drains once.
                rows2 = jnp.concatenate(
                    [jnp.min(slab_plane(left), axis=0, keepdims=True),
                     jnp.min(slab_plane(right), axis=0, keepdims=True)],
                    axis=0)
                mins = jnp.min(rows2, axis=1)  # [2]
                lmin, rmin = mins[0], mins[1]
            else:
                lmin = slab(left)
                rmin = slab(right)
            l_any = lmin < BIG
            r_any = rmin < BIG
            near_is_left = lmin <= rmin
            near = jnp.where(near_is_left, left, right)
            far = jnp.where(near_is_left, right, left)
            near_any = jnp.where(near_is_left, l_any, r_any)
            far_any = jnp.where(near_is_left, r_any, l_any)
            if row_skip:
                def _msel(c, a, b):
                    return tuple(
                        jnp.where(c, x, y) if x is not None else None
                        for x, y in zip(a, b))

                near_m = _msel(near_is_left, lmask, rmask)
                far_m = _msel(near_is_left, rmask, lmask)

            idx0 = jnp.minimum(sp_in, stack_depth - 1)
            @pl.when(far_any)
            def _():
                stack_ref[idx0] = far
                if row_skip:
                    _mask_write(idx0, far_m)
            sp1 = sp_in + far_any.astype(jnp.int32)
            idx1 = jnp.minimum(sp1, stack_depth - 1)
            @pl.when(near_any)
            def _():
                stack_ref[idx1] = near
                if row_skip:
                    _mask_write(idx1, near_m)
            sp2 = sp1 + near_any.astype(jnp.int32)
            return (sp2, bt)

        def leaf_case(sp_in, bt):
            return (sp_in, leaf_visit(
                m_first, m_count, sp_in, bt,
                _mask_read(sp_in) if row_skip else None))

        return jax.lax.cond(is_leaf, leaf_case, inner_case, sp, c[1])

    def body4(c):
        """4-wide traversal step. Stack entries: e >= 0 -> 4-wide inner
        node id; e < 0 -> binary LEAF node id encoded as -(id + 1) (the
        leaf path is shared verbatim with the binary traversal)."""
        sp = c[0]
        best_t = c[1]
        e = stack_ref[sp - 1]
        sp = sp - 1
        is_leaf = e < 0

        def leaf_case4(sp_in, bt):
            node = -e - 1
            meta = nm_ref[pl.ds(node, 1), :]
            return (sp_in, leaf_visit(
                meta[0, 0], meta[0, 1], sp_in, bt,
                _mask_read(sp_in) if row_skip else None))

        def inner_case4(sp_in, bt):
            W = bvh_width  # 4 or 8 (static)
            if "countvisits" in _ABLATE:
                rbl_ref[3] = rbl_ref[3] + 1
            row = n4b_ref[pl.ds(e, 1), :]  # [1, 6W]: W child bboxes
            m8 = n4m_ref[pl.ds(e, 1), :]  # [1, 2W]: W (val, tag) pairs
            ts, es = [], []
            masked = []  # per-child [sub,128] tmin planes (BIG where miss)
            for k in range(W):
                o6 = 6 * k
                t0x = (row[0, o6 + 0] - ox) * ix
                t1x = (row[0, o6 + 3] - ox) * ix
                t0y = (row[0, o6 + 1] - oy) * iy
                t1y = (row[0, o6 + 4] - oy) * iy
                t0z = (row[0, o6 + 2] - oz) * iz
                t1z = (row[0, o6 + 5] - oz) * iz
                tmn = jnp.maximum(
                    jnp.maximum(jnp.minimum(t0x, t1x),
                                jnp.minimum(t0y, t1y)),
                    jnp.minimum(t0z, t1z),
                )
                tmx = jnp.minimum(
                    jnp.minimum(jnp.maximum(t0x, t1x),
                                jnp.maximum(t0y, t1y)),
                    jnp.maximum(t0z, t1z),
                )
                hit = (tmx >= jnp.maximum(jnp.float32(EPS), tmn)) & (
                    tmn < best_t)
                val = m8[0, 2 * k]
                tag = m8[0, 2 * k + 1]
                if slab_batch:
                    # Defer the vector->scalar reduce: collect the masked
                    # plane; ONE fused reduction below drains the vector
                    # pipe once for all four children instead of four
                    # times (each scalar read pays the full drain of the
                    # preceding vector chain — NOTES.md drain law; the
                    # four ~0.3us drains are the inner-visit dominator).
                    masked.append(jnp.where(hit, tmn, jnp.float32(BIG)))
                    ts.append(None)
                else:
                    tmin_k = jnp.min(jnp.where(hit, tmn, jnp.float32(BIG)))
                    # padded children have inverted boxes; the standard
                    # min/max slab HITS inverted boxes — mask by tag.
                    ts.append(jnp.where(tag >= 0, tmin_k, jnp.float32(BIG)))
                es.append(jnp.where(tag == 1, -(val + 1), val))
            ms = [None] * W
            if slab_batch and row_skip:
                # Per-ROW mins -> child mins AND pushed row masks from one
                # drained [sub, W] vector (exact: min associativity).
                rowsub = jnp.concatenate(
                    [jnp.min(m, axis=1, keepdims=True) for m in masked],
                    axis=1)  # [sub, W]
                mins = jnp.min(rowsub, axis=0)  # [W]
                mlo, mhi = _row_masks(rowsub, W)
                for k in range(W):
                    tag = m8[0, 2 * k + 1]
                    ts[k] = jnp.where(tag >= 0, mins[k], jnp.float32(BIG))
                    ms[k] = (mlo[k], mhi[k] if sub > 32 else None)
            elif slab_batch:
                # [W,128] = per-child sublane-reduced rows, then one
                # cross-lane min -> [W,1]; W scalar extracts of an
                # ALREADY-DRAINED tiny vector are nearly free. min is
                # exact and order-independent: bit-identical results.
                rows4 = jnp.concatenate(
                    [jnp.min(m, axis=0, keepdims=True) for m in masked],
                    axis=0)
                mins = jnp.min(rows4, axis=1)  # [W]
                for k in range(W):
                    tag = m8[0, 2 * k + 1]
                    ts[k] = jnp.where(tag >= 0, mins[k], jnp.float32(BIG))

            # Ascending sort by tmin (optimal 5-comparator network for 4,
            # Batcher 19-comparator for 8), then push far-to-near so the
            # nearest child pops first.
            net4 = ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2))
            net8 = ((0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3), (4, 6),
                    (5, 7), (1, 2), (5, 6), (0, 4), (1, 5), (2, 6), (3, 7),
                    (2, 4), (3, 5), (1, 2), (3, 4), (5, 6))
            for i, j in net4 if W == 4 else net8:
                swap = ts[i] > ts[j]
                ts[i], ts[j] = (jnp.where(swap, ts[j], ts[i]),
                                jnp.where(swap, ts[i], ts[j]))
                es[i], es[j] = (jnp.where(swap, es[j], es[i]),
                                jnp.where(swap, es[i], es[j]))
                if row_skip:
                    ms[i], ms[j] = (
                        tuple(jnp.where(swap, b, a) if a is not None
                              else None for a, b in zip(ms[i], ms[j])),
                        tuple(jnp.where(swap, a, b) if a is not None
                              else None for a, b in zip(ms[i], ms[j])),
                    )
            sp2 = sp_in
            for k in reversed(range(W)):
                hit_k = ts[k] < jnp.float32(BIG)
                idx = jnp.minimum(sp2, stack_depth - 1)

                @pl.when(hit_k)
                def _(idx=idx, k=k):
                    stack_ref[idx] = es[k]
                    if row_skip:
                        _mask_write(idx, ms[k])

                sp2 = sp2 + hit_k.astype(jnp.int32)
            return (sp2, bt)

        def fused_case4(sp_in, bt):
            """TWO-POP inner batching: this inner node AND the next stack
            entry (also inner) resolved with ONE drained [sub, 2W] slab
            reduction instead of two [sub, W] ones — the vector->scalar
            drain is ~60% of the inner-visit cost (NOTES.md drain law),
            and the doubled vector work rides the underutilized VPU.

            Order semantics: both nodes see best_t AS OF POP TIME (the
            second node is visited before the first node's subtree could
            tighten best_t), so a few more children survive the push test
            — wasted visits only, never wrong results (every survivor is
            re-tested on pop; winners are strict-min best-t). Visit-order
            change flips equal-t cross-chunk tie winners: STATISTICAL
            parity, like mt_point. Modeled inflation on dragon wave-2:
            +2.7% inner / +2.9% leaf for -44% drains
            (tools/twopop_model.py)."""
            W = bvh_width
            if "countvisits" in _ABLATE:
                rbl_ref[3] = rbl_ref[3] + 2
            e2 = stack_ref[sp_in - 1]
            sp_in = sp_in - 1
            planes, vals, tags = [], [], []
            for e_node in (e, e2):
                row = n4b_ref[pl.ds(e_node, 1), :]  # [1, 6W]
                m8 = n4m_ref[pl.ds(e_node, 1), :]  # [1, 2W]
                for k in range(W):
                    o6 = 6 * k
                    t0x = (row[0, o6 + 0] - ox) * ix
                    t1x = (row[0, o6 + 3] - ox) * ix
                    t0y = (row[0, o6 + 1] - oy) * iy
                    t1y = (row[0, o6 + 4] - oy) * iy
                    t0z = (row[0, o6 + 2] - oz) * iz
                    t1z = (row[0, o6 + 5] - oz) * iz
                    tmn = jnp.maximum(
                        jnp.maximum(jnp.minimum(t0x, t1x),
                                    jnp.minimum(t0y, t1y)),
                        jnp.minimum(t0z, t1z),
                    )
                    tmx = jnp.minimum(
                        jnp.minimum(jnp.maximum(t0x, t1x),
                                    jnp.maximum(t0y, t1y)),
                        jnp.maximum(t0z, t1z),
                    )
                    hit = (tmx >= jnp.maximum(jnp.float32(EPS), tmn)) & (
                        tmn < bt)
                    planes.append(jnp.where(hit, tmn, jnp.float32(BIG)))
                    vals.append(m8[0, 2 * k])
                    tags.append(m8[0, 2 * k + 1])
            mlo = mhi = None
            if row_skip:
                rowsub = jnp.concatenate(
                    [jnp.min(p, axis=1, keepdims=True) for p in planes],
                    axis=1)  # [sub, 2W] — THE one drained reduce
                mins = jnp.min(rowsub, axis=0)  # [2W]
                mlo, mhi = _row_masks(rowsub, 2 * W)
            else:
                rows2w = jnp.concatenate(
                    [jnp.min(p, axis=0, keepdims=True) for p in planes],
                    axis=0)  # [2W, 128]
                mins = jnp.min(rows2w, axis=1)  # [2W]

            net4 = ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2))
            net8 = ((0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3), (4, 6),
                    (5, 7), (1, 2), (5, 6), (0, 4), (1, 5), (2, 6), (3, 7),
                    (2, 4), (3, 5), (1, 2), (3, 4), (5, 6))
            sp2 = sp_in
            # Push the SECOND-popped node's children first, then the
            # first's: e popped first == e was nearer; its nearest child
            # must stay on top of the stack.
            for base in (W, 0):
                ts, es, ms = [], [], []
                for k in range(W):
                    j = base + k
                    ts.append(jnp.where(tags[j] >= 0, mins[j],
                                        jnp.float32(BIG)))
                    es.append(jnp.where(tags[j] == 1, -(vals[j] + 1),
                                        vals[j]))
                    if row_skip:
                        ms.append((mlo[j], mhi[j] if sub > 32 else None))
                    else:
                        ms.append(None)
                for i, j in net4 if W == 4 else net8:
                    swap = ts[i] > ts[j]
                    ts[i], ts[j] = (jnp.where(swap, ts[j], ts[i]),
                                    jnp.where(swap, ts[i], ts[j]))
                    es[i], es[j] = (jnp.where(swap, es[j], es[i]),
                                    jnp.where(swap, es[i], es[j]))
                    if row_skip:
                        ms[i], ms[j] = (
                            tuple(jnp.where(swap, b_, a_) if a_ is not None
                                  else None for a_, b_ in zip(ms[i], ms[j])),
                            tuple(jnp.where(swap, a_, b_) if a_ is not None
                                  else None for a_, b_ in zip(ms[i], ms[j])),
                        )
                for k in reversed(range(W)):
                    hit_k = ts[k] < jnp.float32(BIG)
                    idx = jnp.minimum(sp2, stack_depth - 1)

                    @pl.when(hit_k)
                    def _(idx=idx, k=k, ts=ts, es=es, ms=ms):
                        stack_ref[idx] = es[k]
                        if row_skip:
                            _mask_write(idx, ms[k])

                    sp2 = sp2 + hit_k.astype(jnp.int32)
            return (sp2, bt)

        if two_pop:
            def inner_dispatch4(sp_in, bt):
                nxt = stack_ref[jnp.maximum(sp_in - 1, 0)]
                can2 = jnp.logical_and(sp_in > 0, nxt >= 0)
                return jax.lax.cond(can2, fused_case4, inner_case4,
                                    sp_in, bt)
        else:
            inner_dispatch4 = inner_case4

        return jax.lax.cond(is_leaf, leaf_case4, inner_dispatch4, sp, c[1])

    if "notrav" in _ABLATE:
        t_final = init[1]
    else:
        out = jax.lax.while_loop(cond, body4 if bvh_width >= 4 else body,
                                 init)
        t_final = out[1]

    if leaf_pipeline:
        # Flush the last pending leaf (its DMA completed long ago).
        def flush(b):
            par = rbl_ref[0]  # buffer of the NEXT leaf; pending is 1 - par
            opp = 1 - par
            pch = pl.multiple_of(rbl_ref[1], LEAF)
            pltpu.make_async_copy(
                tab_ref.at[:, pl.ds(pch, LEAF)],
                w_s.at[pl.ds(opp * ROWS_W, ROWS_W), :],
                dma_sems.at[opp]).wait()
            pm = ((rbl_ref[4], rbl_ref[5] if sub > 32 else None)
                  if row_skip else None)
            return leaf_mt(opp * ROWS_W, pch, rbl_ref[2], rbl_ref[3], b, pm)

        t_final = jax.lax.cond(rbl_ref[1] >= 0, flush, lambda b: b, t_final)

    if shade is not None:
        # ---- fused bounce: shade in place of hit-plane outputs ----------
        # acc layout (untextured fused rb): [4..6] = normal xyz, [7] = mat.
        sample_key, bounce = shade_keys
        mask_f = ((t_final > 0.0) & (t_final < BIG)).astype(jnp.float32)
        state = tuple(rays_ref[pkt, k] for k in range(_ps.STATE_PLANES))
        hitp = (mask_f, t_final, acc_ref[4], acc_ref[5], acc_ref[6],
                acc_ref[7])

        def mread(row, m):
            return mtab_ref[row, m]

        outs = _ps.shade_planes(
            sample_key, bounce, state, hitp, mread,
            num_materials=shade["num_materials"], seed=shade["seed"],
            russian_roulette=shade["russian_roulette"])
        for k, v in enumerate(outs):
            out_ref[pkt, k] = v
        return

    # Winner GLOBAL slot (chunk base + in-chunk index; -1 = miss), written
    # before phase 2 consumes acc[0]. Exact in f32 up to 2^24 slots. Feeds
    # the winner-recompute differentiable intersector (diff/gradients.py).
    if "noout" not in _ABLATE:
        out_ref[pkt, 3 + num_out] = jnp.where(
            acc_ref[0] >= 0.0, acc_ref[0] + acc_ref[1], jnp.float32(-1.0)
        )

    # ---- phase 2: winner readback, once per DISTINCT winning WINDOW ------
    # (window = rb_window adjacent 128-slot chunks; chunks are packed in
    # tree order, so nearby rays' winners share windows). Per iteration:
    # ONE fused-table DMA + 6|12|17 in-row gathers over the window (u/v
    # came from phase 1; bf16 pairs unpack with bit ops after one gather).
    # rb_mode='fused'/'mt' have no phase 2: 'fused' resolves at every leaf
    # visit; 'mt' extracts inside the MT row loop itself.
    if "noreadback" not in _ABLATE and rb_mode not in ("fused", "mt"):
        def next_chunk():
            wc = acc_ref[0]
            return jnp.min(jnp.where(wc >= 0.0, wc, jnp.float32(BIG)))

        def rb_cond(cur):
            return cur < jnp.float32(BIG)

        def win_of(cur):
            """(window base i32, lane selection, in-window winner index)."""
            cur_i = cur.astype(jnp.int32)
            win_base = pl.multiple_of(cur_i - jax.lax.rem(cur_i, WW), WW)
            wb_f = win_base.astype(jnp.float32)
            # all lanes whose winner chunk falls in this window (chunk
            # bases are exact ints in f32; -1/-2 sentinels are < wb_f)
            sel = (acc_ref[0] >= wb_f) & (acc_ref[0] < wb_f + WW)
            gidx = jnp.clip(
                (acc_ref[0] - wb_f + acc_ref[1]).astype(jnp.int32), 0, WW - 1
            )
            return win_base, sel, gidx

        def minloop():
            """Min-extract loop: one iteration per distinct winning window,
            each extracting the smallest unprocessed chunk base by a
            vector->scalar min and masking it processed. The write->reduce->
            branch chain costs ~7us/iteration on v5e regardless of the
            body's DMA/gather/put work (all ablate to ~0)."""
            def rb_body(carry):
                cur, n = carry
                win_base, sel, gidx = win_of(cur)
                # arena mode sizes a_s to ARENA_BATCH chunks; the fallback
                # minloop only uses its first WW lanes.
                dst = (a_s.at[:, pl.ds(0, WW)]
                       if rb_mode in ("arena", "vlist") else a_s)
                cp_a = pltpu.make_async_copy(
                    tab_ref.at[pl.ds(0 if defer_uv else woop_rows,
                                     a_s.shape[0]), pl.ds(win_base, WW)],
                    dst, dma_sems.at[1])
                if "nodma2" not in _ABLATE:
                    cp_a.start()
                    cp_a.wait()
                buf = a_s[:, 0:WW] if rb_mode in ("arena", "vlist") else a_s
                resolve(buf, sel, gidx, acc_ref[2], acc_ref[3],
                        tfin=t_final if defer_uv else None)
                # mark processed; advance to the next distinct chunk.
                acc_ref[0] = jnp.where(sel, jnp.float32(-2.0), acc_ref[0])
                return next_chunk(), n + 1

            _, rb_n = jax.lax.while_loop(
                lambda c: rb_cond(c[0]), rb_body, (next_chunk(), jnp.int32(0))
            )
            return rb_n

        if rb_mode == "list":
            # Counter-bounded fori over the traversal-recorded chunk list:
            # loop control depends only on a scalar SMEM counter, never on
            # vector state. Chunks may appear more than once (improved-then-
            # overwritten, non-consecutive revisits) — reprocessing is
            # idempotent (where-blend puts select on the FINAL winner).
            kk = rbl_ref[0]

            def list_body(i, carry):
                if "nobody2" in _ABLATE:
                    return carry
                base = pl.multiple_of(rbl_ref[i + 2], LEAF)
                cp_a = pltpu.make_async_copy(
                    tab_ref.at[pl.ds(woop_rows, a_s.shape[0]), pl.ds(base, LEAF)], a_s, dma_sems.at[1])
                if "nodma2" not in _ABLATE:
                    cp_a.start()
                    cp_a.wait()
                if "dmaonly2" in _ABLATE:
                    return carry
                sel = acc_ref[0] == base.astype(jnp.float32)
                gidx = jnp.clip(acc_ref[1].astype(jnp.int32), 0, LEAF - 1)
                resolve(a_s, sel, gidx, acc_ref[2], acc_ref[3])
                return carry

            jax.lax.fori_loop(0, kk, list_body, jnp.int32(0))

            # Overflow: the list is incomplete — resolve ALL winners with
            # the min-extract loop (reprocessing listed chunks is a no-op).
            @pl.when(rbl_ref[1] > 0)
            def _():
                minloop()

            if "countrb" in _ABLATE:
                out_ref[pkt, 0] = jnp.full((sub, 128), 1.0) * (
                    kk + 1000 * rbl_ref[1]
                ).astype(jnp.float32)
        elif rb_mode == "arena":
            # Batched readback, no per-chunk serial chain of ANY kind: the
            # minloop's vector->scalar extraction and the list fori's
            # DMA-start->wait->gather chain both measured ~7us per distinct
            # chunk at incoherence (every body ablation was flat — the cost
            # is the per-iteration serialization itself). Here each batch
            # (a) issues ALL chunk DMAs back-to-back on one counting
            # semaphore — a scalar-only loop, latencies overlap in the DMA
            # engines — then (b) resolves with a STATIC ARENA_BATCH-way
            # unrolled straight-line vector loop. Unrolled slots past the
            # recorded count resolve stale arena data but select no lanes
            # (entry stamps are always < kk), so no per-slot branch guards.
            kk = rbl_ref[0]
            entry_pl = 4 + num_out

            def batch_body(b0):
                b1 = jnp.minimum(kk, b0 + ARENA_BATCH)

                def cp(i):
                    base = pl.multiple_of(rbl_ref[i + 2], LEAF)
                    return pltpu.make_async_copy(
                        tab_ref.at[pl.ds(woop_rows, a_s.shape[0]), pl.ds(base, LEAF)],
                        a_s.at[:, pl.ds((i - b0) * LEAF, LEAF)],
                        dma_sems.at[1])

                if "nodma2" not in _ABLATE:
                    def start_body(i, c):
                        cp(i).start()
                        return c

                    jax.lax.fori_loop(b0, b1, start_body, 0)

                    def wait_body(i, c):
                        cp(i).wait()
                        return c

                    jax.lax.fori_loop(b0, b1, wait_body, 0)

                if "noresolve2" not in _ABLATE:
                    b0f = b0.astype(jnp.float32)
                    gidx = jnp.clip(acc_ref[1].astype(jnp.int32), 0, LEAF - 1)
                    for j in range(ARENA_BATCH):
                        sel = acc_ref[entry_pl] == b0f + float(j)
                        resolve(a_s[:, j * LEAF:(j + 1) * LEAF], sel, gidx,
                                acc_ref[2], acc_ref[3])
                return b0 + ARENA_BATCH

            if "nobody2" not in _ABLATE:
                @pl.when(rbl_ref[1] == 0)
                def _():
                    jax.lax.while_loop(lambda b0: b0 < kk, batch_body,
                                       jnp.int32(0))

                # List overflow: the entry stamps are incomplete — resolve
                # every winner with the min-extract loop instead (chunk
                # bases in acc[0] are complete in every mode).
                @pl.when(rbl_ref[1] > 0)
                def _():
                    minloop()

            if "countrb" in _ABLATE:
                out_ref[pkt, 0] = jnp.full((sub, 128), 1.0) * (
                    kk + 1000 * rbl_ref[1]
                ).astype(jnp.float32)
        elif rb_mode == "vlist":
            # Batched readback over the traversal-recorded VISIT list: each
            # batch issues ARENA_BATCH chunk DMAs all-in-flight (scalar-only
            # loops), then a STATIC unrolled resolve selects lanes by chunk-
            # base equality (an SMEM scalar broadcast — never a vector
            # extraction). Entries may repeat (revisits) — resolving a
            # chunk twice is idempotent (puts select on the FINAL winner).
            kk = rbl_ref[0]

            def batch_body(b0):
                b1 = jnp.minimum(kk, b0 + ARENA_BATCH)

                def cp(i):
                    base = pl.multiple_of(rbl_ref[i + 2], LEAF)
                    return pltpu.make_async_copy(
                        tab_ref.at[pl.ds(0 if defer_uv else woop_rows,
                                         a_s.shape[0]),
                                   pl.ds(base, LEAF)],
                        a_s.at[:, pl.ds((i - b0) * LEAF, LEAF)],
                        dma_sems.at[1])

                if "nodma2" not in _ABLATE:
                    def start_body(i, c):
                        cp(i).start()
                        return c

                    jax.lax.fori_loop(b0, b1, start_body, 0)

                    def wait_body(i, c):
                        cp(i).wait()
                        return c

                    jax.lax.fori_loop(b0, b1, wait_body, 0)

                if "noresolve2" not in _ABLATE:
                    gidx = jnp.clip(acc_ref[1].astype(jnp.int32), 0, LEAF - 1)
                    for j in range(ARENA_BATCH):
                        base_j = rbl_ref[b0 + j + 2]
                        # Unrolled slots past the batch end hold stale arena
                        # data AND a stale base — mask them out entirely.
                        sel = (acc_ref[0] == base_j.astype(jnp.float32)) & (
                            b0 + j < b1
                        )
                        resolve(a_s[:, j * LEAF:(j + 1) * LEAF], sel, gidx,
                                acc_ref[2], acc_ref[3],
                                tfin=t_final if defer_uv else None)
                return b0 + ARENA_BATCH

            if "nobody2" not in _ABLATE:
                @pl.when(rbl_ref[1] == 0)
                def _():
                    jax.lax.while_loop(lambda b0: b0 < kk, batch_body,
                                       jnp.int32(0))

                # List overflow: entries are incomplete — resolve every
                # winner with the min-extract loop (acc[0] is complete).
                @pl.when(rbl_ref[1] > 0)
                def _():
                    minloop()

            if "countrb" in _ABLATE:
                out_ref[pkt, 0] = jnp.full((sub, 128), 1.0) * (
                    kk + 1000 * rbl_ref[1]
                ).astype(jnp.float32)
        elif not rb_prefetch:
            rb_n = minloop()
            if "countrb" in _ABLATE:
                # Perf probe: overwrite the t plane with this packet's
                # readback iteration count (results wrong by design).
                out_ref[pkt, 0] = jnp.full((sub, 128), 1.0) * rb_n.astype(
                    jnp.float32
                )
        else:
            # Software-pipelined: each iteration handles TWO windows with
            # alternating buffers — window B's DMA overlaps window A's
            # gathers, and the min-scan for the next window overlaps A's
            # DMA. Lanes are marked processed at DMA-issue time (sel/gidx
            # are captured first), so next_chunk() skips in-flight windows.
            def rb_body(cur):
                wbA, selA, gixA = win_of(cur)
                uA, vA = acc_ref[2], acc_ref[3]
                cpA = pltpu.make_async_copy(
                    tab_ref.at[pl.ds(woop_rows, a_s.shape[0]), pl.ds(wbA, WW)], a_s, dma_sems.at[1])
                cpA.start()
                acc_ref[0] = jnp.where(selA, jnp.float32(-2.0), acc_ref[0])
                nxt = next_chunk()
                has_b = nxt < jnp.float32(BIG)
                wbB, selB, gixB = win_of(jnp.where(has_b, nxt, 0.0))
                selB = selB & has_b
                uB, vB = acc_ref[2], acc_ref[3]
                cpB = pltpu.make_async_copy(
                    tab_ref.at[pl.ds(woop_rows, a_s.shape[0]), pl.ds(wbB, WW)], a_s2, dma_sems.at[2])

                @pl.when(has_b)
                def _():
                    cpB.start()

                cpA.wait()
                resolve(a_s, selA, gixA, uA, vA)

                @pl.when(has_b)
                def _():
                    cpB.wait()
                    resolve(a_s2, selB, gixB, uB, vB)

                acc_ref[0] = jnp.where(selB, jnp.float32(-2.0), acc_ref[0])
                return next_chunk()

            jax.lax.while_loop(rb_cond, rb_body, next_chunk())

    if "countrb" not in _ABLATE:
        out_ref[pkt, 0] = t_final  # t (BIG/-BIG = miss)
    if "noout" not in _ABLATE:
        for k in range(2 + num_out):
            out_ref[pkt, 1 + k] = acc_ref[2 + k]
    if "countvisits" in _ABLATE:
        one = jnp.full((sub, 128), 1.0)
        out_ref[pkt, 0] = one * rbl_ref[2].astype(jnp.float32)
        out_ref[pkt, 1] = one * rbl_ref[3].astype(jnp.float32)
        out_ref[pkt, 2] = one * rbl_ref[4].astype(jnp.float32)


def _num_out_attrs(has_uv: bool, with_tangent: bool) -> int:
    # normal3 [+ uv2] + mat1 [+ tangent3]
    return 3 + (2 if has_uv else 0) + 1 + (3 if with_tangent else 0)


def pallas_intersect(
    origin, direction, active, tables: PallasSceneTables,
    stack_depth: int = 64, interpret: bool = False,
    packets_per_step: int = 2, return_slot: bool = False,
    rb_window: int = 1, rb_prefetch: bool = False, rb_gather: str = "take",
    rb_mode: str = "minloop", leaf_pipeline: bool = False,
    packet_rays: int = PACKET, slab_batch: bool = False,
    row_skip: bool = False, defer_uv: bool = False,
    mt_point: bool = False, mt_mxu: str = "", stub: bool = False,
    block_skip: bool = False, two_pop: bool = False,
):
    """Full wavefront intersection via the Pallas kernel.

    Returns (Hit, PacketAttrs); with return_slot=True also the winner's
    global slot per ray ([N] i32, -1 = miss) in the kernel's realigned
    chunk layout — map to original triangles via tables.slot_tri.

    packet_rays widens the packet (1024/2048/4096 = 8/16/32 sublanes x
    128 lanes): the shared-stack traversal's SERIAL per-visit cost
    (vector->scalar drains + stack SMEM ops) amortizes over more rays —
    per-ray inner visits drop ~3x from 1024 to 4096 at wave-2 incoherence
    (tools/traversal_stats.py) — while the added per-visit vector work
    rides the underutilized VPU. Results are ray-wise identical for any
    value (winners are per-ray strict-min best-t)."""
    if packet_rays // 128 not in (8, 16, 32, 64) or packet_rays % 128 != 0:
        raise ValueError("packet_rays must be 1024, 2048, 4096 or 8192")
    if mt_mxu not in ("",) + tuple(_MXU_PREC):
        raise ValueError(
            f"mt_mxu must be '' or one of {sorted(_MXU_PREC)}, got "
            f"{mt_mxu!r}")
    if tables.width in (4, 8):
        # Each W-wide inner pop pushes up to W entries: DFS occupancy is
        # bounded by (W-1)*depthW + 1, which the binary sizing rule
        # (max_depth = stack_depth - 4) does NOT cover. Auto-raise the
        # SMEM stack (i32 per slot — free) so a deep scene can't silently
        # clamp pushes and return wrong nearest hits (ADVICE r3).
        stack_depth = max(stack_depth,
                          (tables.width - 1) * tables.depth4 + 2)
    sub = packet_rays // 128
    n = origin.shape[0]
    npad = -(-n // packet_rays) * packet_rays
    wt = tables.with_tangent
    if npad != n:
        pad = npad - n
        origin = jnp.pad(origin, ((0, pad), (0, 0)))
        direction = jnp.pad(direction, ((0, pad), (0, 0)), constant_values=1.0)
        active = jnp.pad(active, (0, pad))
    k = npad // packet_rays

    rays = jnp.concatenate(
        [
            origin.T.reshape(3, k, sub, 128).transpose(1, 0, 2, 3),
            direction.T.reshape(3, k, sub, 128).transpose(1, 0, 2, 3),
            active.astype(jnp.float32).reshape(k, 1, sub, 128),
        ],
        axis=1,
    )  # [k, 7, sub, 128]

    huv = tables.has_uv
    if rb_gather == "onehot" and tables.packed:
        raise ValueError(
            "rb_gather='onehot' needs flat tables "
            "(build_tables(pack_pairs=False)): packed bf16-pair bit "
            "patterns can be denormal f32s, which the MXU flushes"
        )
    if rb_mode not in ("minloop", "list", "arena", "vlist", "fused", "mt"):
        raise ValueError(
            "rb_mode must be 'minloop', 'list', 'arena', 'vlist', 'fused' "
            f"or 'mt', got {rb_mode!r}"
        )
    if rb_mode in ("list", "arena", "vlist", "fused", "mt") and (
            rb_window != 1 or rb_prefetch):
        raise ValueError(
            f"rb_mode={rb_mode!r} resolves one 128-slot chunk at a time: "
            "requires rb_window=1 and rb_prefetch=False"
        )
    if leaf_pipeline and rb_mode != "fused":
        raise ValueError(
            "leaf_pipeline requires rb_mode='fused' (the pipelined leaf "
            "MT resolves attributes in place; phase-2 modes and 'mt' are "
            "not wired for double-buffered chunks)"
        )
    if defer_uv and rb_mode != "vlist":
        raise ValueError(
            "defer_uv recomputes winner u/v in the batched phase-2 "
            "resolve: requires rb_mode='vlist'"
        )
    if defer_uv and tables.woop_bf16:
        raise ValueError("defer_uv needs unpacked Woop rows "
                         "(tables built with pack_woop=False)")
    na = _num_out_attrs(huv, wt)
    out_planes = 4 + na  # t, u, v, attrs, winner slot
    pps = min(packets_per_step, k)
    while k % pps != 0:
        pps -= 1
    ksteps = k // pps
    # Row masks come from the batched slab reduction's per-row mins.
    row_skip = row_skip and slab_batch
    # Two-pop batches the fused slab reduce of two popped inner nodes:
    # needs the batched reduction and a wide tree (the binary body has
    # its own pop discipline).
    two_pop = two_pop and slab_batch and tables.width >= 4

    kernel = functools.partial(
        _kernel, stack_depth=stack_depth, has_uv=huv, with_tangent=wt,
        num_out=na, packets_per_step=pps, rb_window=rb_window,
        rb_prefetch=rb_prefetch, rb_gather=rb_gather,
        rb_packed=tables.packed, rb_mode=rb_mode,
        leaf_pipeline=leaf_pipeline, bvh_width=tables.width,
        woop_bf16=tables.woop_bf16, sub=sub, slab_batch=slab_batch,
        row_skip=row_skip, defer_uv=defer_uv, mt_point=mt_point,
        mt_mxu=mt_mxu, two_pop=two_pop,
    )

    def kernel_wrap(nb, nm, n4b, n4m, tab, rays_blk, out_blk,
                    stack, rmask, w_s, a_s, a_s2, acc, rbl, sems):
        kernel(nb, nm, n4b, n4m, tab, rays_blk, out_blk,
               stack, rmask, w_s, a_s, a_s2, acc, rbl, sems)

    def kernel_wrap_bs(m_ref, nb, nm, n4b, n4m, tab, rays_blk, out_blk,
                       stack, rmask, w_s, a_s, a_s2, acc, rbl, sems):
        # BLOCK SKIP: a dead grid step's in/out block indices are routed
        # (via the prefetched step map m) to the PREVIOUS live step's, so
        # the pipeline re-fetches nothing and flushes the same out block;
        # the body must then not run (it would recompute — and its writes
        # would CORRUPT that live step's outputs). m[i] == i iff step i is
        # live (or the leading-dead fallback step 0, whose body is a
        # correct no-op through the in-kernel dead-packet fast path).
        i = pl.program_id(0)

        @pl.when(m_ref[i] == i)
        def _():
            kernel(nb, nm, n4b, n4m, tab, rays_blk, out_blk,
                   stack, rmask, w_s, a_s, a_s2, acc, rbl, sems)

    attr_rows = tables.tab.shape[0] - tables.woop_rows
    # 'fused'/'mt' DMA the whole fused-table chunk into w_s (one copy, one
    # wait per leaf visit); the phase-2 modes copy only the woop rows and
    # window attribute rows into a_s during phase 2.
    w_rows = (tables.tab.shape[0] if rb_mode in ("fused", "mt")
              else tables.woop_rows)
    if leaf_pipeline:
        w_rows *= 2  # double-buffered pending/current leaf chunks

    # Index maps take (step [, scalar-prefetch map ref]) depending on
    # block_skip; the tables are grid-invariant either way.
    if block_skip:
        def im_tab(i, mr):
            return (0, 0)

        def im_rays(i, mr):
            return (mr[i], 0, 0, 0)
        im_out = im_rays
    else:
        def im_tab(i):
            return (0, 0)

        def im_rays(i):
            return (i, 0, 0, 0)
        im_out = im_rays

    in_specs = [
        # Tables are grid-invariant: single-buffered (the default
        # pipeline double-buffering would hold them twice in VMEM).
        pl.BlockSpec(tables.node_bounds.shape, im_tab,
                     memory_space=pltpu.VMEM,
                     pipeline_mode=pl.Buffered(buffer_count=1)),
        pl.BlockSpec(tables.node_meta.shape, im_tab,
                     memory_space=pltpu.VMEM,
                     pipeline_mode=pl.Buffered(buffer_count=1)),
        pl.BlockSpec(tables.node4_bounds.shape, im_tab,
                     memory_space=pltpu.VMEM,
                     pipeline_mode=pl.Buffered(buffer_count=1)),
        pl.BlockSpec(tables.node4_meta.shape, im_tab,
                     memory_space=pltpu.VMEM,
                     pipeline_mode=pl.Buffered(buffer_count=1)),
        # Pin to HBM (was pl.ANY): at 3-6.6MB node tables the compiler's
        # ANY placement put this ~50MB table in VMEM and the
        # compile 500'd with a scoped-vmem OOM (round-4 logs
        # r4_session_{z,b2}; decoded in session N2). The kernel
        # DMAs from it manually — it must NEVER leave HBM.
        pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        pl.BlockSpec((pps, 7, sub, 128), im_rays,
                     memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((pps, out_planes, sub, 128), im_out,
                            memory_space=pltpu.VMEM)
    scratch_shapes = [
        pltpu.SMEM((stack_depth,), jnp.int32),
        # Row masks: one i32 word per entry, TWO when sub > 32 (word
        # 1 lives at [stack_depth + idx]).
        pltpu.SMEM(((stack_depth * (2 if sub > 32 else 1))
                    if row_skip else 1,), jnp.int32),
        pltpu.VMEM((w_rows, LEAF), jnp.float32),
        # defer_uv: phase-2 chunk DMAs carry the WHOLE fused table
        # (woop rows included — u/v recompute gathers coefficients).
        pltpu.VMEM((tables.tab.shape[0] if defer_uv else attr_rows,
                    (ARENA_BATCH if rb_mode in ("arena", "vlist")
                     else rb_window)
                    * LEAF), jnp.float32),
        pltpu.VMEM((attr_rows, rb_window * LEAF), jnp.float32),
        pltpu.VMEM((4 + na + (1 if rb_mode == "arena" else 0), sub,
                    128), jnp.float32),
        pltpu.SMEM((LIST_CAP + 2,), jnp.int32),
        pltpu.SemaphoreType.DMA((3,)),
    ]

    step_live = None
    if block_skip:
        # Per-STEP liveness (pps packets/step) -> the routed step map:
        # m = clamped running max of (live ? i : -1). Dead steps repeat
        # the previous live step's index; leading-dead route to step 0
        # (whose body runs as a correct no-op via the dead-packet fast
        # path).
        step_live = active.reshape(ksteps, pps * packet_rays).any(axis=1)
        iota = jnp.arange(ksteps, dtype=jnp.int32)
        m = jax.lax.cummax(jnp.where(step_live, iota, -1))
        m = jnp.maximum(m, 0)

    if stub:
        # Timing probe (results wrong): skip the pallas_call entirely but
        # keep every XLA-side packing/unpacking op. The emptybody ablation
        # minus this isolates the TRUE grid/block-pipeline machinery from
        # the per-wave XLA layout glue the probe's ms/wave conflates.
        out = (jnp.zeros((k, out_planes, sub, 128), jnp.float32)
               + rays[:, :1, :, :] * 0.0)
    elif block_skip:
        out = pl.pallas_call(
            kernel_wrap_bs,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(ksteps,),
                in_specs=in_specs,
                out_specs=out_spec,
                scratch_shapes=scratch_shapes,
            ),
            out_shape=jax.ShapeDtypeStruct((k, out_planes, sub, 128),
                                           jnp.float32),
            interpret=interpret,
        )(m, tables.node_bounds, tables.node_meta, tables.node4_bounds,
          tables.node4_meta, tables.tab, rays)
        # Dead steps' out rows were never written (their blocks routed
        # away): substitute the EXACT miss constants the in-kernel dead-
        # packet fast path writes -> bit-identical to block_skip=False.
        cvec = jnp.concatenate([
            jnp.full((1,), -BIG, jnp.float32),
            jnp.zeros((2 + na,), jnp.float32),
            jnp.full((1,), -1.0, jnp.float32),
        ])
        livep = jnp.repeat(step_live, pps)[:, None, None, None]
        out = jnp.where(livep, out, cvec[None, :, None, None])
    else:
        out = pl.pallas_call(
            kernel_wrap,
            out_shape=jax.ShapeDtypeStruct((k, out_planes, sub, 128),
                                           jnp.float32),
            grid=(ksteps,),
            in_specs=in_specs,
            out_specs=out_spec,
            scratch_shapes=scratch_shapes,
            interpret=interpret,
        )(tables.node_bounds, tables.node_meta, tables.node4_bounds,
          tables.node4_meta, tables.tab, rays)

    def flat(p):
        return out[:, p].reshape(npad)[:n]

    t = flat(0)
    mask = (t > 0) & (t < BIG)
    hit = Hit(
        t=jnp.where(mask, t, FLT_MAX),
        tri=jnp.zeros((n,), jnp.int32),
        uv=jnp.stack([flat(1), flat(2)], axis=-1),
        mask=mask,
    )
    # Attr plane order mirrors the kernel's put() sequence:
    # normal3 [, uv2], mat1 [, tangent3].
    mat_plane = 8 if huv else 6
    attrs = PacketAttrs(
        normal=jnp.stack([flat(3), flat(4), flat(5)], axis=-1),
        tangent=(
            jnp.stack([flat(mat_plane + 1), flat(mat_plane + 2),
                       flat(mat_plane + 3)], axis=-1)
            if wt else jnp.zeros((n, 3))
        ),
        uv=(jnp.stack([flat(6), flat(7)], axis=-1) if huv
            else jnp.zeros((n, 2))),
        material=jnp.round(flat(mat_plane)).astype(jnp.int32),
    )
    if return_slot:
        slot = jnp.round(flat(3 + na)).astype(jnp.int32)
        return hit, attrs, jnp.where(mask, slot, -1)
    return hit, attrs


def pallas_trace_bounce(
    origin, direction, throughput, radiance, alive, pixel_idx,
    tables: PallasSceneTables, mtab, sample_key, bounce,
    *, num_materials: int, seed: int, russian_roulette: bool,
    stack_depth: int = 64, interpret: bool = False,
    packets_per_step: int = 2, leaf_pipeline: bool = False,
    slab_batch: bool = False, row_skip: bool = False,
    mt_point: bool = False, mt_mxu: str = "",
):
    """FUSED BOUNCE megakernel: packet BVH traversal + leaf MT + winner
    attributes + the WHOLE shading step (material lookup, scatter, sky,
    Russian roulette, counter RNG) in ONE kernel — the wavefront state
    never round-trips HBM between intersection and shading (the analogue
    of the reference CUDA megakernel, cuda_trace.cu:73-135, done the TPU
    way). Untextured scenes, rb_mode='fused' readback.

    Returns the next (origin, direction, throughput, radiance, alive) —
    bit-identical to pallas_intersect + ops/pallas_shade.shade_packets.
    """
    if tables.has_uv or tables.with_tangent:
        raise ValueError("pallas_trace_bounce: untextured scenes only")
    if tables.width in (4, 8):
        stack_depth = max(stack_depth,
                          (tables.width - 1) * tables.depth4 + 2)
    n = origin.shape[0]
    npad = -(-n // PACKET) * PACKET
    if npad != n:
        pad = npad - n
        origin = jnp.pad(origin, ((0, pad), (0, 0)))
        direction = jnp.pad(direction, ((0, pad), (0, 0)),
                            constant_values=1.0)
        throughput = jnp.pad(throughput, ((0, pad), (0, 0)))
        radiance = jnp.pad(radiance, ((0, pad), (0, 0)))
        alive = jnp.pad(alive, (0, pad))
        pixel_idx = jnp.pad(pixel_idx, (0, pad))
    k = npad // PACKET

    from tracy_tpu.ops import pallas_shade as _ps

    pixf = jax.lax.bitcast_convert_type(
        pixel_idx.astype(jnp.uint32), jnp.float32)
    planes = [origin[:, 0], origin[:, 1], origin[:, 2],
              direction[:, 0], direction[:, 1], direction[:, 2],
              throughput[:, 0], throughput[:, 1], throughput[:, 2],
              radiance[:, 0], radiance[:, 1], radiance[:, 2],
              alive.astype(jnp.float32), pixf]
    rays = jnp.concatenate(
        [x.reshape(k, 1, 8, 128) for x in planes], axis=1
    )  # [k, STATE_PLANES, 8, 128]
    sc = jnp.stack([jnp.asarray(sample_key, jnp.int32),
                    jnp.asarray(bounce, jnp.int32)])

    na = _num_out_attrs(False, False)
    pps = min(packets_per_step, k)
    while k % pps != 0:
        pps -= 1
    ksteps = k // pps
    shade = dict(num_materials=num_materials, seed=seed,
                 russian_roulette=russian_roulette)

    row_skip = row_skip and slab_batch

    def kernel_wrap(sc_r, mtab_r, nb, nm, n4b, n4m, tab, rays_blk,
                    out_blk, stack, rmask, w_s, a_s, a_s2, acc, rbl, sems):
        _kernel(nb, nm, n4b, n4m, tab, rays_blk, out_blk,
                stack, rmask, w_s, a_s, a_s2, acc, rbl, sems,
                stack_depth=stack_depth, has_uv=False, with_tangent=False,
                num_out=na, packets_per_step=pps, rb_window=1,
                rb_prefetch=False, rb_gather="take",
                rb_packed=tables.packed, rb_mode="fused",
                leaf_pipeline=leaf_pipeline, bvh_width=tables.width,
                woop_bf16=tables.woop_bf16, slab_batch=slab_batch,
                row_skip=row_skip, mt_point=mt_point, mt_mxu=mt_mxu,
                shade=shade, sc_ref=sc_r, mtab_ref=mtab_r)

    attr_rows = tables.tab.shape[0] - tables.woop_rows
    w_rows = tables.tab.shape[0] * (2 if leaf_pipeline else 1)
    out_planes = _ps.STATE_PLANES - 1

    out = pl.pallas_call(
        kernel_wrap,
        out_shape=jax.ShapeDtypeStruct((k, out_planes, 8, 128), jnp.float32),
        grid=(ksteps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(mtab.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM,
                         pipeline_mode=pl.Buffered(buffer_count=1)),
            pl.BlockSpec(tables.node_bounds.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM,
                         pipeline_mode=pl.Buffered(buffer_count=1)),
            pl.BlockSpec(tables.node_meta.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM,
                         pipeline_mode=pl.Buffered(buffer_count=1)),
            pl.BlockSpec(tables.node4_bounds.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM,
                         pipeline_mode=pl.Buffered(buffer_count=1)),
            pl.BlockSpec(tables.node4_meta.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM,
                         pipeline_mode=pl.Buffered(buffer_count=1)),
            # Pin to HBM (was pl.ANY): at 3-6.6MB node tables the compiler's
            # ANY placement put this ~50MB table in VMEM and the
            # compile 500'd with a scoped-vmem OOM (round-4 logs
            # r4_session_{z,b2}; decoded in session N2). The kernel
            # DMAs from it manually — it must NEVER leave HBM.
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((pps, _ps.STATE_PLANES, 8, 128),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((pps, out_planes, 8, 128),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((stack_depth,), jnp.int32),
            pltpu.SMEM((stack_depth if row_skip else 1,), jnp.int32),
            pltpu.VMEM((w_rows, LEAF), jnp.float32),
            pltpu.VMEM((attr_rows, LEAF), jnp.float32),
            pltpu.VMEM((attr_rows, LEAF), jnp.float32),
            pltpu.VMEM((4 + na, 8, 128), jnp.float32),
            pltpu.SMEM((LIST_CAP + 2,), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(sc, mtab, tables.node_bounds, tables.node_meta,
      tables.node4_bounds, tables.node4_meta, tables.tab, rays)

    def flat(p):
        return out[:, p].reshape(npad)[:n]

    o2 = jnp.stack([flat(0), flat(1), flat(2)], axis=-1)
    d2 = jnp.stack([flat(3), flat(4), flat(5)], axis=-1)
    thr = jnp.stack([flat(6), flat(7), flat(8)], axis=-1)
    rad = jnp.stack([flat(9), flat(10), flat(11)], axis=-1)
    return o2, d2, thr, rad, flat(12) > 0.0


def nondiff_intersector(intersect):
    """Make an IntersectFn differentiation-safe with a zero-gradient VJP.

    Why this is CORRECT for material/texture/emissive inverse rendering (the
    BASELINE north-star config): every gradient those optimizations need
    flows through the intersector's DISCRETE outputs — the material id
    selects table rows (one-hot contraction, differentiable w.r.t. the
    table), the hit uv selects texels (nearest sampling, differentiable
    w.r.t. texel VALUES and zero a.e. w.r.t. uv), and the shading normal
    only steers detached sampling decisions. The only gradients a zero VJP
    drops are geometry gradients (vertex positions through t/uv/normal) —
    optimizing geometry must use the XLA packet intersector with
    differentiable_geometry=True (diff/gradients.py).

    This lets the Pallas kernel (which has no VJP of its own) run the
    FORWARD pass of inverse rendering at full speed.
    """
    import numpy as np

    @jax.custom_vjp
    def f(origin, direction, active):
        return intersect(origin, direction, active)

    def fwd(origin, direction, active):
        # No residuals: shapes/dtypes are NOT valid jit residuals, and the
        # ray count is recoverable from the hit-t cotangent in bwd.
        return f(origin, direction, active), None

    def bwd(_res, ct):
        hit_ct = ct[0]
        n = hit_ct.t.shape[0]
        zero = jnp.zeros((n, 3), hit_ct.t.dtype)
        zero_act = np.zeros((n,), jax.dtypes.float0)
        return (zero, zero, zero_act)

    f.defvjp(fwd, bwd)
    return f


def make_pallas_intersector(scene, bvh: PackedBVH, with_tangent: bool,
                            stack_depth: int = 64, interpret: bool = False,
                            vmem_limit_bytes: int = 12 * 1024 * 1024,
                            return_slot: bool = False, rb_window: int = 1,
                            rb_prefetch: bool = False,
                            rb_gather: str = "take",
                            rb_mode: str = "minloop",
                            leaf_pipeline: bool = False,
                            width: int = 2, pack_woop: bool = False,
                            packet_rays: int = PACKET,
                            slab_batch: bool = False,
                            row_skip: bool = False,
                            defer_uv: bool = False,
                            mt_point: bool = False,
                            mt_mxu: str = "", two_pop: bool = False):
    """Rich IntersectFn backed by the Pallas kernel, or None if the scene
    doesn't fit the VMEM budget. The returned function carries its
    PallasSceneTables as `.tables` (slot_tri maps winner slots to tris)."""
    tables = build_tables(scene, bvh, with_tangent,
                          pack_pairs=(rb_gather != "onehot"), width=width,
                          pack_woop=pack_woop)
    if tables.vmem_bytes > vmem_limit_bytes:
        return None

    def intersect(origin, direction, act):
        return pallas_intersect(origin, direction, act, tables,
                                stack_depth=stack_depth, interpret=interpret,
                                return_slot=return_slot, rb_window=rb_window,
                                rb_prefetch=rb_prefetch, rb_gather=rb_gather,
                                rb_mode=rb_mode, leaf_pipeline=leaf_pipeline,
                                packet_rays=packet_rays,
                                slab_batch=slab_batch, row_skip=row_skip,
                                defer_uv=defer_uv, mt_point=mt_point,
                                mt_mxu=mt_mxu, two_pop=two_pop)

    intersect.tables = tables
    return intersect
