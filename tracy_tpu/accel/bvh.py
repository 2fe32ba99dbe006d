"""Flattened-BVH closest-hit traversal on device.

TPU re-design of the reference's acceleration path (kd-tree build + iterative
FixedSizeStack traversal, src/kdtree.h:364-429, driven two-level from
cpu_details.cpp:88-185). Differences, deliberately:

* single global binned-SAH BVH over the whole triangle soup instead of a
  duplicating kd-tree TLAS/BLAS (fixed element ranges flatten better; the
  reference itself wanted a BVH, bvh.h:14);
* traversal is LOCK-STEP VECTORIZED: every ray in the wavefront owns a small
  int32 stack ([N, S] array); one `lax.while_loop` pops one node per ray per
  iteration, child AABB slab tests and fixed-width leaf triangle tests are
  masked lanes, and the loop runs until every ray's stack is empty. No
  recursion, no data-dependent shapes — XLA sees a static dataflow graph;
* slab test matches reference RayAABB (collision.h:119-131):
  `tmax >= max(EPS, tmin) && tmin < closest_t`, with inverse directions
  clamped to +/-1e30 instead of IEEE inf (avoids 0*inf NaNs).

Ray-box pruning uses the running closest-t so far, children are pushed
near-first for early tightening.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tracy_tpu.core import math as tm
from tracy_tpu.render.intersect import FLT_MAX, Hit
from tracy_tpu.accel.bvh_build import HostBVH, build_bvh, pad_leaves

INV_CLAMP = 1.0e30


class BVHArrays(NamedTuple):
    """Device-side flattened BVH."""

    node_min: jnp.ndarray  # [Nn, 3] float32
    node_max: jnp.ndarray  # [Nn, 3] float32
    node_meta: jnp.ndarray  # [Nn, 3] int32 (leaf: first,count,-1 | inner: l,0,r)
    tri_order: jnp.ndarray  # [T + leaf_size] int32 slot -> original tri id


def device_bvh(host: HostBVH, leaf_size: int) -> BVHArrays:
    padded = pad_leaves(host, leaf_size)
    return BVHArrays(
        node_min=jnp.asarray(padded.node_bounds[:, :3]),
        node_max=jnp.asarray(padded.node_bounds[:, 3:]),
        node_meta=jnp.asarray(padded.node_meta),
        tri_order=jnp.asarray(padded.tri_order),
    )


def build_scene_bvh(scene, leaf_size: int = 8, max_depth: int = 60) -> Tuple[HostBVH, BVHArrays]:
    """Build (host, device) BVH for a SceneArrays. Uses the native C++
    builder when available, else the numpy reference builder."""
    pos = np.asarray(scene.vertex_pos, dtype=np.float32)
    idx = np.asarray(scene.indices)
    v0, v1, v2 = pos[idx[:, 0]], pos[idx[:, 1]], pos[idx[:, 2]]
    tri_min = np.minimum(np.minimum(v0, v1), v2)
    tri_max = np.maximum(np.maximum(v0, v1), v2)
    host = _build_auto(tri_min, tri_max, leaf_size, max_depth)
    return host, device_bvh(host, leaf_size)


def _build_auto(tri_min, tri_max, leaf_size, max_depth,
                cost_mode: str = "tris") -> HostBVH:
    try:
        from tracy_tpu.accel.native import build_bvh_native

        return build_bvh_native(tri_min, tri_max, leaf_size, max_depth,
                                cost_mode=cost_mode)
    except Exception as e:
        from tracy_tpu.utils.log import warn

        warn(f"native BVH builder unavailable ({e!r}); using numpy builder")
        return build_bvh(tri_min, tri_max, leaf_size, max_depth,
                         cost_mode=cost_mode)


class _TraversalState(NamedTuple):
    stack: jnp.ndarray  # [N, S] int32
    sp: jnp.ndarray  # [N] int32 stack pointer (0 = empty)
    t: jnp.ndarray  # [N] best hit t
    slot: jnp.ndarray  # [N] int32 best hit slot (sorted-order index)
    uv: jnp.ndarray  # [N, 2]
    mask: jnp.ndarray  # [N] bool


def _slab_test(o, inv_d, bmin, bmax, closest_t):
    """Reference RayAABB (collision.h:119-131), batched."""
    lo = (bmin - o) * inv_d
    hi = (bmax - o) * inv_d
    tmin = jnp.max(jnp.minimum(lo, hi), axis=-1)
    tmax = jnp.min(jnp.maximum(lo, hi), axis=-1)
    hit = (tmax >= jnp.maximum(jnp.float32(tm.EPS), tmin)) & (tmin < closest_t)
    return hit, tmin


def intersect_bvh(
    origin: jnp.ndarray,  # [N, 3]
    direction: jnp.ndarray,  # [N, 3]
    p0s: jnp.ndarray,  # [Ts, 3] triangle data in BVH slot order (padded)
    e1s: jnp.ndarray,
    e2s: jnp.ndarray,
    bvh: BVHArrays,
    active: Optional[jnp.ndarray] = None,
    leaf_size: int = 8,
    stack_depth: int = 64,
    t_max: Optional[jnp.ndarray] = None,
) -> Hit:
    n = origin.shape[0]
    dtype = origin.dtype
    rows = jnp.arange(n)

    inv_d = jnp.clip(1.0 / jnp.where(jnp.abs(direction) < 1e-12,
                                     jnp.float32(1e-12), direction),
                     -INV_CLAMP, INV_CLAMP)

    start_sp = jnp.ones((n,), jnp.int32)
    if active is not None:
        start_sp = jnp.where(active, start_sp, 0)

    init = _TraversalState(
        stack=jnp.zeros((n, stack_depth), jnp.int32),
        sp=start_sp,
        t=jnp.full((n,), FLT_MAX, dtype) if t_max is None else t_max,
        slot=jnp.zeros((n,), jnp.int32),
        uv=jnp.zeros((n, 2), dtype),
        mask=jnp.zeros((n,), bool),
    )

    leaf_iota = jnp.arange(leaf_size, dtype=jnp.int32)

    def cond(s: _TraversalState):
        return jnp.any(s.sp > 0)

    def body(s: _TraversalState) -> _TraversalState:
        has = s.sp > 0
        top = jnp.maximum(s.sp - 1, 0)
        node = jnp.where(has, s.stack[rows, top], 0)
        sp = jnp.where(has, s.sp - 1, s.sp)

        meta = bvh.node_meta[node]  # [N, 3]
        is_leaf = has & (meta[:, 1] > 0)
        is_inner = has & (meta[:, 1] == 0)

        # ---- inner: test both children, push far then near -----------------
        left = meta[:, 0]
        right = meta[:, 2]
        lhit, lt = _slab_test(origin, inv_d, bvh.node_min[left], bvh.node_max[left], s.t)
        rhit, rt = _slab_test(origin, inv_d, bvh.node_min[right], bvh.node_max[right], s.t)
        lhit = lhit & is_inner
        rhit = rhit & is_inner

        near_is_left = lt <= rt
        near = jnp.where(near_is_left, left, right)
        far = jnp.where(near_is_left, right, left)
        near_hit = jnp.where(near_is_left, lhit, rhit)
        far_hit = jnp.where(near_is_left, rhit, lhit)

        stack = s.stack
        # push far first so near pops first
        idx0 = jnp.minimum(sp, stack_depth - 1)
        stack = stack.at[rows, idx0].set(jnp.where(far_hit, far, stack[rows, idx0]))
        sp = sp + far_hit.astype(jnp.int32)
        idx1 = jnp.minimum(sp, stack_depth - 1)
        stack = stack.at[rows, idx1].set(jnp.where(near_hit, near, stack[rows, idx1]))
        sp = sp + near_hit.astype(jnp.int32)

        # ---- leaf: fixed-width masked triangle tests -----------------------
        first = jnp.where(is_leaf, meta[:, 0], 0)
        count = meta[:, 1]
        slots = first[:, None] + leaf_iota[None, :]  # [N, L]
        lane_ok = (leaf_iota[None, :] < count[:, None]) & is_leaf[:, None]

        t_grid, u_grid, v_grid = _leaf_triangles(
            origin, direction, p0s, e1s, e2s, slots, s.t
        )
        t_grid = jnp.where(lane_ok, t_grid, FLT_MAX)
        best = jnp.argmin(t_grid, axis=-1)
        best_t = t_grid[rows, best]
        improved = best_t < s.t

        new = _TraversalState(
            stack=stack,
            sp=sp,
            t=jnp.where(improved, best_t, s.t),
            slot=jnp.where(improved, slots[rows, best], s.slot),
            uv=jnp.where(
                improved[:, None],
                jnp.stack([u_grid[rows, best], v_grid[rows, best]], axis=-1),
                s.uv,
            ),
            mask=s.mask | improved,
        )
        return new

    final = jax.lax.while_loop(cond, body, init)
    tri = bvh.tri_order[final.slot]
    return Hit(t=final.t, tri=tri, uv=final.uv, mask=final.mask)


def _leaf_triangles(origin, direction, p0s, e1s, e2s, slots, closest_t):
    """Möller–Trumbore on a per-ray gathered [N, L] window of triangles."""
    p0 = p0s[slots]  # [N, L, 3]
    e1 = e1s[slots]
    e2 = e2s[slots]
    eps = jnp.float32(tm.EPS)
    d = direction[:, None, :]
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    tvec = origin[:, None, :] - p0
    u = jnp.sum(tvec * pvec, axis=-1)
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1)
    t_scaled = jnp.sum(e2 * qvec, axis=-1)
    inv_det = jnp.where(det > eps, 1.0 / jnp.where(det > eps, det, 1.0), 0.0)
    t = t_scaled * inv_det
    valid = (
        (det > eps)
        & (u >= eps)
        & (u <= det)
        & (v >= eps)
        & (u + v <= det)
        & (t > eps)
        & (t < closest_t[:, None])
    )
    return jnp.where(valid, t, FLT_MAX), u * inv_det, v * inv_det


def make_bvh_intersector(scene, bvh: BVHArrays, leaf_size: int = 8,
                         stack_depth: int = 64):
    """IntersectFn for the integrator. Triangle corners are gathered from
    scene.vertex_pos here (inside jit) so gradients flow to vertices."""
    idx = scene.indices  # [T, 3]
    order = bvh.tri_order  # [T + L]
    oidx = idx[order]  # [T+L, 3] sorted by BVH slot
    p0s = scene.vertex_pos[oidx[:, 0]]
    p1s = scene.vertex_pos[oidx[:, 1]]
    p2s = scene.vertex_pos[oidx[:, 2]]
    e1s = p1s - p0s
    e2s = p2s - p0s

    def intersect(origin, direction, active):
        return intersect_bvh(
            origin, direction, p0s, e1s, e2s, bvh,
            active=active, leaf_size=leaf_size, stack_depth=stack_depth,
        )

    return intersect
