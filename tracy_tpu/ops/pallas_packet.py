"""Pallas TPU kernel: packet BVH traversal + leaf intersection + attributes.

The XLA packet path (accel/packet.py) is correct but pays multi-microsecond
per-iteration overheads (op dispatch, conditionals, tiny MXU calls). This
kernel runs the same algorithm on-core:

* grid = one step per packet of 1024 rays, laid out as [8, 128] vreg planes;
* the ENTIRE scene lives in VMEM: node bounds/meta tables plus slot-ordered
  triangle geometry and per-corner attributes as 1D component planes
  (fits for scenes up to roughly ~300K triangles; larger scenes fall back
  to the XLA packet path);
* the shared traversal stack is an SMEM scratch array with a scalar sp in
  the while-loop carry; node fetches are scalar-indexed VMEM reads;
* a leaf (64 contiguous triangles) is intersected in a [64 tris, 128 rays]
  vreg tiling, one ray-row at a time: Möller–Trumbore, min-reduce over the
  sublane (triangle) axis, first-match one-hot, and attribute interpolation
  as masked multiply-sums — everything stays in vector registers;
* outputs: t, barycentric u/v, hit mask, and interpolated normal/uv/
  material (+tangent when normal maps are present), as [packets, C, 8, 128]
  planes.

NOT differentiable (no custom VJP): inverse-rendering paths use the XLA
intersectors; forward rendering uses this kernel. Interpret mode works on
CPU for correctness tests.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tracy_tpu.core import math as tm
from tracy_tpu.render.intersect import FLT_MAX, Hit
from tracy_tpu.accel.packet import PackedBVH, PacketAttrs

LEAF = 64  # static leaf window (builder leaf_size must be <= this)
PACKET = 1024  # rays per packet: [8, 128]
EPS = float(tm.EPS)
BIG = 3.4028235e38


class PallasSceneTables(NamedTuple):
    """VMEM-resident scene: everything the kernel needs, as flat planes."""

    node_bounds: jnp.ndarray  # [Nn, 8] f32
    node_meta: jnp.ndarray  # [Nn, 4] i32
    geom: jnp.ndarray  # [9, Tpad] f32: p0.xyz, e1.xyz, e2.xyz
    attrs: jnp.ndarray  # [A, Tpad] f32: n0..n2 (9), uv0..uv2 (6), mat (1)[, t0..t2 (9)]

    @property
    def with_tangent(self) -> bool:
        return self.attrs.shape[0] > 16

    @property
    def vmem_bytes(self) -> int:
        return (
            self.node_bounds.size * 4 + self.node_meta.size * 4
            + self.geom.size * 4 + self.attrs.size * 4
        )


def build_tables(scene, bvh: PackedBVH, with_tangent: bool) -> PallasSceneTables:
    """Host-side packing of slot-ordered scene data into kernel planes."""
    order = np.asarray(bvh.tri_order)
    idx = np.asarray(scene.indices)[order]
    pos = np.asarray(scene.vertex_pos, np.float32)
    nrm = np.asarray(scene.vertex_normal, np.float32)
    uv = np.asarray(scene.vertex_uv, np.float32)
    p0, p1, p2 = pos[idx[:, 0]], pos[idx[:, 1]], pos[idx[:, 2]]
    e1, e2 = p1 - p0, p2 - p0

    t = len(order)
    tpad = -(-t // 128) * 128 + LEAF  # lane alignment + leaf overrun slack

    def plane(x):
        out = np.zeros((tpad,), np.float32)
        out[: len(x)] = x
        return out

    geom = np.stack([plane(a) for a in
                     [p0[:, 0], p0[:, 1], p0[:, 2],
                      e1[:, 0], e1[:, 1], e1[:, 2],
                      e2[:, 0], e2[:, 1], e2[:, 2]]])

    n0, n1, n2 = nrm[idx[:, 0]], nrm[idx[:, 1]], nrm[idx[:, 2]]
    u0, u1, u2 = uv[idx[:, 0]], uv[idx[:, 1]], uv[idx[:, 2]]
    mat = np.asarray(scene.tri_material)[order].astype(np.float32)
    attr_list = [n0[:, 0], n0[:, 1], n0[:, 2], n1[:, 0], n1[:, 1], n1[:, 2],
                 n2[:, 0], n2[:, 1], n2[:, 2],
                 u0[:, 0], u0[:, 1], u1[:, 0], u1[:, 1], u2[:, 0], u2[:, 1],
                 mat]
    if with_tangent:
        tan = np.asarray(scene.vertex_tangent, np.float32)
        t0, t1c, t2c = tan[idx[:, 0]], tan[idx[:, 1]], tan[idx[:, 2]]
        attr_list += [t0[:, 0], t0[:, 1], t0[:, 2], t1c[:, 0], t1c[:, 1],
                      t1c[:, 2], t2c[:, 0], t2c[:, 1], t2c[:, 2]]
    attrs = np.stack([plane(a) for a in attr_list])

    return PallasSceneTables(
        node_bounds=jnp.asarray(np.asarray(bvh.node_bounds, np.float32)),
        node_meta=jnp.asarray(np.asarray(bvh.node_meta, np.int32)),
        geom=jnp.asarray(geom),
        attrs=jnp.asarray(attrs),
    )


def _kernel(nb_ref, nm_ref, geom_ref, attr_ref, rays_ref, out_ref, stack_ref,
            *, stack_depth: int, num_attr: int, num_out: int):
    """One packet: rays_ref [2*3+1, 8, 128] (o, d, active), out planes
    [3 + 1 + num_attr, 8, 128] (t, u, v, mask, attrs...)."""
    ox = rays_ref[0]
    oy = rays_ref[1]
    oz = rays_ref[2]
    dx = rays_ref[3]
    dy = rays_ref[4]
    dz = rays_ref[5]
    active = rays_ref[6] > 0.0

    def safe_inv(x):
        return jnp.clip(
            1.0 / jnp.where(jnp.abs(x) < 1e-12, jnp.float32(1e-12), x),
            -1e30, 1e30,
        )

    ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

    stack_ref[0] = 0

    # Carry: sp, best t, u, v, and attribute planes.
    init = (
        jnp.int32(1),
        jnp.where(active, jnp.float32(BIG), jnp.float32(-BIG)),  # dead lanes hit nothing
        jnp.zeros((8, 128), jnp.float32),  # u
        jnp.zeros((8, 128), jnp.float32),  # v
    ) + tuple(jnp.zeros((8, 128), jnp.float32) for _ in range(num_out))

    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (LEAF, 128), 0)

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

        def slab(child):
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
            return jnp.min(jnp.where(hit, tmin, jnp.float32(BIG)))

        def inner_case(c):
            sp_in = c[0]
            left, right = m_first, m_right
            lmin = slab(left)
            rmin = slab(right)
            l_any = lmin < BIG
            r_any = rmin < BIG
            near_is_left = lmin <= rmin
            near = jnp.where(near_is_left, left, right)
            far = jnp.where(near_is_left, right, left)
            near_any = jnp.where(near_is_left, l_any, r_any)
            far_any = jnp.where(near_is_left, r_any, l_any)

            idx0 = jnp.minimum(sp_in, stack_depth - 1)
            @pl.when(far_any)
            def _():
                stack_ref[idx0] = far
            sp1 = sp_in + far_any.astype(jnp.int32)
            idx1 = jnp.minimum(sp1, stack_depth - 1)
            @pl.when(near_any)
            def _():
                stack_ref[idx1] = near
            sp2 = sp1 + near_any.astype(jnp.int32)
            return (sp2,) + c[1:]

        def leaf_case(c):
            sp_in, bt = c[0], c[1]
            first = m_first

            # Load leaf windows [LEAF] and lift to [LEAF, 1] for broadcast.
            def win(ref, k):
                return ref[k, pl.ds(first, LEAF)].reshape(LEAF, 1)

            p0x, p0y, p0z = win(geom_ref, 0), win(geom_ref, 1), win(geom_ref, 2)
            e1x, e1y, e1z = win(geom_ref, 3), win(geom_ref, 4), win(geom_ref, 5)
            e2x, e2y, e2z = win(geom_ref, 6), win(geom_ref, 7), win(geom_ref, 8)
            attr_wins = [win(attr_ref, k) for k in range(num_attr)]

            lane_ok = sub_iota < m_count  # [LEAF, 128]

            new = list(c)
            # Process ray rows (8 sublanes of the packet) one at a time:
            # [LEAF, 128] vreg tiles (64 tris x 128 rays).
            for r in range(8):
                o_r = (ox[r], oy[r], oz[r])  # [128]
                d_r = (dx[r], dy[r], dz[r])
                # Möller–Trumbore, mirrored from collision.h:33-74.
                pvx = d_r[1] * e2z - d_r[2] * e2y  # [LEAF, 128]
                pvy = d_r[2] * e2x - d_r[0] * e2z
                pvz = d_r[0] * e2y - d_r[1] * e2x
                det = e1x * pvx + e1y * pvy + e1z * pvz
                tvx = o_r[0] - p0x
                tvy = o_r[1] - p0y
                tvz = o_r[2] - p0z
                uu = tvx * pvx + tvy * pvy + tvz * pvz
                qvx = tvy * e1z - tvz * e1y
                qvy = tvz * e1x - tvx * e1z
                qvz = tvx * e1y - tvy * e1x
                vv = d_r[0] * qvx + d_r[1] * qvy + d_r[2] * qvz
                ts = e2x * qvx + e2y * qvy + e2z * qvz
                det_ok = det > EPS
                inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
                tt = ts * inv_det
                bt_r = new[1][r]  # [128] current best for this row
                ok = (
                    det_ok & (uu >= EPS) & (uu <= det) & (vv >= EPS)
                    & (uu + vv <= det) & (tt > EPS) & (tt < bt_r)
                    & lane_ok
                )
                tt = jnp.where(ok, tt, jnp.float32(BIG))
                row_best = jnp.min(tt, axis=0)  # [128]
                imp = row_best < bt_r
                oh = (tt == row_best) & ok  # [LEAF, 128]
                oh = oh & (jnp.cumsum(oh.astype(jnp.int32), axis=0) <= 1)
                ohf = oh.astype(jnp.float32)

                u_sel = jnp.sum(uu * inv_det * ohf, axis=0)
                v_sel = jnp.sum(vv * inv_det * ohf, axis=0)
                w_sel = 1.0 - u_sel - v_sel

                def sel(wv):  # [LEAF,1] window -> [128] at winning tri
                    return jnp.sum(wv * ohf, axis=0)

                new[1] = new[1].at[r].set(jnp.where(imp, row_best, bt_r))
                new[2] = new[2].at[r].set(jnp.where(imp, u_sel, new[2][r]))
                new[3] = new[3].at[r].set(jnp.where(imp, v_sel, new[3][r]))

                # Attribute planes are corner-major: n0.xyz n1.xyz n2.xyz
                # uv0 uv1 uv2, mat[, t0.xyz t1.xyz t2.xyz] — interpolation
                # combines planes (c, 3+c, 6+c) etc.
                out_vals = []
                for comp in range(3):  # normal xyz
                    a0 = sel(attr_wins[comp])
                    a1 = sel(attr_wins[3 + comp])
                    a2 = sel(attr_wins[6 + comp])
                    out_vals.append(w_sel * a0 + u_sel * a1 + v_sel * a2)
                for comp in range(2):  # uv
                    a0 = sel(attr_wins[9 + comp])
                    a1 = sel(attr_wins[11 + comp])
                    a2 = sel(attr_wins[13 + comp])
                    out_vals.append(w_sel * a0 + u_sel * a1 + v_sel * a2)
                out_vals.append(sel(attr_wins[15]))  # material id
                if num_attr > 16:  # tangents
                    for comp in range(3):
                        a0 = sel(attr_wins[16 + comp])
                        a1 = sel(attr_wins[19 + comp])
                        a2 = sel(attr_wins[22 + comp])
                        out_vals.append(w_sel * a0 + u_sel * a1 + v_sel * a2)

                for k, val in enumerate(out_vals):
                    new[4 + k] = new[4 + k].at[r].set(
                        jnp.where(imp, val, new[4 + k][r])
                    )

            return (sp_in,) + tuple(new[1:])

        return jax.lax.cond(is_leaf, leaf_case, inner_case,
                            (sp,) + tuple(c[1:]))

    out = jax.lax.while_loop(cond, body, init)

    out_ref[0, 0] = out[1]  # t (BIG/-BIG = miss)
    out_ref[0, 1] = out[2]  # u
    out_ref[0, 2] = out[3]  # v
    for k in range(num_out):
        out_ref[0, 3 + k] = out[4 + k]


def _num_out_attrs(with_tangent: bool) -> int:
    # normal3 + uv2 + mat1 (+ tangent3)
    return 9 if with_tangent else 6


def _num_attr_planes(with_tangent: bool) -> int:
    return 25 if with_tangent else 16


def pallas_intersect(
    origin, direction, active, tables: PallasSceneTables,
    stack_depth: int = 64, interpret: bool = False,
) -> Tuple[Hit, PacketAttrs]:
    """Full wavefront intersection via the Pallas kernel."""
    n = origin.shape[0]
    npad = -(-n // PACKET) * PACKET
    wt = tables.with_tangent
    if npad != n:
        pad = npad - n
        origin = jnp.pad(origin, ((0, pad), (0, 0)))
        direction = jnp.pad(direction, ((0, pad), (0, 0)), constant_values=1.0)
        active = jnp.pad(active, (0, pad))
    k = npad // PACKET

    rays = jnp.concatenate(
        [
            origin.T.reshape(3, k, 8, 128).transpose(1, 0, 2, 3),
            direction.T.reshape(3, k, 8, 128).transpose(1, 0, 2, 3),
            active.astype(jnp.float32).reshape(k, 1, 8, 128),
        ],
        axis=1,
    )  # [k, 7, 8, 128]

    na = _num_out_attrs(wt)
    out_planes = 3 + na

    kernel = functools.partial(
        _kernel, stack_depth=stack_depth, num_attr=_num_attr_planes(wt),
        num_out=na,
    )

    def kernel_wrap(nb, nm, geom, attrs, rays_blk, out_blk, stack):
        kernel(nb, nm, geom, attrs, rays_blk[0], out_blk, stack)

    out = pl.pallas_call(
        kernel_wrap,
        out_shape=jax.ShapeDtypeStruct((k, out_planes, 8, 128), jnp.float32),
        grid=(k,),
        in_specs=[
            pl.BlockSpec(tables.node_bounds.shape,
                         lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(tables.node_meta.shape,
                         lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(tables.geom.shape,
                         lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(tables.attrs.shape,
                         lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 7, 8, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, out_planes, 8, 128), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((stack_depth,), jnp.int32)],
        interpret=interpret,
    )(tables.node_bounds, tables.node_meta, tables.geom, tables.attrs, rays)

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
    attrs = PacketAttrs(
        normal=jnp.stack([flat(3), flat(4), flat(5)], axis=-1),
        tangent=(
            jnp.stack([flat(9), flat(10), flat(11)], axis=-1)
            if wt else jnp.zeros((n, 3))
        ),
        uv=jnp.stack([flat(6), flat(7)], axis=-1),
        material=jnp.round(flat(8)).astype(jnp.int32),
    )
    return hit, attrs


def make_pallas_intersector(scene, bvh: PackedBVH, with_tangent: bool,
                            stack_depth: int = 64, interpret: bool = False,
                            vmem_limit_bytes: int = 12 * 1024 * 1024):
    """Rich IntersectFn backed by the Pallas kernel, or None if the scene
    doesn't fit the VMEM budget."""
    tables = build_tables(scene, bvh, with_tangent)
    if tables.vmem_bytes > vmem_limit_bytes:
        return None

    def intersect(origin, direction, act):
        return pallas_intersect(origin, direction, act, tables,
                                stack_depth=stack_depth, interpret=interpret)

    return intersect
