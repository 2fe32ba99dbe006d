"""Gather-free wave compaction: route live rays to the front of each block.

After the first bounce, rays scatter and die (sky misses, Russian
roulette): a 1024-ray packet keeps paying full traversal cost for a
handful of incoherent survivors (reference analogue: the thread-divergence
cost of cuda_trace.cu:73-135's per-pixel bounce loop). The classic GPU fix
— stream compaction — needs scatters/gathers, which serialize on TPU XLA
(~600ns/element, measured). This module compacts with PURE dense algebra:

  * each live ray's move distance within its block is the number of dead
    rays before it (exclusive cumsum of the dead mask — TPU-fast in XLA);
  * the move executes as a log2(group)-stage BUTTERFLY: stage j shifts an
    element down by 2^j iff bit j of its distance is set. For a monotone
    routing (compaction keeps relative order, so current positions stay
    strictly increasing at every stage — see proof in _route) the stages
    are collision-free. Each stage is one static intra-block shift + a
    select: zero gathers, zero matmuls, O(planes * log group) HBM traffic;
  * a `valid` plane travels with the payload so stale copies left behind
    by a move can never source a later move;
  * the intersection results route BACK by running the same stages in
    reverse bit order with up-shifts (the exact inverse permutation).

Block-local compaction (group = a few adjacent 1024-ray packets, i.e. a
few adjacent 32x32 image tiles) preserves ray locality while concentrating
a wave's survivors into fewer dense packets; fully-dead packets exit the
Pallas kernel after a single root-node visit. Measured motivation
(tools/traversal_stats.py, dragon wave 2): live-compaction drops the
per-wave BVH visit totals ~1.8x, and at an 0.3 live fraction it turns
~every-packet-partially-live into ~1-in-3-packets-live.

Routing moves bit patterns verbatim (selects, no arithmetic), so the
wrapped intersector is bit-exact per ray vs the unwrapped one (up to
closest-hit ties between equal-t triangles, where packet composition may
legitimately pick either winner).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


# Compaction pays when the traversal cost it saves on sparse waves
# exceeds the butterfly routing it adds — which needs BOTH the per-
# live-packet cost to be high AND rays to actually die (a sparse wave
# to compact). Static proxies, both measured at 1080p 4spp (V2/Z2 +
# round-5 session D calibration, logs/r5_session_d.log):
# * tri count (per-packet traversal cost): helmet 15,452 tris runs
#   +78% WITHOUT compaction (21.8 -> 38.7 MRays/s; the butterfly was
#   22.5% of its frame + most of the 27% data staging); dragon 100,024
#   runs -36% without (9.27 -> 5.91); spheres 49,600 likes it ON
#   (18.5 vs 17.4).
# * round-5 sphere-grid sweep (ON vs OFF): 20,108 tris 24.4/22.1,
#   36,236 20.8/15.9, 68,492 18.9/14.3, 133,004 9.9/5.3, 262,028
#   7.8/4.1, 520,076 6.9/3.7 — ON wins everywhere down to 20K tris,
#   so the threshold sits between helmet (15,452, OFF by +78%) and the
#   20K grid: 16,384.
# * translucent materials (rays refract THROUGH and survive RR for all
#   bounces -> waves never thin out the cheap way): random.scn is only
#   13,973 tris but collapses without compaction (15.5 -> 7.2).
COMPACT_MIN_TRIS = 16384


def pick_compact_group(n_rays: int, max_group: int = 262144,
                       max_pad: float = 0.125,
                       num_tris: int | None = None,
                       has_translucent: bool | None = None) -> int:
    """Largest power-of-two compaction group <= max_group whose wave
    padding stays under max_pad; 0 (compaction off) for traversal-light
    OPAQUE scenes when scene statistics are given (see the regime notes
    above — translucent scenes keep rays alive too long to skip it).

    The compactor pads each wave up to a multiple of the group, and every
    padded lane traces as a dead ray. A naive "largest power of two <= n"
    clamp can still nearly double the wave: 640x480 = 307200 rays with
    group 262144 pads to 524288 (+71% dead lanes). Bigger groups compact
    better (deeper routing, denser packets), so take the largest group
    that keeps the pad overhead bounded.
    """
    if (num_tris is not None and num_tris < COMPACT_MIN_TRIS
            and has_translucent is False):
        return 0
    g = max_group
    while g > 2048:
        npad = -(-n_rays // g) * g
        if (npad - n_rays) / n_rays <= max_pad:
            return g
        g //= 2
    return g


def _stage_down(x, valid, dist, shift, group):
    """One butterfly stage, moving flagged elements DOWN by `shift`.

    x: [B, G, C]; valid: [B, G, 1] f32 0/1; dist: [B, G, 1] i32.
    An element moves iff it is valid and bit `shift` of its distance is
    set. Slots vacated without replacement keep a stale copy but lose
    their valid flag; moved-into slots become valid.
    """
    bit = jnp.int32(shift)

    def pull(a, fill):
        # incoming[p] = a[p + shift] (no wraparound: fill at the block end)
        pad = jnp.full_like(a[:, :shift], fill)
        return jnp.concatenate([a[:, shift:], pad], axis=1)

    moving = (valid > 0.5) & ((dist & bit) != 0)  # [B, G, 1] this slot leaves
    inc = pull(moving, False)  # [B, G, 1] True: slot p+shift's element arrives
    x = jnp.where(inc, pull(x, 0.0), x)
    dist = jnp.where(inc, pull(dist, 0), dist)
    valid = jnp.where(inc, 1.0, jnp.where(moving, 0.0, valid))
    return x, valid, dist


def _stage_up(x, valid, dist, shift, group):
    """Inverse butterfly stage: flagged elements move UP by `shift`."""
    bit = jnp.int32(shift)

    def push(a, fill):
        # incoming[p] = a[p - shift]
        pad = jnp.full_like(a[:, :shift], fill)
        return jnp.concatenate([pad, a[:, :-shift]], axis=1)

    moving = (valid > 0.5) & ((dist & bit) != 0)
    inc = push(moving, False)
    x = jnp.where(inc, push(x, 0.0), x)
    dist = jnp.where(inc, push(dist, 0), dist)
    valid = jnp.where(inc, 1.0, jnp.where(moving, 0.0, valid))
    return x, valid, dist


def _route(x, valid, dist, group: int, down: bool):
    """Run all butterfly stages (LSB->MSB down, MSB->LSB up).

    Collision-freedom: with c_i the current position of live element i
    after processing bits < j (c_i = i - (d_i & (2^j - 1))), for i < i'
    we have d_i' - d_i <= i' - i - 1 (distances count dead slots strictly
    before the element, and i itself is live) and (a & m) - (b & m) <= a-b
    for a >= b, m+1 a power of two; hence c_i' - c_i >= 1 at every stage —
    no two live elements ever occupy or move into the same slot.
    """
    stages = []
    s = 1
    while s < group:
        stages.append(s)
        s *= 2
    if not down:
        stages.reverse()
    step = _stage_down if down else _stage_up
    for s in stages:
        x, valid, dist = step(x, valid, dist, s, group)
    return x, valid, dist


def compact_rays(
    origin: jnp.ndarray, direction: jnp.ndarray, active: jnp.ndarray,
    group: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Compact live rays to the front of each `group`-ray block.

    N must be a multiple of `group`. Returns (origin_c, direction_c,
    active_c, dist_c [N] i32, valid_c [N,1] f32) — the latter two feed
    `scatter_results` to route intersection outputs back.
    """
    n = origin.shape[0]
    b = n // group
    dead = (~active).astype(jnp.int32).reshape(b, group)
    # exclusive cumsum: dead slots strictly before each position.
    dist = (jnp.cumsum(dead, axis=1) - dead)[..., None]  # [B, G, 1]
    payload = jnp.concatenate([origin, direction], axis=1).reshape(b, group, 6)
    valid = active.astype(jnp.float32).reshape(b, group, 1)
    x, valid_c, dist_c = _route(payload, valid, dist, group, down=True)
    o_c = x[..., 0:3].reshape(n, 3)
    d_c = x[..., 3:6].reshape(n, 3)
    a_c = (valid_c > 0.5).reshape(n)
    return o_c, d_c, a_c, dist_c.reshape(n), valid_c.reshape(n)


def scatter_results(
    planes: jnp.ndarray, dist_c: jnp.ndarray, valid_c: jnp.ndarray,
    group: int,
) -> jnp.ndarray:
    """Route result planes [N, C] from compacted slots back to ray order."""
    n, c = planes.shape
    b = n // group
    x, _, _ = _route(
        planes.reshape(b, group, c),
        valid_c.reshape(b, group, 1),
        dist_c.astype(jnp.int32).reshape(b, group, 1),
        group,
        down=False,
    )
    return x.reshape(n, c)


def compact_intersector(intersect_fn, group: int = 4096,
                        route_tangent: bool = True):
    """Wrap a RICH IntersectFn (returns (Hit, PacketAttrs)) with per-wave
    live-ray compaction. Pads the ray count to a multiple of `group` with
    dead rays (the Pallas path packs rays into 1024-ray packets, so keep
    group a multiple of 1024). route_tangent=False skips the tangent
    result planes (they are all-zero when no material has a normal map)."""
    assert group & (group - 1) == 0, "group must be a power of two"

    def wrapped(origin, direction, active):
        from tracy_tpu.accel.packet import PacketAttrs
        from tracy_tpu.render.intersect import FLT_MAX, Hit

        n = origin.shape[0]
        npad = -(-n // group) * group
        if npad != n:
            p = npad - n
            origin = jnp.pad(origin, ((0, p), (0, 0)))
            direction = jnp.pad(direction, ((0, p), (0, 0)),
                                constant_values=1.0)
            active = jnp.pad(active, (0, p))

        o_c, d_c, a_c, dist_c, valid_c = compact_rays(
            origin, direction, active, group
        )
        hit, attrs = intersect_fn(o_c, d_c, a_c)

        planes = [
            hit.t[:, None],
            hit.uv,
            hit.mask.astype(jnp.float32)[:, None],
            attrs.normal,
            attrs.uv,
            attrs.material.astype(jnp.float32)[:, None],
        ]
        if route_tangent:
            planes.append(attrs.tangent)
        r = scatter_results(
            jnp.concatenate(planes, axis=1), dist_c, valid_c, group
        )
        live = active[:n]
        mask = (r[:n, 3] > 0.5) & live
        hit_out = Hit(
            t=jnp.where(mask, r[:n, 0], FLT_MAX),
            tri=jnp.zeros((n,), jnp.int32),
            uv=jnp.where(live[:, None], r[:n, 1:3], 0.0),
            mask=mask,
        )
        attrs_out = PacketAttrs(
            normal=jnp.where(live[:, None], r[:n, 4:7], 0.0),
            tangent=(
                jnp.where(live[:, None], r[:n, 10:13], 0.0)
                if route_tangent else jnp.zeros((n, 3), r.dtype)
            ),
            uv=jnp.where(live[:, None], r[:n, 7:9], 0.0),
            material=jnp.where(
                live, jnp.round(r[:n, 9]), 0.0
            ).astype(jnp.int32),
        )
        return hit_out, attrs_out

    return wrapped


def compact_bounce(bounce_fn, group: int = 4096):
    """Wrap a FUSED-BOUNCE fn (ops/pallas_packet.pallas_trace_bounce
    signature minus the static config: (o, d, thr, rad, alive, pix, skey,
    bounce) -> next (o, d, thr, rad, alive)) with per-wave live-ray
    compaction. All 14 state planes route down (pixel ids as raw bits);
    the 13 next-state planes route back; dead lanes keep their original
    state verbatim (exactly the uncompacted kernel's pass-through)."""
    assert group & (group - 1) == 0, "group must be a power of two"

    def wrapped(origin, direction, throughput, radiance, alive, pix,
                sample_key, bounce):
        n = origin.shape[0]
        npad = -(-n // group) * group
        if npad != n:
            p = npad - n
            origin = jnp.pad(origin, ((0, p), (0, 0)))
            direction = jnp.pad(direction, ((0, p), (0, 0)),
                                constant_values=1.0)
            throughput = jnp.pad(throughput, ((0, p), (0, 0)))
            radiance = jnp.pad(radiance, ((0, p), (0, 0)))
            alive = jnp.pad(alive, (0, p))
            pix = jnp.pad(pix, (0, p))

        b = npad // group
        pixf = jax.lax.bitcast_convert_type(
            pix.astype(jnp.uint32), jnp.float32)
        dead = (~alive).astype(jnp.int32).reshape(b, group)
        dist = (jnp.cumsum(dead, axis=1) - dead)[..., None]
        payload = jnp.concatenate(
            [origin, direction, throughput, radiance, pixf[:, None]], axis=1
        ).reshape(b, group, 13)
        valid = alive.astype(jnp.float32).reshape(b, group, 1)
        x, valid_c, dist_c = _route(payload, valid, dist, group, down=True)
        o_c = x[..., 0:3].reshape(npad, 3)
        d_c = x[..., 3:6].reshape(npad, 3)
        t_c = x[..., 6:9].reshape(npad, 3)
        r_c = x[..., 9:12].reshape(npad, 3)
        pix_c = jax.lax.bitcast_convert_type(
            x[..., 12].reshape(npad), jnp.uint32)
        a_c = (valid_c > 0.5).reshape(npad)

        o2, d2, t2, r2, a2 = bounce_fn(o_c, d_c, t_c, r_c, a_c, pix_c,
                                       sample_key, bounce)

        planes = jnp.concatenate(
            [o2, d2, t2, r2, a2.astype(jnp.float32)[:, None]], axis=1)
        r = scatter_results(planes, dist_c.reshape(npad),
                            valid_c.reshape(npad), group)
        live = alive[:n]

        def sel(lo, hi, orig):
            return jnp.where(live[:, None], r[:n, lo:hi], orig[:n])

        return (
            sel(0, 3, origin), sel(3, 6, direction), sel(6, 9, throughput),
            sel(9, 12, radiance),
            jnp.where(live, r[:n, 12] > 0.5, False),
        )

    return wrapped


def compact_intersector_slot(intersect_fn, group: int = 4096,
                             route_tangent: bool = True):
    """compact_intersector for SLOT-returning rich intersectors
    ((o, d, act) -> (Hit, PacketAttrs, slot [N] i32)): the winner-slot
    plane rides the route as raw i32 bits (selects move bits verbatim).
    Used by the geometry-training path (diff/gradients.py)."""
    assert group & (group - 1) == 0, "group must be a power of two"

    def wrapped(origin, direction, active):
        from tracy_tpu.accel.packet import PacketAttrs
        from tracy_tpu.render.intersect import FLT_MAX, Hit

        n = origin.shape[0]
        npad = -(-n // group) * group
        if npad != n:
            p = npad - n
            origin = jnp.pad(origin, ((0, p), (0, 0)))
            direction = jnp.pad(direction, ((0, p), (0, 0)),
                                constant_values=1.0)
            active = jnp.pad(active, (0, p))

        o_c, d_c, a_c, dist_c, valid_c = compact_rays(
            origin, direction, active, group
        )
        hit, attrs, slot = intersect_fn(o_c, d_c, a_c)

        slot_bits = jax.lax.bitcast_convert_type(
            slot.astype(jnp.int32), jnp.float32)
        planes = [
            hit.t[:, None],
            hit.uv,
            hit.mask.astype(jnp.float32)[:, None],
            attrs.normal,
            attrs.uv,
            attrs.material.astype(jnp.float32)[:, None],
            slot_bits[:, None],
        ]
        if route_tangent:
            planes.append(attrs.tangent)
        r = scatter_results(
            jnp.concatenate(planes, axis=1), dist_c, valid_c, group
        )
        live = active[:n]
        mask = (r[:n, 3] > 0.5) & live
        hit_out = Hit(
            t=jnp.where(mask, r[:n, 0], FLT_MAX),
            tri=jnp.zeros((n,), jnp.int32),
            uv=jnp.where(live[:, None], r[:n, 1:3], 0.0),
            mask=mask,
        )
        attrs_out = PacketAttrs(
            normal=jnp.where(live[:, None], r[:n, 4:7], 0.0),
            tangent=(
                jnp.where(live[:, None], r[:n, 11:14], 0.0)
                if route_tangent else jnp.zeros((n, 3), r.dtype)
            ),
            uv=jnp.where(live[:, None], r[:n, 7:9], 0.0),
            material=jnp.where(
                live, jnp.round(r[:n, 9]), 0.0
            ).astype(jnp.int32),
        )
        slot_out = jnp.where(
            mask,
            jax.lax.bitcast_convert_type(r[:n, 10], jnp.int32),
            -1,
        )
        return hit_out, attrs_out, slot_out

    return wrapped


# --------------------------------------------------------------------------
# PAIR-MERGE: single-select packet merging (round-5 helmet lever).
#
# The butterfly compacts perfectly but costs log2(group) full passes over
# every routed plane — on traversal-light scenes that overhead EXCEEDS the
# traversal it saves (helmet: compaction off = +78%). Yet helmet's
# remaining intersect share (49.5% of the frame, X2 trace) is sparse late
# waves: a few live lanes per 4096-ray packet, each packet still paying
# the ~13.7us plumbing floor + its visits.
#
# Pair-merge is the O(1)-stage alternative: pair packets at stride s and
# move packet B's live lanes into packet A's SAME-POSITION dead lanes
# with one elementwise select (no cumsum, no staging). Collisions (both
# live at one position) are retried with lane-ROTATED copies of B (roll
# 64/128/...): each probe is one more select. After k probes the B packet
# is almost empty -> fully-dead packets cost nothing (block_skip), and A
# packets run denser. Results route back through the same selects in
# reverse — bit-exact per ray (selects move bits verbatim; only packet
# composition changes, i.e. equal-t tie winners, the accepted
# statistical-parity class).
# --------------------------------------------------------------------------


def _pm_pair(x, s):
    """View the packet axis [B, ...] as (pairs, 2, s, ...) at stride s:
    returns (A, B) halves. B must be a multiple of 2s (guaranteed by the
    wrapper's padding to a power-of-two packet count)."""
    b = x.shape[0]
    v = x.reshape((b // (2 * s), 2, s) + x.shape[1:])
    return v[:, 0], v[:, 1]


def _pm_unpair(a, bp, s):
    v = jnp.stack([a, bp], axis=1)
    return v.reshape((-1,) + a.shape[2:])


def _pm_schedule(rounds: int, probes: int, p_lanes: int, b_packets: int):
    """Static (stride, roll) schedule shared by forward and backward —
    kept OUT of the returned pytree so the ints never become tracers
    across jit boundaries. Rounds whose stride exceeds the packet count
    are dropped (tiny waves)."""
    sched = []
    for r in range(rounds):
        s = 1 << r
        if 2 * s > b_packets:
            break
        for pi in range(probes):
            roll = 0 if pi == 0 else min(64 * (1 << (pi - 1)), p_lanes // 2)
            sched.append((s, roll))
    return sched


def pair_merge_forward(planes, alive, rounds: int, probes: int):
    """planes: [B, P, C] payload; alive: [B, P] bool. Returns (planes,
    alive, takes) — takes is the per-(round, probe) list of masks in B
    coordinates [pairs, s, P] needed to route results back."""
    takes = []
    for s, roll in _pm_schedule(rounds, probes, alive.shape[1],
                                alive.shape[0]):
        xa, xb = _pm_pair(planes, s)
        aa, ab = _pm_pair(alive, s)
        ab_r = jnp.roll(ab, -roll, axis=-1)  # ab_r[j] = ab[j + roll]
        take_a = (~aa) & ab_r  # in A coords
        xb_r = jnp.roll(xb, -roll, axis=-2)
        xa = jnp.where(take_a[..., None], xb_r, xa)
        aa = aa | take_a
        take_b = jnp.roll(take_a, roll, axis=-1)  # in B coords
        ab = ab & ~take_b
        planes = _pm_unpair(xa, xb, s)
        alive = _pm_unpair(aa, ab, s)
        takes.append(take_b)
    return planes, alive, takes


def pair_merge_backward(out, takes, rounds: int, probes: int):
    """Route result planes [B, P, C] back: for each recorded take (in
    reverse), the lane B[j] that computed in A[j - roll] reclaims A's
    result."""
    sched = _pm_schedule(rounds, probes, out.shape[1], out.shape[0])
    for (s, roll), take_b in zip(reversed(sched), reversed(takes)):
        oa, ob = _pm_pair(out, s)
        oa_r = jnp.roll(oa, roll, axis=-2)  # oa_r[j] = oa[j - roll]
        ob = jnp.where(take_b[..., None], oa_r, ob)
        out = _pm_unpair(oa, ob, s)
    return out


def pair_merge_intersector(intersect_fn, rounds: int = 2, probes: int = 3,
                           packet: int = 4096, route_tangent: bool = True):
    """Wrap a RICH IntersectFn with pair-merge sparsity routing (see
    module notes above). rounds = packet-pair merge rounds (stride
    doubles); probes = same-position + rotated retries per round."""

    def wrapped(origin, direction, active):
        from tracy_tpu.accel.packet import PacketAttrs
        from tracy_tpu.render.intersect import FLT_MAX, Hit

        n = origin.shape[0]
        # pad to a power-of-two packet count so every round pairs cleanly
        b0 = -(-n // packet)
        b = 1 << (b0 - 1).bit_length()
        npad = b * packet
        if npad != n:
            p = npad - n
            origin = jnp.pad(origin, ((0, p), (0, 0)))
            direction = jnp.pad(direction, ((0, p), (0, 0)),
                                constant_values=1.0)
            active = jnp.pad(active, (0, p))

        payload = jnp.concatenate([origin, direction], axis=1).reshape(
            b, packet, 6)
        alive = active.reshape(b, packet)
        payload, alive_m, takes = pair_merge_forward(
            payload, alive, rounds, probes)
        o_c = payload[..., 0:3].reshape(npad, 3)
        d_c = payload[..., 3:6].reshape(npad, 3)
        a_c = alive_m.reshape(npad)

        hit, attrs = intersect_fn(o_c, d_c, a_c)

        planes = [
            hit.t[:, None],
            hit.uv,
            hit.mask.astype(jnp.float32)[:, None],
            attrs.normal,
            attrs.uv,
            attrs.material.astype(jnp.float32)[:, None],
        ]
        if route_tangent:
            planes.append(attrs.tangent)
        r = pair_merge_backward(
            jnp.concatenate(planes, axis=1).reshape(b, packet, -1), takes,
            rounds, probes,
        ).reshape(npad, -1)
        live = active.reshape(-1)[:n]
        mask = (r[:n, 3] > 0.5) & live
        hit_out = Hit(
            t=jnp.where(mask, r[:n, 0], FLT_MAX),
            tri=jnp.zeros((n,), jnp.int32),
            uv=jnp.where(live[:, None], r[:n, 1:3], 0.0),
            mask=mask,
        )
        attrs_out = PacketAttrs(
            normal=jnp.where(live[:, None], r[:n, 4:7], 0.0),
            tangent=(
                jnp.where(live[:, None], r[:n, 10:13], 0.0)
                if route_tangent else jnp.zeros((n, 3), r.dtype)
            ),
            uv=jnp.where(live[:, None], r[:n, 7:9], 0.0),
            material=jnp.where(
                live, jnp.round(r[:n, 9]), 0.0
            ).astype(jnp.int32),
        )
        return hit_out, attrs_out

    return wrapped
