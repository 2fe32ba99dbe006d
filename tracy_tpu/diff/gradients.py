"""Differentiable rendering: pixel gradients -> scene parameters.

The reference has no differentiability at all; this is the north-star
capability of the TPU framework (BASELINE.json). The whole light path is
differentiable by construction:

* intersection t/uv are smooth functions of vertex positions
  (Möller–Trumbore in jnp; the discrete closest-hit argmin is effectively
  detached, standard for path-space differentiation);
* BRDF/BTDF attenuation and emission are smooth in the material table and
  texture atlas; discrete specular-vs-diffuse and russian-roulette decisions
  are made on stop_gradient'ed probabilities (detached sampling), keeping the
  estimator unbiased;
* the counter-based RNG makes f(theta +/- h) use identical random numbers, so
  finite-difference checks converge (tests/test_gradients.py).

`TrainableParams` selects which leaves of the scene are optimized (albedo,
roughness, metalness, ior, emissive, translucency, texture atlas, vertices);
`make_train_step` returns a jittable optax update step for inverse rendering.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from tracy_tpu.config import RenderConfig
from tracy_tpu.render.renderer import sample_radiance
from tracy_tpu.scene.scene import SceneArrays


class TrainableParams(NamedTuple):
    """The differentiable leaves of a scene, as one pytree."""

    albedo: jnp.ndarray
    roughness: jnp.ndarray
    metalness: jnp.ndarray
    ior: jnp.ndarray
    emissive: jnp.ndarray
    translucent: jnp.ndarray
    tex_data: jnp.ndarray
    vertex_pos: jnp.ndarray


def extract_params(scene: SceneArrays) -> TrainableParams:
    m = scene.materials
    return TrainableParams(
        albedo=m.albedo,
        roughness=m.roughness,
        metalness=m.metalness,
        ior=m.ior,
        emissive=m.emissive,
        translucent=m.translucent,
        tex_data=scene.tex_data,
        vertex_pos=scene.vertex_pos,
    )


def apply_params(scene: SceneArrays, params: TrainableParams) -> SceneArrays:
    import dataclasses

    materials = dataclasses.replace(
        scene.materials,
        albedo=params.albedo,
        roughness=params.roughness,
        metalness=params.metalness,
        ior=params.ior,
        emissive=params.emissive,
        translucent=params.translucent,
    )
    return dataclasses.replace(
        scene, materials=materials, tex_data=params.tex_data, vertex_pos=params.vertex_pos
    )


class GeometryDiffIntersector:
    """Winner-recompute differentiable intersector.

    The fast non-differentiable base intersector (Pallas kernel on TPU /
    interpret mode, XLA packet traversal otherwise) finds each ray's winning
    triangle SLOT; the differentiable outputs (t, barycentric uv, shading
    normal/tangent, texture uv) are then RECOMPUTED in closed form from the
    TRACED scene arrays at that detached winner — Möller–Trumbore partials
    of the winning triangle only, no differentiation through traversal. The
    discrete closest-hit choice is detached (standard in path-space
    differentiation: it changes only on measure-zero visibility
    boundaries), exactly like the brute-force path's detached argmin.

    This replaces round 1's `differentiable_geometry=True` traced-prepare
    path, which could not be reverse-differentiated at all (lax.while_loop
    has no reverse-mode rule) — and it runs the forward at full kernel
    speed.

    Use `bind(traced_scene)` inside the loss so gradients reach the traced
    vertex arrays; `render_loss`/`sample_radiance` callers do this
    automatically via the `bind` duck-type.
    """

    def __init__(self, base, slot_tri, with_tangent: bool, first_base=None):
        self._base = base  # (o, d, act) -> (Hit, PacketAttrs, slot [N] i32)
        self._slot_tri = slot_tri  # [S] i32 slot -> original triangle id
        self._with_tangent = with_tangent
        # Optional uncompacted base for the bounce-0 peel: bind() exposes
        # it as `.first` on the bound fn (render_loss threads it through
        # as trace_paths' first_intersect_fn).
        self._first_base = first_base

    def bind(self, s: SceneArrays):
        slot_tri, with_tangent = self._slot_tri, self._with_tangent
        sg = jax.lax.stop_gradient

        def make_isect(base):
          def isect(o, d, act):
            hit0, attrs0, slot = base(sg(o), sg(d), act)
            hit0 = jax.tree_util.tree_map(sg, hit0)
            attrs0 = jax.tree_util.tree_map(sg, attrs0)
            slot = sg(slot)
            mask = hit0.mask

            tri = slot_tri[jnp.clip(slot, 0, slot_tri.shape[0] - 1)]
            vidx = s.indices[tri]  # [N, 3]
            p0 = s.vertex_pos[vidx[:, 0]]
            p1 = s.vertex_pos[vidx[:, 1]]
            p2 = s.vertex_pos[vidx[:, 2]]
            e1, e2 = p1 - p0, p2 - p0

            # Möller–Trumbore on the winning triangle (collision.h:33-74
            # semantics); misses keep the detached base values.
            pvec = jnp.cross(d, e2)
            det = jnp.sum(e1 * pvec, axis=-1)
            safe = mask & (jnp.abs(det) > 1e-12)
            inv_det = jnp.where(safe, 1.0 / jnp.where(safe, det, 1.0), 0.0)
            tvec = o - p0
            u = jnp.sum(tvec * pvec, axis=-1) * inv_det
            qvec = jnp.cross(tvec, e1)
            v = jnp.sum(d * qvec, axis=-1) * inv_det
            t = jnp.sum(e2 * qvec, axis=-1) * inv_det
            t = jnp.where(safe, t, hit0.t)
            u = jnp.where(safe, u, hit0.uv[:, 0])
            v = jnp.where(safe, v, hit0.uv[:, 1])
            w = 1.0 - u - v

            def interp(table, k):
                a0 = table[vidx[:, 0]][:, :k]
                a1 = table[vidx[:, 1]][:, :k]
                a2 = table[vidx[:, 2]][:, :k]
                return (w[:, None] * a0 + u[:, None] * a1 + v[:, None] * a2)

            mc = mask[:, None]
            normal = jnp.where(mc, interp(s.vertex_normal, 3), attrs0.normal)
            uv_t = jnp.where(mc, interp(s.vertex_uv, 2), attrs0.uv)
            tangent = (
                jnp.where(mc, interp(s.vertex_tangent, 3), attrs0.tangent)
                if with_tangent else attrs0.tangent
            )

            hit = hit0._replace(
                t=t,
                tri=jnp.where(mask, tri, 0),
                uv=jnp.stack([u, v], axis=-1),
            )
            attrs = attrs0._replace(normal=normal, tangent=tangent, uv=uv_t)
            return hit, attrs

          return isect

        isect = make_isect(self._base)
        if self._first_base is not None:
            isect.first = make_isect(self._first_base)
        return isect

    def __call__(self, o, d, act):
        """Unbound call: base values only (no geometry gradients)."""
        hit, attrs, _slot = self._base(o, d, act)
        return hit, attrs


def make_training_intersector(scene: SceneArrays, cfg: RenderConfig,
                              needs_geometry_grads: bool,
                              interpret: bool = False):
    """Best intersector for inverse rendering.

    * materials/textures/emissive only (needs_geometry_grads=False): the
      Pallas kernel wrapped in a zero-gradient VJP — every needed gradient
      flows through the kernel's discrete outputs (see
      ops.pallas_packet.nondiff_intersector), so the forward pass runs at
      full kernel speed (round-1 gap: gradient work was 11x slower on the
      XLA path). Falls back to the XLA packet intersector off-TPU.
    * vertex positions trainable: a GeometryDiffIntersector — the same fast
      forward kernel, with t/uv/normal gradients recomputed at the detached
      winning triangle (see class docstring).
    """
    import jax as _jax

    from tracy_tpu.accel.packet import build_packet_bvh, make_packet_intersector

    on_tpu = _jax.default_backend() not in ("cpu",)
    use_pallas = cfg.use_pallas and (on_tpu or interpret)

    # The FULL production kernel config (round-4 fix: the training path
    # used to run a width-2 tree without slab_batch/row_skip — the train
    # step was forward-bound at ~3x the production render's cost).
    kernel_knobs = dict(
        stack_depth=cfg.traversal_stack_depth, interpret=interpret,
        rb_mode=cfg.pallas_rb_mode, width=cfg.pallas_bvh_width,
        slab_batch=cfg.pallas_slab_batch, row_skip=cfg.pallas_row_skip,
        defer_uv=(cfg.pallas_defer_uv and cfg.pallas_rb_mode == "vlist"),
        packet_rays=cfg.pallas_packet_rays,
    )

    if needs_geometry_grads:
        if use_pallas:
            from tracy_tpu.ops.pallas_packet import make_pallas_intersector

            bvh, _ = build_packet_bvh(scene, leaf_size=cfg.pallas_leaf_size,
                                      cost_mode="chunks")
            base = make_pallas_intersector(
                scene, bvh, with_tangent=True,
                return_slot=True, **kernel_knobs,
            )
            if base is not None:
                inner = base
                first = None
                if cfg.wave_compact_group > 0:
                    from tracy_tpu.accel.reorder import (
                        compact_intersector_slot,
                    )

                    inner = compact_intersector_slot(
                        base, cfg.wave_compact_group, route_tangent=True)
                    if cfg.wave_compact_skip_first:
                        first = base  # bounce-0 peel (all-live wave)
                return GeometryDiffIntersector(
                    inner, base.tables.slot_tri, with_tangent=True,
                    first_base=first,
                )
        bvh, _ = build_packet_bvh(scene, leaf_size=cfg.packet_leaf_size)
        base = make_packet_intersector(
            scene, bvh, with_tangent=True, leaf_size=cfg.packet_leaf_size,
            return_slot=True,
        )
        return GeometryDiffIntersector(base, base.slot_tri, with_tangent=True)

    if use_pallas:
        from tracy_tpu.ops.pallas_packet import (
            make_pallas_intersector, nondiff_intersector,
        )

        from tracy_tpu.scene.scene import TEX_NORMAL
        import numpy as _np

        wt = bool((_np.asarray(
            scene.materials.tex_index)[:, TEX_NORMAL] >= 0).any())
        bvh, _ = build_packet_bvh(scene, leaf_size=cfg.pallas_leaf_size,
                                  cost_mode="chunks")
        isect = make_pallas_intersector(
            scene, bvh, with_tangent=wt, **kernel_knobs,
        )
        if isect is not None:
            wrapped = nondiff_intersector(isect)
            if cfg.wave_compact_group > 0:
                # Per-wave live-ray compaction composes with training: the
                # butterfly routing is pure selects (VJP-exact), and the
                # material/texture gradients flow through the routed
                # DISCRETE outputs exactly as through the unrouted ones.
                # (The geometry path keeps its own uncompacted base — its
                # winner-slot side output isn't routed.)
                from tracy_tpu.accel.reorder import compact_intersector

                raw = wrapped
                wrapped = compact_intersector(
                    wrapped, cfg.wave_compact_group, route_tangent=True)
                if cfg.wave_compact_skip_first:
                    wrapped.first = raw  # bounce-0 peel (all-live wave)
            return wrapped

    bvh, _ = build_packet_bvh(scene, leaf_size=cfg.packet_leaf_size)
    return make_packet_intersector(scene, bvh, with_tangent=True,
                                   leaf_size=cfg.packet_leaf_size)


def render_loss(
    params: TrainableParams,
    scene: SceneArrays,
    target: jnp.ndarray,  # [H, W, 3] linear radiance target
    cfg: RenderConfig,
    frame: jnp.ndarray,
    intersect_fn=None,
) -> jnp.ndarray:
    """MSE between a rendered frame (spp samples at RNG position `frame`) and
    the target. Differentiable w.r.t. `params`."""
    s = apply_params(scene, params)
    if hasattr(intersect_fn, "bind"):
        # GeometryDiffIntersector: rebind to the traced scene so vertex
        # gradients flow through the winner recompute.
        intersect_fn = intersect_fn.bind(s)
    radiance, _rays = sample_radiance(
        s, cfg, frame, intersect_fn,
        # Bounce-0 compaction peel (bit-identical; see trace_paths).
        first_intersect_fn=getattr(intersect_fn, "first", None),
    )
    return jnp.mean((radiance - target) ** 2)


def make_train_step(scene: SceneArrays, cfg: RenderConfig, optimizer,
                    intersect_fn=None, jit: bool = True,
                    trainable_mask: Optional[TrainableParams] = None):
    """Returns (step_fn, init_opt_state).

    step_fn(params, opt_state, target, frame) -> (params', opt_state', loss)
    is the full inverse-rendering training step: render -> loss -> backprop
    through the bounce loop -> optax update.

    trainable_mask: optional pytree (matching TrainableParams, entries 0/1 or
    bool) selecting which parameters receive updates. Inverse problems are
    heavily under-determined — without a mask, e.g. emissive/metalness can
    compensate for a wrong albedo.
    """

    def step(params: TrainableParams, opt_state, target, frame):
        loss, grads = jax.value_and_grad(render_loss)(
            params, scene, target, cfg, frame, intersect_fn
        )
        if trainable_mask is not None:
            grads = jax.tree_util.tree_map(
                lambda g, m: g * jnp.asarray(m, g.dtype), grads, trainable_mask
            )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax

        params = optax.apply_updates(params, updates)
        if trainable_mask is not None:
            # Keep masked-out params bit-identical (adam eps can still move them).
            base = extract_params(scene)
            params = jax.tree_util.tree_map(
                lambda p, b, m: jnp.where(jnp.asarray(m, bool), p, b),
                params, base, trainable_mask,
            )
        return params, opt_state, loss

    if jit:
        step = jax.jit(step)
    init = optimizer.init(extract_params(scene))
    return step, init
