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
    * vertex positions trainable: the XLA packet intersector with traced
      geometry preparation, so t/uv/normal gradients reach vertex_pos.
    """
    import jax as _jax

    from tracy_tpu.accel.packet import build_packet_bvh, make_packet_intersector

    if needs_geometry_grads:
        bvh, _ = build_packet_bvh(scene, leaf_size=cfg.packet_leaf_size)
        return make_packet_intersector(
            scene, bvh, with_tangent=True, differentiable_geometry=True,
            leaf_size=cfg.packet_leaf_size,
        )

    on_tpu = _jax.default_backend() not in ("cpu",)
    if cfg.use_pallas and (on_tpu or interpret):
        from tracy_tpu.ops.pallas_packet import (
            build_tables, make_pallas_intersector, nondiff_intersector,
        )

        bvh, _ = build_packet_bvh(scene, leaf_size=cfg.pallas_leaf_size)
        isect = make_pallas_intersector(
            scene, bvh, with_tangent=True,
            stack_depth=cfg.traversal_stack_depth, interpret=interpret,
        )
        if isect is not None:
            return nondiff_intersector(isect)

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
    radiance, _rays = sample_radiance(s, cfg, frame, intersect_fn)
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
