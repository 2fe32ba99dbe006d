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
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tracy_tpu.config import RenderConfig
from tracy_tpu.core.camera import pixel_samples
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


def sample_radiance(
    scene: SceneArrays,
    cfg: RenderConfig,
    frame: jnp.ndarray,
    intersect_fn=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One frame of spp jittered samples -> (mean radiance [H,W,3], rays []).

    Differentiable w.r.t. scene arrays. `frame` advances the RNG stream.
    """
    h, w, spp = cfg.height, cfg.width, cfg.spp
    if intersect_fn is None:
        intersect_fn = make_bruteforce_intersector(scene)

    rng = RngSpec(cfg.rng, cfg.seed)
    pixel_idx = jnp.arange(h * w, dtype=jnp.uint32).reshape(h, w)

    def one_sample(s):
        sample_key = frame.astype(jnp.uint32) * jnp.uint32(spp) + jnp.uint32(s)
        ju = rng.uniform(pixel_idx, sample_key, JITTER_BOUNCE, 0)
        jv = rng.uniform(pixel_idx, sample_key, JITTER_BOUNCE, 1)
        ss, tt = pixel_samples(w, h, ju, jv)
        origin, direction = scene.camera.generate_rays(ss, tt)
        origin = origin.reshape(-1, 3)
        direction = direction.reshape(-1, 3)

        if cfg.aov != "beauty":
            radiance = trace_aov(scene, origin, direction, cfg, intersect_fn)
            rays = jnp.asarray(h * w, dtype=jnp.int32)
        else:
            radiance, rays = trace_paths(
                scene,
                origin,
                direction,
                pixel_idx.reshape(-1),
                sample_key,
                cfg,
                intersect_fn,
            )
        return radiance.reshape(h, w, 3), rays

    if spp == 1:
        return one_sample(jnp.asarray(0, dtype=jnp.uint32))

    radiance, rays = jax.lax.map(
        one_sample, jnp.arange(spp, dtype=jnp.uint32)
    )
    return jnp.mean(radiance, axis=0), jnp.sum(rays)


def render_step(
    scene: SceneArrays, state: RenderState, cfg: RenderConfig, intersect_fn=None
) -> Tuple[RenderState, jnp.ndarray]:
    """One progressive frame: sample, accumulate, bump the frame counter."""
    radiance, rays = sample_radiance(scene, cfg, state.frame, intersect_fn)
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
        self._factory = intersector_factory
        self._jit_step = jax.jit(self._step_impl, donate_argnums=(1,))
        self.timer = Timer()
        self.total_rays = 0.0

    def _ensure_accel(self, scene: SceneArrays):
        """Build the acceleration structure once per renderer (host-side;
        equivalent of the reference kernel Startup -> ProcessScene boundary,
        cpu_details.cpp:26-86)."""
        if self._factory is not None:
            return
        if self.cfg.accel == "bvh":
            from tracy_tpu.accel.bvh import build_scene_bvh, make_bvh_intersector

            host, dev = build_scene_bvh(
                scene,
                leaf_size=self.cfg.bvh_leaf_size,
                max_depth=max(self.cfg.traversal_stack_depth - 4, 8),
            )
            leaf = self.cfg.bvh_leaf_size
            depth = self.cfg.traversal_stack_depth
            self._factory = lambda sc: make_bvh_intersector(
                sc, dev, leaf_size=leaf, stack_depth=depth
            )
        else:
            self._factory = lambda sc: make_bruteforce_intersector(sc)

    def _step_impl(self, scene: SceneArrays, state: RenderState):
        return render_step(scene, state, self.cfg, self._factory(scene))

    def reset(self) -> RenderState:
        self.total_rays = 0.0
        self.timer.reset()
        return init_state(self.cfg)

    def step(self, scene: SceneArrays, state: RenderState):
        self._ensure_accel(scene)
        self.timer.begin()
        state, rays = self._jit_step(scene, state)
        state.accum.block_until_ready()
        self.timer.end()
        self.total_rays += float(rays)
        return state, rays

    def display(self, state: RenderState) -> np.ndarray:
        return np.asarray(film.tonemap(state.accum, self.cfg))

    def display_u8(self, state: RenderState) -> np.ndarray:
        return np.asarray(film.to_u8(film.tonemap(state.accum, self.cfg)))

    @property
    def mrays_per_sec(self) -> float:
        t = self.timer.total
        return (self.total_rays / 1e6) / t if t > 0 else 0.0
