"""Checkpoint/resume: a resumed progressive render must continue the exact
sample stream (bit-identical to an uninterrupted run)."""

import numpy as np

from tracy_tpu.config import RenderConfig
from tracy_tpu.render.renderer import Renderer, init_state
from tracy_tpu.scene.scn_parser import default_scene
from tracy_tpu.utils.checkpoint import (
    load_params,
    load_render_state,
    save_params,
    save_render_state,
)


def test_render_resume_bit_identical(tmp_path):
    scene = default_scene(24, 16).build()
    cfg = RenderConfig(width=24, height=16, spp=1, max_bounces=3,
                       tonemap="none", accel="none")

    # Uninterrupted: 4 frames.
    r1 = Renderer(cfg)
    s1 = init_state(cfg)
    for _ in range(4):
        s1, _ = r1.step(scene, s1)

    # Interrupted after 2, checkpointed, resumed for 2 more.
    r2 = Renderer(cfg)
    s2 = init_state(cfg)
    for _ in range(2):
        s2, _ = r2.step(scene, s2)
    path = str(tmp_path / "ckpt.npz")
    save_render_state(path, s2)

    s3 = load_render_state(path)
    assert int(s3.frame) == 2
    r3 = Renderer(cfg)
    for _ in range(2):
        s3, _ = r3.step(scene, s3)

    np.testing.assert_array_equal(np.asarray(s1.accum), np.asarray(s3.accum))
    assert int(s3.frame) == 4


def test_params_roundtrip(tmp_path):
    from tracy_tpu.diff import TrainableParams, extract_params

    scene = default_scene(8, 8).build()
    params = extract_params(scene)
    path = str(tmp_path / "params.npz")
    save_params(path, params)
    loaded = load_params(path, TrainableParams)
    for a, b in zip(params, loaded):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
