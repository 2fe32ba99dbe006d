"""Headless tests of the viewer loop (VERDICT r4 #8).

ViewerSession is the GUI-free body of the reference's windowed main loop
(win_raytracer.cpp:494-556): process inputs -> camera cut resets
accumulation (TracyEvent::eCameraCut, cpu_trace.cpp:76-78) -> one frame of
tracing -> present. These tests drive it directly, no matplotlib.
"""

import numpy as np
import pytest

from tracy_tpu.apps.viewer import ViewerSession, make_session, preview_config
from tracy_tpu.config import RenderConfig
from tracy_tpu.scene.scn_parser import default_scene

W, H = 128, 64


@pytest.fixture(scope="module")
def session_parts():
    builder = default_scene(W, H)
    scene = builder.build()
    cfg = RenderConfig(width=W, height=H, spp=1, max_bounces=3, accel="bvh")
    return builder, scene, cfg


def fresh_session(session_parts, preview_scale=4):
    builder, scene, cfg = session_parts
    return make_session(builder, scene, cfg, preview_scale)


def test_preview_config_downscale_and_snap():
    cfg = RenderConfig(width=1920, height=1080, spp=1)
    p = preview_config(cfg, 4)
    # 32-multiple snap at 1/4 scale
    assert (p.width, p.height) == (480, 256)
    # off when scale <= 1
    assert preview_config(cfg, 1) is None
    # off when the image is already tiny (downscale would not shrink it)
    assert preview_config(RenderConfig(width=64, height=32, spp=1), 4) is None


def test_camera_cut_resets_accumulation(session_parts):
    sess = fresh_session(session_parts)
    for _ in range(3):
        img = sess.tick(dt=0.0)
    assert int(sess.state.frame) == 3
    assert img.shape == (H, W, 3) and img.dtype == np.uint8

    # WASDQE key -> camera cut: full-res accumulation resets, preview mode
    # engages and renders ITS first frame.
    sess.controller.key_down("w")
    eye_before = sess.controller.state.eye.copy()
    img = sess.tick(dt=0.5)
    assert sess.previewing
    assert int(sess.state.frame) == 0  # full-res accum was reset, not stepped
    assert int(sess.pstate.frame) == 1  # preview stepped once
    assert not np.allclose(sess.controller.state.eye, eye_before)
    # preview output is upscaled to the DISPLAY size
    assert img.shape == (H, W, 3)


def test_preview_snaps_back_to_full_res(session_parts):
    sess = fresh_session(session_parts)
    sess.tick(dt=0.0)
    sess.controller.key_down("w")
    sess.tick(dt=0.5)
    assert sess.previewing and int(sess.pstate.frame) == 1
    # preview renderer really is lower resolution
    assert sess.pcfg.width < W or sess.pcfg.height < H

    # first STILL frame: back to full resolution with fresh accumulation
    img = sess.tick(dt=0.5)
    assert not sess.previewing
    assert int(sess.state.frame) == 1
    assert img.shape == (H, W, 3)

    # still frames keep accumulating (no spurious resets)
    sess.tick(dt=0.5)
    assert int(sess.state.frame) == 2


def test_resize_rederives_resolution_and_projection(session_parts):
    sess = fresh_session(session_parts)
    sess.tick(dt=0.0)
    old_cam = sess.scene.camera

    # WM_SIZE -> UpdateProjection (win_raytracer.cpp:118-124): dims snap to
    # 32-multiples, aspect re-derives, accumulation restarts at the new size.
    sess.request_resize(200, 150)
    img = sess.tick(dt=0.0)
    assert (sess.cfg.width, sess.cfg.height) == (192, 128)
    assert sess.controller.state.aspect == pytest.approx(192 / 128)
    assert int(sess.state.frame) == 1  # fresh accumulation, one frame in
    assert img.shape == (128, 192, 3)
    assert sess.scene.camera is not old_cam  # projection actually updated

    # resizing to the SAME (snapped) size is a no-op: no recompile churn
    r_before, st_frame = sess.renderer, int(sess.state.frame)
    sess.request_resize(193, 129)  # snaps to 192x128 again
    sess.tick(dt=0.0)
    assert sess.renderer is r_before
    assert int(sess.state.frame) == st_frame + 1


def test_mouse_look_is_camera_cut(session_parts):
    sess = fresh_session(session_parts)
    sess.tick(dt=0.0)
    assert int(sess.state.frame) == 1
    sess.controller.mouse_press(10.0, 10.0)
    sess.tick(dt=0.5, mouse_pos=(40.0, 25.0))
    assert sess.previewing and int(sess.state.frame) == 0
    sess.controller.mouse_release()
    sess.tick(dt=0.5)
    assert not sess.previewing and int(sess.state.frame) == 1
