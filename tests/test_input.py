"""Camera controller semantics vs reference TracyProcessInputs
(win_raytracer.cpp:291-363)."""

import numpy as np

from tracy_tpu.apps.input import CameraController, CameraState


def _ctrl():
    return CameraController(CameraState(
        eye=np.array([0.0, 0.0, 10.0]),
        target=np.array([0.0, 0.0, 0.0]),
        up=np.array([0.0, 1.0, 0.0]),
        fov_degrees=60.0,
        aspect=4 / 3,
    ))


def test_wasd_movement():
    c = _ctrl()
    c.key_down("w")
    cut = c.update(dt=0.1)
    assert cut
    # forward = target - eye = (0,0,-10); eye += dt*forward.
    np.testing.assert_allclose(c.state.eye, [0, 0, 9.0])
    # Keys are consumed per frame (reference ResetKeyStatus).
    assert not c.update(dt=0.1)


def test_strafe_right():
    c = _ctrl()
    c.key_down("d")
    c.update(dt=1.0)
    # right = normalize(cross(forward, up)); forward=(0,0,-10), up=+y ->
    # right = (-1, 0, 0)... cross((0,0,-10),(0,1,0)) = (10,0,0) -> +x.
    np.testing.assert_allclose(c.state.eye, [1.0, 0.0, 10.0], atol=1e-12)


def test_vertical_q_e():
    c = _ctrl()
    c.key_down("e")
    c.update(dt=2.0)
    np.testing.assert_allclose(c.state.eye, [0, 2.0, 10.0])
    c.key_down("q")
    c.update(dt=2.0)
    np.testing.assert_allclose(c.state.eye, [0, 0.0, 10.0])


def test_mouse_look_orbits_eye():
    c = _ctrl()
    c.mouse_press(100.0, 100.0)
    cut = c.update(dt=1.0, mouse_pos=(190.0, 100.0))  # 90 deg yaw (dt*delta)
    assert cut
    # Row-vector rotate by +90deg about up applied to eye (0,0,10):
    # p @ R(+90, y) == R(-90) p -> (-10, 0, ~0).
    np.testing.assert_allclose(c.state.eye, [-10.0, 0.0, 0.0], atol=1e-6)
    # Distance to target preserved (orbit).
    np.testing.assert_allclose(np.linalg.norm(c.state.eye - c.state.target), 10.0)


def test_no_cut_without_input():
    c = _ctrl()
    assert not c.update(dt=0.5)
    assert not c.update(dt=0.5, mouse_pos=(5, 5))  # mouse not pressed


def test_to_camera_roundtrip():
    c = _ctrl()
    cam = c.state.to_camera()
    import jax.numpy as jnp

    o, d = cam.generate_rays(jnp.asarray(0.5), jnp.asarray(0.5))
    np.testing.assert_allclose(np.asarray(d), [0, 0, -1], atol=1e-5)
