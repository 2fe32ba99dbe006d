"""Camera controller: FPS-style keyboard movement + mouse look.

Host-side equivalent of the reference input layer (src/input.h:9-78 Input
state, and TracyProcessInputs, win_raytracer.cpp:291-363). Semantics matched:

* WASDQE move the eye along forward/right/up scaled by dt (target fixed);
* left-drag mouse look: delta = dt * (pos - grab_pos), rotate the EYE
  position about the TARGET by delta.x around up and delta.y around right
  (row-vector `vec4(pos) * rotation`, i.e. the transpose/inverse rotation);
* any change reports a "camera cut" which resets progressive accumulation
  (TracyEvent::eCameraCut -> ResetFrameCounter).

The controller is pure state -> state; GUI frameworks (the matplotlib viewer,
tests) feed it events.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from tracy_tpu.core import math as tm
from tracy_tpu.core.camera import Camera

MOVEMENT_KEYS = ("w", "a", "s", "d", "q", "e")


@dataclasses.dataclass
class CameraState:
    eye: np.ndarray
    target: np.ndarray
    up: np.ndarray
    fov_degrees: float
    aspect: float

    def to_camera(self) -> Camera:
        return Camera.setup(self.eye, self.target, self.up, self.fov_degrees, self.aspect)


class CameraController:
    def __init__(self, state: CameraState):
        self.state = state
        self.keys: set = set()
        self.mouse_down = False
        self._grab_pos: Optional[np.ndarray] = None

    # -- event feeds ---------------------------------------------------------

    def key_down(self, key: str):
        if key in MOVEMENT_KEYS:
            self.keys.add(key)

    def key_up(self, key: str):
        self.keys.discard(key)

    def mouse_press(self, x: float, y: float):
        self.mouse_down = True
        self._grab_pos = np.array([x, y], dtype=np.float64)

    def mouse_release(self):
        self.mouse_down = False
        self._grab_pos = None

    # -- update (one per frame, like TracyProcessInputs) ---------------------

    def update(self, dt: float, mouse_pos: Optional[Tuple[float, float]] = None) -> bool:
        """Advance the camera; returns True on camera cut (reset accumulation)."""
        s = self.state
        cut = False

        if self.keys:
            forward = s.target - s.eye
            right = np.cross(forward, s.up)
            right = right / max(np.linalg.norm(right), 1e-12)
            eye = s.eye.copy()
            if "w" in self.keys:
                eye += dt * forward
            if "s" in self.keys:
                eye -= dt * forward
            if "a" in self.keys:
                eye -= dt * right
            if "d" in self.keys:
                eye += dt * right
            if "q" in self.keys:
                eye -= dt * s.up
            if "e" in self.keys:
                eye += dt * s.up
            s.eye = eye
            # Reference resets movement keys each processed frame
            # (win_raytracer.cpp:324).
            self.keys.clear()
            cut = True

        if self.mouse_down and mouse_pos is not None and self._grab_pos is not None:
            pos = np.asarray(mouse_pos, dtype=np.float64)
            delta = dt * (pos - self._grab_pos)
            if np.any(delta != 0):
                forward = s.target - s.eye
                right = np.cross(forward, s.up)
                right = right / max(np.linalg.norm(right), 1e-12)
                rot = tm.rotate_axis(tm.radians(delta[0]), s.up) @ tm.rotate_axis(
                    tm.radians(delta[1]), right
                )
                # Reference: (vec4(pos,1) * rotation).xyz — row-vector multiply
                # == rotation^T applied to the column vector.
                p = np.append(s.eye, 1.0) @ rot
                s.eye = p[:3]
                cut = True

        return cut
