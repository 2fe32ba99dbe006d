"""Image writing: PNG (via PIL), PPM (dependency-free), EXR-ish raw .npy.

The reference never saves images at all (SURVEY.md §5 checkpoint/resume:
none) — its output lives only in the window framebuffer. Here saving is a
first-class capability, and .npy dumps double as checkpoint/resume state for
progressive renders.
"""

from __future__ import annotations

import numpy as np


def save_image(img: np.ndarray, path: str):
    """img: uint8 [H,W,3] (or float in [0,1], converted)."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = np.clip(img * 255.99, 0, 255).astype(np.uint8)
    if path.endswith(".ppm"):
        _save_ppm(img, path)
    elif path.endswith(".npy"):
        np.save(path, img)
    else:
        from PIL import Image

        Image.fromarray(img).save(path)


def _save_ppm(img: np.ndarray, path: str):
    h, w = img.shape[:2]
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (w, h))
        f.write(img[..., :3].tobytes())


def load_npy_state(path: str):
    return np.load(path)
