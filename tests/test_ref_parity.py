"""Statistical parity against REAL reference renders.

Round 1 compared only against self-generated goldens; these tests compare
against pixels produced by the reference's own code — scene.cpp +
cpu_trace.cpp + cpu_details.cpp built headless by tools/refharness (see
tools/refharness/make_goldens.py). The goldens are the reference's
tonemapped output (0..255-clamped 255.99*srgb), y=0 scanline first (its
v = y/h convention makes that the image bottom, camera.h:28-35).

RNG streams differ (reference: racy shared-state PCG; ours: counter-based),
so comparison is statistical, and it happens in LINEAR radiance (sRGB
inverted): sRGB is concave, so the sRGB-space mean of a noisier estimate is
systematically lower (Jensen) — comparing a 24-frame render to a
1024-frame golden in sRGB space shows a spurious "energy deficit" (found
the hard way on cornell). Linear block means are unbiased at any noise
level; only the 255 clamp (saturated pixels, identical on both sides)
survives as nonlinearity.

Metrics: |mean diff| (global energy), p95 of |block diff| (systematic
regional differences; robust to a few high-variance sun-glint blocks), and
a hard cap on max block diff.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from tracy_tpu.config import RenderConfig
from tracy_tpu.render import film
from tracy_tpu.render.renderer import Renderer, init_state
from tracy_tpu.scene.scn_parser import load_scene

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLD = os.path.join(REPO, "tests", "goldens", "ref")
SCN = os.path.join(REPO, "tests", "goldens", "scn")
FIXTURES = os.path.join(REPO, "tests", "fixtures")


def srgb_to_linear(s):
    return np.where(s <= 0.04045, s / 12.92, ((s + 0.055) / 1.055) ** 2.4)


def load_golden(name):
    z = np.load(os.path.join(GOLD, f"{name}.npz"))
    img = z["image"].astype(np.float32)  # [H, W, 3], 0..255, y=0 = bottom
    return srgb_to_linear(img / 255.99)


def render_ours(name, frames, flip=True):
    """Render the same small scene on the test backend (CPU mesh) and
    return the same 0..255 tonemapped float image, bottom row first.

    Uses the per-ray-stack 'bvh' tier: it is ~10x faster than the packet
    tier on CPU, and hit-level agreement across all tiers (bvh / packet /
    pallas vs brute force) is asserted separately in test_bvh.py /
    test_packet.py / test_pallas_packet.py, so parity here covers the
    shared physics (materials, RNG, sky, accumulation), not traversal."""
    # data_root resolves the reference's meshes/textures; the synthetic
    # sky.hdr fixture resolves via the scn dir's parent (tests/goldens/data).
    b = load_scene(os.path.join(SCN, f"{name}.scn"), data_root="/root/reference")
    scene = b.build()
    cfg = RenderConfig(width=b.width, height=b.height, spp=1, accel="bvh",
                       use_pallas=False)
    r = Renderer(cfg)
    st = init_state(cfg)
    st = r.render_progressive(scene, frames, state=st, steps_per_dispatch=frames)
    img = np.clip(np.asarray(film.tonemap(st.accum, cfg)) * 255.99, 0.0, 255.0)
    img = srgb_to_linear(img / 255.99)
    if flip:
        img = img[::-1]  # our accum row 0 is the image TOP; goldens are bottom-first
    return img


def block_means(img, bs=16):
    h, w, _ = img.shape
    return img[: h // bs * bs, : w // bs * bs].reshape(
        h // bs, bs, w // bs, bs, 3
    ).mean(axis=(1, 3))


def compare(name, frames, mean_tol, p95_tol, max_tol, flip=True):
    """All tolerances in LINEAR radiance units (sky white = 1.0)."""
    ref = load_golden(name)
    ours = render_ours(name, frames, flip=flip)
    assert ref.shape == ours.shape, (ref.shape, ours.shape)
    d = np.abs(block_means(ref) - block_means(ours))
    dmean = abs(float(ref.mean()) - float(ours.mean()))
    p95 = float(np.percentile(d, 95))
    dmax = float(d.max())
    assert dmean <= mean_tol, f"{name}: linear mean diff {dmean:.4f} > {mean_tol}"
    assert p95 <= p95_tol, f"{name}: block p95 {p95:.4f} > {p95_tol}"
    assert dmax <= max_tol, f"{name}: block max {dmax:.4f} > {max_tol}"
    return dmean, p95, dmax


def test_furnace_parity():
    # flat grey sphere under uniform sky: tiny variance, tight tolerance.
    compare("furnace", frames=24, mean_tol=0.01, p95_tol=0.02, max_tol=0.05)


def test_cornell_parity():
    # small emissive light, no NEE: high variance GI. 16 frames keeps the
    # default suite fast; tolerances sized for that noise level (48-frame
    # calibration: mean 0.0011, p95 0.020, max 0.048).
    compare("cornell", frames=16, mean_tol=0.01, p95_tol=0.07, max_tol=0.2)


def test_testtree_parity():
    compare("testtree", frames=16, mean_tol=0.01, p95_tol=0.03, max_tol=0.12)


def test_spheres_parity():
    # 5x5 BRDF sweep under the synthetic HDR sky (nearest-sampled):
    # exercises metal/rough/translucent lobes + the float texture path.
    # (24-frame calibration: mean 0.0015, p95 0.008, max 0.017.)
    compare("spheres", frames=6, mean_tol=0.03, p95_tol=0.06, max_tol=0.5)


@pytest.mark.slow
def test_trimesh_parity():
    compare("trimesh", frames=24, mean_tol=0.02, p95_tol=0.06, max_tol=0.3)


@pytest.mark.slow
def test_bunny_parity():
    compare("bunny", frames=24, mean_tol=0.02, p95_tol=0.06, max_tol=0.3)


@pytest.mark.slow
def test_dragon_parity():
    compare("dragon", frames=24, mean_tol=0.02, p95_tol=0.06, max_tol=0.3)


@pytest.mark.slow
def test_helmet_parity():
    # full 5-map texture set + HDR sky.
    compare("helmet", frames=24, mean_tol=0.025, p95_tol=0.08, max_tol=0.5)


@pytest.mark.slow
def test_random_parity():
    compare("random", frames=24, mean_tol=0.02, p95_tol=0.06, max_tol=0.3)
