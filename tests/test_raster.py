"""Software rasterizer tests: geometry coverage, depth ordering, culling,
orientation vs the path tracer."""

import jax.numpy as jnp
import numpy as np

from tracy_tpu.config import RenderConfig
from tracy_tpu.raster import render_raster
from tracy_tpu.scene.scene import SceneBuilder
from tracy_tpu.scene.scn_parser import default_scene


def _simple_scene(w=64, h=48):
    b = SceneBuilder(w, h)
    b.set_sky_color((0, 0, 0))
    red = b.add_material((0.8, 0.1, 0.1), 1.0, 0.0)
    blue = b.add_material((0.1, 0.1, 0.8), 1.0, 0.0)
    # Big red triangle at z=-5, smaller blue one in front at z=-3 (upper half).
    b.add_triangle((-3, -3, -5), (3, -3, -5), (0, 3, -5), red)
    b.add_triangle((-1, 0.2, -3), (1, 0.2, -3), (0, 1.5, -3), blue)
    b.set_camera(eye=(0, 0, 2), center=(0, 0, -5), up=(0, 1, 0), fov_degrees=60)
    return b.build()


def test_raster_basic_coverage_and_depth():
    scene = _simple_scene()
    cfg = RenderConfig(width=64, height=48, tonemap="none")
    img = np.asarray(render_raster(scene, cfg))
    assert img.shape == (48, 64, 3)
    # Center bottom-ish: red triangle.
    assert img[35, 32, 0] > 0.5 and img[35, 32, 2] < 0.3
    # Upper center: blue wins the depth test over red.
    assert img[18, 32, 2] > 0.5 and img[18, 32, 0] < 0.3
    # Corners: background black.
    np.testing.assert_allclose(img[0, 0], 0.0)
    np.testing.assert_allclose(img[-1, -1], 0.0)


def test_raster_backface_culled():
    b = SceneBuilder(32, 32)
    m = b.add_material((1, 1, 1), 1.0, 0.0)
    # Wound so the normal faces AWAY from the camera.
    b.add_triangle((-2, -2, -5), (0, 2, -5), (2, -2, -5), m)
    b.set_camera(eye=(0, 0, 2), center=(0, 0, -5), up=(0, 1, 0), fov_degrees=60)
    scene = b.build()
    cfg = RenderConfig(width=32, height=32, tonemap="none")
    img = np.asarray(render_raster(scene, cfg))
    np.testing.assert_allclose(img, 0.0)


def test_raster_matches_pathtracer_silhouette():
    """Raster coverage should agree with the ray tracer's primary-hit mask."""
    scene = _simple_scene()
    cfg = RenderConfig(width=64, height=48, aov="basecolor", tonemap="none",
                       accel="none")
    img_r = np.asarray(render_raster(scene, cfg))

    from tracy_tpu.render.renderer import Renderer, init_state

    r = Renderer(cfg)
    st, _ = r.step(scene, init_state(cfg))
    img_pt = np.asarray(st.accum)

    cover_r = img_r.max(axis=-1) > 0.05
    cover_pt = img_pt.max(axis=-1) > 0.05
    # Allow a small boundary band to disagree (jittered PT sampling vs pixel
    # centers).
    disagree = (cover_r != cover_pt).mean()
    assert disagree < 0.06, disagree
    # Colors agree where both covered (FS returns albedo; PT basecolor AOV).
    # PT jitters samples, so triangle-boundary pixels blend colors — require
    # agreement on 95% of covered pixels instead of all.
    both = cover_r & cover_pt
    diff = np.abs(img_r[both] - img_pt[both]).max(axis=-1)
    assert (diff > 0.05).mean() < 0.05, (diff > 0.05).mean()


def test_raster_aovs_finite():
    scene = default_scene(48, 32).build()
    for aov in ("beauty", "normals", "metalness", "roughness", "emissive", "depth"):
        cfg = RenderConfig(width=48, height=32, aov=aov, tonemap="none")
        img = np.asarray(render_raster(scene, cfg))
        assert np.isfinite(img).all(), aov


def test_raster_chunking_invariance():
    scene = default_scene(32, 24).build()
    cfg = RenderConfig(width=32, height=24, tonemap="none")
    a = np.asarray(render_raster(scene, cfg, tri_chunk=16))
    b = np.asarray(render_raster(scene, cfg, tri_chunk=999))
    np.testing.assert_allclose(a, b, atol=1e-6)
