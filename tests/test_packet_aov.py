"""AOV rendering through the packet (rich-attrs) intersector path."""

import numpy as np

from tracy_tpu.config import RenderConfig
from tracy_tpu.render.renderer import Renderer, init_state
from tracy_tpu.scene.scn_parser import default_scene


def test_aovs_with_packet_accel():
    scene = default_scene(48, 32).build()
    for aov in ("basecolor", "normals", "depth"):
        cfg = RenderConfig(width=48, height=32, aov=aov, tonemap="none",
                           accel="packet", packet_leaf_size=32, packet_size=256)
        r = Renderer(cfg)
        st, _ = r.step(scene, init_state(cfg))
        img = np.asarray(st.accum)
        assert np.isfinite(img).all(), aov
        assert img.max() > 0.05, aov


def test_aov_matches_bruteforce():
    scene = default_scene(32, 24).build()
    imgs = {}
    for accel in ("none", "packet"):
        cfg = RenderConfig(width=32, height=24, aov="basecolor", tonemap="none",
                           accel=accel, packet_leaf_size=32, packet_size=256)
        r = Renderer(cfg)
        st, _ = r.step(scene, init_state(cfg))
        imgs[accel] = np.asarray(st.accum)
    np.testing.assert_allclose(imgs["none"], imgs["packet"], atol=1e-5)
