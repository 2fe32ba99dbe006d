"""Two-level TLAS/BLAS (capability match of cpu_details.cpp:26-144).

The stitched flat tree runs through the unchanged packet traversal; the
tests pin: (a) same image as the single-level build, (b) moving one object
rebuilds only that object's BLAS, bit-identically to a full rebuild."""

import numpy as np
import pytest

import jax.numpy as jnp

from tracy_tpu.accel.packet import build_packet_bvh, make_packet_intersector, pack_bvh
from tracy_tpu.accel.tlas import (
    build_two_level, make_two_level_intersector, transform_object, update_object,
)
from tracy_tpu.config import RenderConfig
from tracy_tpu.render.renderer import Renderer, init_state
from tracy_tpu.scene.scn_parser import default_scene


@pytest.fixture(scope="module")
def scene():
    return default_scene(64, 64).build()


def _render(scene, accel, frames=2):
    cfg = RenderConfig(width=64, height=64, spp=1, max_bounces=3,
                       tonemap="none", accel=accel)
    r = Renderer(cfg)
    st = init_state(cfg)
    for _ in range(frames):
        st, _ = r.step(scene, st)
    return np.asarray(st.accum)


def test_tlas_matches_flat_render(scene):
    flat = _render(scene, "packet")
    two = _render(scene, "tlas")
    # same closest hits module tie-breaks between equal-t triangles; the
    # default scene has none at these sample positions.
    np.testing.assert_allclose(two, flat, atol=1e-5)


def test_tlas_structure(scene):
    two = build_two_level(scene, leaf_size=16)
    assert len(two.blas) == len(scene.object_tri_ranges) == 3
    st = two.stitched
    # stitched tree covers every triangle exactly once
    assert np.sort(st.tri_order).tolist() == list(range(scene.num_triangles))
    # leaf counts sum to triangle count
    leaves = st.node_meta[st.node_meta[:, 1] > 0]
    assert int(leaves[:, 1].sum()) == scene.num_triangles


def test_update_object_rebuilds_only_touched_blas(scene):
    two = build_two_level(scene, leaf_size=16)
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = (0.25, 0.0, 0.0)  # translate object 1 (the metal sphere)
    moved = transform_object(scene, 1, m)

    blas0_before = two.blas[0]
    update_object(two, moved, 1)
    assert two.blas[0] is blas0_before  # untouched BLAS reused
    assert two.rebuild_counts == {0: 1, 1: 2, 2: 1}

    fresh = build_two_level(moved, leaf_size=16)
    np.testing.assert_array_equal(two.stitched.node_bounds, fresh.stitched.node_bounds)
    np.testing.assert_array_equal(two.stitched.node_meta, fresh.stitched.node_meta)
    np.testing.assert_array_equal(two.stitched.tri_order, fresh.stitched.tri_order)


def test_moved_object_renders_moved(scene):
    """End-to-end: incremental rebuild produces the same image as a full
    fresh build of the moved scene."""
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = (0.0, 0.4, 0.0)
    moved = transform_object(scene, 0, m)

    two = build_two_level(scene, leaf_size=16)
    update_object(two, moved, 0)
    isect_inc = make_two_level_intersector(moved, two, with_tangent=False)

    cfg = RenderConfig(width=64, height=64, spp=1, max_bounces=3,
                       tonemap="none", accel="packet")
    r1 = Renderer(cfg, intersector_factory=lambda s: isect_inc)
    st1, _ = r1.step(moved, init_state(cfg))

    two_fresh = build_two_level(moved, leaf_size=16)
    isect_fresh = make_two_level_intersector(moved, two_fresh, with_tangent=False)
    r2 = Renderer(cfg, intersector_factory=lambda s: isect_fresh)
    st2, _ = r2.step(moved, init_state(cfg))

    np.testing.assert_array_equal(np.asarray(st1.accum), np.asarray(st2.accum))
