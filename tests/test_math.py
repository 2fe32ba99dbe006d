import jax.numpy as jnp
import numpy as np
import pytest

from tracy_tpu.core import math as tm


def test_normalize_unit_length():
    v = jnp.array([[3.0, 4.0, 0.0], [0.0, 0.0, 2.0]])
    n = tm.normalize(v)
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, rtol=1e-6)


def test_normalize_zero_safe():
    n = tm.normalize(jnp.zeros((2, 3)))
    assert np.isfinite(np.asarray(n)).all()


def test_reflect():
    i = jnp.array([[1.0, -1.0, 0.0]]) / np.sqrt(2.0)
    n = jnp.array([[0.0, 1.0, 0.0]])
    r = tm.reflect(i, n)
    np.testing.assert_allclose(np.asarray(r), [[1.0 / np.sqrt(2), 1.0 / np.sqrt(2), 0.0]], atol=1e-6)


def test_refract_straight_through():
    i = jnp.array([[0.0, -1.0, 0.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    r = tm.refract(i, n, 1.0)
    np.testing.assert_allclose(np.asarray(r), np.asarray(i), atol=1e-6)


def test_refract_snell():
    # 45 degrees into glass (eta = 1/1.5).
    theta_i = np.pi / 4
    i = jnp.array([[np.sin(theta_i), -np.cos(theta_i), 0.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    r = np.asarray(tm.refract(i, n, 1.0 / 1.5))[0]
    sin_t = np.sin(theta_i) / 1.5
    np.testing.assert_allclose(r[0], sin_t, atol=1e-6)
    assert r[1] < 0


def test_refract_tir_returns_zero():
    # Grazing exit from glass: eta = 1.5 with large incidence -> TIR.
    theta_i = np.radians(80.0)
    i = jnp.array([[np.sin(theta_i), -np.cos(theta_i), 0.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    r = np.asarray(tm.refract(i, n, 1.5))
    np.testing.assert_allclose(r, 0.0, atol=1e-7)


def test_srgb_roundtrip():
    x = jnp.linspace(0.0, 1.0, 64)
    y = tm.linear_from_srgb(tm.srgb_from_linear(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_srgb_known_values():
    np.testing.assert_allclose(float(tm.srgb_from_linear(jnp.asarray(0.0))), 0.0, atol=1e-7)
    np.testing.assert_allclose(float(tm.srgb_from_linear(jnp.asarray(1.0))), 1.0, atol=1e-6)
    # 18% grey -> ~0.4613 in sRGB
    np.testing.assert_allclose(float(tm.srgb_from_linear(jnp.asarray(0.18))), 0.4613, atol=1e-3)


def test_aces_reinhard_ranges():
    x = jnp.array([0.0, 0.5, 1.0, 10.0, 100.0])
    assert (np.asarray(tm.aces(x)) <= 1.0).all()
    assert (np.asarray(tm.reinhard(x)) < 1.0).all()


def test_look_at_perspective_invertible():
    view = tm.look_at((278, 278, -800), (278, 278, 0), (0, 1, 0))
    proj = tm.perspective(tm.radians(40.0), 1.0, 0.1, 10000.0)
    vp = proj @ view
    assert np.isfinite(np.linalg.inv(vp)).all()


def test_look_at_maps_center_to_minus_z():
    eye, center = np.array([1.0, 2.0, 3.0]), np.array([4.0, 5.0, 6.0])
    view = tm.look_at(eye, center, (0, 1, 0))
    p = view @ np.append(center, 1.0)
    assert p[2] < 0 and abs(p[0]) < 1e-9 and abs(p[1]) < 1e-9


def test_rotate_axis():
    m = tm.rotate_axis(np.pi / 2, (0, 0, 1))
    p = m[:3, :3] @ np.array([1.0, 0.0, 0.0])
    np.testing.assert_allclose(p, [0.0, 1.0, 0.0], atol=1e-12)
