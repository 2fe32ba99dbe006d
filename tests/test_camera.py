import jax.numpy as jnp
import numpy as np

from tracy_tpu.core.camera import Camera, pixel_samples


def _cam(aspect=1.0):
    return Camera.setup(
        eye=(0.0, 0.0, 5.0), center=(0.0, 0.0, 0.0), up=(0.0, 1.0, 0.0),
        fov_degrees=60.0, aspect_ratio=aspect,
    )


def test_center_ray_points_at_target():
    cam = _cam()
    o, d = cam.generate_rays(jnp.asarray(0.5), jnp.asarray(0.5))
    np.testing.assert_allclose(np.asarray(o), [0, 0, 5], atol=1e-5)
    np.testing.assert_allclose(np.asarray(d), [0, 0, -1], atol=1e-5)


def test_ray_directions_normalized():
    cam = _cam(aspect=4 / 3)
    s = jnp.linspace(0.0, 1.0, 8)
    t = jnp.linspace(0.0, 1.0, 8)
    ss, tt = jnp.meshgrid(s, t)
    _, d = cam.generate_rays(ss, tt)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-5)


def test_fov_edges():
    # At t=1 (top of view), the vertical half-angle should be fov/2.
    cam = _cam()
    _, d = cam.generate_rays(jnp.asarray(0.5), jnp.asarray(1.0))
    d = np.asarray(d)
    angle = np.degrees(np.arctan2(d[1], -d[2]))
    np.testing.assert_allclose(angle, 30.0, atol=0.1)


def test_t_one_is_up():
    """v=t=1 must be the TOP of the view (GL NDC +y up)."""
    cam = _cam()
    _, d_top = cam.generate_rays(jnp.asarray(0.5), jnp.asarray(1.0))
    assert float(d_top[1]) > 0


def test_pixel_samples_orientation():
    # Image row 0 (top) should map to t near 1.
    h, w = 4, 4
    ju = jnp.zeros((h, w))
    jv = jnp.zeros((h, w))
    s, t = pixel_samples(w, h, ju, jv)
    assert float(t[0, 0]) > float(t[h - 1, 0])
    assert float(s[0, 0]) < float(s[0, w - 1])
