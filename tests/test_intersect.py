import jax.numpy as jnp
import numpy as np

from tracy_tpu.render.intersect import FLT_MAX, intersect_bruteforce


def _tri_soup(tris):
    tris = np.asarray(tris, dtype=np.float32)
    p0 = jnp.asarray(tris[:, 0])
    e1 = jnp.asarray(tris[:, 1] - tris[:, 0])
    e2 = jnp.asarray(tris[:, 2] - tris[:, 0])
    return p0, e1, e2


def test_single_hit():
    p0, e1, e2 = _tri_soup([[[-1, -1, 0], [1, -1, 0], [0, 1, 0]]])
    o = jnp.array([[0.0, 0.0, 5.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    hit = intersect_bruteforce(o, d, p0, e1, e2)
    assert bool(hit.mask[0])
    np.testing.assert_allclose(float(hit.t[0]), 5.0, rtol=1e-5)


def test_backface_cull():
    # Same triangle, wound the other way -> det < 0 -> miss (collision.h:44).
    p0, e1, e2 = _tri_soup([[[-1, -1, 0], [0, 1, 0], [1, -1, 0]]])
    o = jnp.array([[0.0, 0.0, 5.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    hit = intersect_bruteforce(o, d, p0, e1, e2)
    assert not bool(hit.mask[0])


def test_miss_outside():
    p0, e1, e2 = _tri_soup([[[-1, -1, 0], [1, -1, 0], [0, 1, 0]]])
    o = jnp.array([[5.0, 5.0, 5.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    hit = intersect_bruteforce(o, d, p0, e1, e2)
    assert not bool(hit.mask[0])
    assert float(hit.t[0]) == float(FLT_MAX)


def test_closest_of_two():
    p0, e1, e2 = _tri_soup(
        [
            [[-1, -1, 2], [1, -1, 2], [0, 1, 2]],
            [[-1, -1, 1], [1, -1, 1], [0, 1, 1]],
        ]
    )
    o = jnp.array([[0.0, 0.0, 5.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    hit = intersect_bruteforce(o, d, p0, e1, e2)
    assert int(hit.tri[0]) == 0
    np.testing.assert_allclose(float(hit.t[0]), 3.0, rtol=1e-5)


def test_barycentrics():
    p0, e1, e2 = _tri_soup([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]])
    o = jnp.array([[0.25, 0.5, 1.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    hit = intersect_bruteforce(o, d, p0, e1, e2)
    assert bool(hit.mask[0])
    np.testing.assert_allclose(np.asarray(hit.uv[0]), [0.25, 0.5], atol=1e-5)


def test_chunking_consistency():
    rng = np.random.default_rng(0)
    tris = rng.normal(size=(137, 3, 3)).astype(np.float32)
    p0, e1, e2 = _tri_soup(tris)
    o = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32) * 3)
    d = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    h1 = intersect_bruteforce(o, d, p0, e1, e2, tri_chunk=8)
    h2 = intersect_bruteforce(o, d, p0, e1, e2, tri_chunk=137)
    np.testing.assert_array_equal(np.asarray(h1.mask), np.asarray(h2.mask))
    np.testing.assert_allclose(np.asarray(h1.t), np.asarray(h2.t), rtol=1e-6)


def test_t_max_respected():
    p0, e1, e2 = _tri_soup([[[-1, -1, 0], [1, -1, 0], [0, 1, 0]]])
    o = jnp.array([[0.0, 0.0, 5.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    hit = intersect_bruteforce(o, d, p0, e1, e2, t_max=jnp.array([2.0]))
    assert not bool(hit.mask[0])
