import jax.numpy as jnp
import numpy as np

from tracy_tpu.core.rng import RngSpec, uniform_fast


def test_uniform_range_and_determinism():
    idx = jnp.arange(10000, dtype=jnp.uint32)
    a = np.asarray(uniform_fast(0xABCDEF, idx, 0, 0, 0))
    b = np.asarray(uniform_fast(0xABCDEF, idx, 0, 0, 0))
    assert (a >= 0).all() and (a < 1).all()
    np.testing.assert_array_equal(a, b)


def test_uniform_decorrelated_across_counters():
    idx = jnp.arange(10000, dtype=jnp.uint32)
    a = np.asarray(uniform_fast(1, idx, 0, 0, 0))
    b = np.asarray(uniform_fast(1, idx, 1, 0, 0))
    c = np.asarray(uniform_fast(1, idx, 0, 1, 0))
    d = np.asarray(uniform_fast(1, idx, 0, 0, 1))
    for other in (b, c, d):
        assert abs(np.corrcoef(a, other)[0, 1]) < 0.05


def test_uniform_mean_variance():
    idx = jnp.arange(1 << 16, dtype=jnp.uint32)
    x = np.asarray(uniform_fast(7, idx, 3, 1, 2))
    assert abs(x.mean() - 0.5) < 0.01
    assert abs(x.var() - 1.0 / 12.0) < 0.01


def test_rngspec_threefry_runs():
    spec = RngSpec("threefry", 42)
    x = np.asarray(spec.uniform(jnp.arange(128, dtype=jnp.uint32), 0, 0, 0))
    assert (x >= 0).all() and (x < 1).all()
