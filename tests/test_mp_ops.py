"""mp_ops value + gradient tests (mirrors reference coverage:
tf_euler/python/euler_ops/mp_ops_test.py — 8 gradient/aggregation tests)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from euler_tpu.ops import mp_ops


def test_gather():
    p = jnp.arange(12.0).reshape(4, 3)
    out = mp_ops.gather(p, jnp.array([2, 0, 2]))
    np.testing.assert_allclose(out, [[6, 7, 8], [0, 1, 2], [6, 7, 8]])


def test_gather_grad_is_scatter_add():
    p = jnp.arange(12.0).reshape(4, 3)
    idx = jnp.array([2, 0, 2])

    def f(p):
        return jnp.sum(mp_ops.gather(p, idx) * jnp.array([[1.], [2.], [3.]]))

    gp = jax.grad(f)(p)
    expect = np.zeros((4, 3))
    expect[2] += 1.0
    expect[0] += 2.0
    expect[2] += 3.0
    np.testing.assert_allclose(gp, expect)


def test_scatter_add_and_grad():
    u = jnp.array([[1.0], [2.0], [3.0]])
    idx = jnp.array([0, 1, 0])
    out = mp_ops.scatter_add(u, idx, 3)
    np.testing.assert_allclose(out, [[4.0], [2.0], [0.0]])
    g = jax.grad(lambda u: jnp.sum(mp_ops.scatter_add(u, idx, 3) *
                                   jnp.array([[1.], [5.], [9.]])))(u)
    np.testing.assert_allclose(g, [[1.0], [5.0], [1.0]])


def test_scatter_max_values_and_tie_grad():
    u = jnp.array([[3.0], [3.0], [1.0], [5.0]])
    idx = jnp.array([0, 0, 0, 1])
    out = mp_ops.scatter_max(u, idx, 3)
    np.testing.assert_allclose(out, [[3.0], [5.0], [0.0]])  # empty seg -> 0
    # tie at segment 0: gradient splits evenly (reference mp_ops.py:52-62)
    g = jax.grad(lambda u: jnp.sum(mp_ops.scatter_max(u, idx, 3)))(u)
    np.testing.assert_allclose(g, [[0.5], [0.5], [0.0], [1.0]])


def test_scatter_mean():
    u = jnp.array([[2.0], [4.0], [6.0]])
    idx = jnp.array([1, 1, 0])
    out = mp_ops.scatter_mean(u, idx, 2)
    np.testing.assert_allclose(out, [[6.0], [3.0]], rtol=1e-5)


def test_scatter_softmax():
    u = jnp.array([[1.0], [2.0], [3.0]])
    idx = jnp.array([0, 0, 1])
    out = mp_ops.scatter_softmax(u, idx, 2)
    e = np.exp([1.0, 2.0])
    np.testing.assert_allclose(out[:2, 0], e / e.sum(), rtol=1e-5)
    np.testing.assert_allclose(out[2, 0], 1.0, rtol=1e-5)


def test_masked_scatter_mean_ignores_padding():
    u = jnp.array([[10.0], [2.0], [4.0]])
    idx = jnp.array([0, 0, 0])
    mask = jnp.array([0.0, 1.0, 1.0])
    out = mp_ops.masked_scatter_("mean", u, idx, 1, mask)
    np.testing.assert_allclose(out, [[3.0]], rtol=1e-5)


def test_masked_scatter_softmax():
    u = jnp.array([[1.0], [1.0], [99.0]])
    idx = jnp.array([0, 0, 0])
    mask = jnp.array([1.0, 1.0, 0.0])
    out = mp_ops.masked_scatter_softmax(u, idx, 1, mask)
    np.testing.assert_allclose(out[:, 0], [0.5, 0.5, 0.0], rtol=1e-5)


def test_jit_compatible():
    u = jnp.ones((8, 4))
    idx = jnp.array([0, 1, 2, 3, 0, 1, 2, 3])
    f = jax.jit(lambda u: mp_ops.scatter_("mean", u, idx, 4))
    np.testing.assert_allclose(f(u), np.ones((4, 4)), rtol=1e-5)
