"""Gradient-reversal / gradient-scaling unit tests (golden vjp values).

Reference semantics: models.py:20-41.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ta3n_tpu.ops import grad_reverse, grad_scale


def test_grad_reverse_forward_identity():
    x = jnp.arange(12.0).reshape(3, 4)
    np.testing.assert_array_equal(grad_reverse(x, 0.7), x)


def test_grad_reverse_backward_negates_and_scales():
    x = jnp.ones((3, 4))
    g = jax.grad(lambda v: jnp.sum(grad_reverse(v, 0.7) * 2.0))(x)
    np.testing.assert_allclose(np.asarray(g), -0.7 * 2.0 * np.ones((3, 4)),
                               rtol=1e-6)


def test_grad_reverse_traced_beta_no_retrace():
    x = jnp.ones((2, 2))
    traces = []

    @jax.jit
    def f(v, b):
        traces.append(1)
        return jnp.sum(grad_reverse(v, b))

    jax.grad(f)(x, jnp.asarray(0.3))
    jax.grad(f)(x, jnp.asarray(0.9))
    assert len(traces) == 1  # beta is traced, changing it must not retrace


def test_grad_scale_backward():
    x = jnp.ones((2, 3))
    g = jax.grad(lambda v: jnp.sum(grad_scale(v, 0.25)))(x)
    np.testing.assert_allclose(np.asarray(g), 0.25 * np.ones((2, 3)),
                               rtol=1e-6)


def test_grad_reverse_through_linear():
    # d/dx sum(W @ grad_reverse(x, b)) == -b * W^T summed
    w = jnp.array([[1.0, 2.0], [3.0, 4.0]])
    x = jnp.ones((2,))
    beta = 0.5

    def f(v):
        return jnp.sum(w @ grad_reverse(v, beta))

    g = jax.grad(f)(x)
    expected = -beta * np.asarray(w).sum(axis=0)
    np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-6)
