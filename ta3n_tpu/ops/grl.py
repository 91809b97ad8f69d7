"""Gradient-reversal and gradient-scaling primitives.

The adversarial-DA primitive: identity on the forward pass, `-beta * g`
(resp. `beta * g`) on the backward pass.  Parity with the reference's
autograd Functions `GradReverse` / `GradScale` (reference `models.py:20-41`),
built here as `jax.custom_vjp` rules so `beta` may be a *traced* scalar
(the DANN schedule changes it every step without retracing).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["grad_reverse", "grad_scale"]


@jax.custom_vjp
def grad_reverse(x: jax.Array, beta) -> jax.Array:
    """Identity forward; cotangent is multiplied by ``-beta`` on backward."""
    del beta
    return x


def _grad_reverse_fwd(x, beta):
    return x, beta


def _grad_reverse_bwd(beta, g):
    # beta receives a zero cotangent: the schedule scalar is not trained.
    # Cast beta to g's dtype so mixed-precision cotangents don't promote.
    beta = jnp.asarray(beta)
    return ((-beta.astype(g.dtype)) * g,
            jnp.zeros_like(beta))


grad_reverse.defvjp(_grad_reverse_fwd, _grad_reverse_bwd)


@jax.custom_vjp
def grad_scale(x: jax.Array, beta) -> jax.Array:
    """Identity forward; cotangent is multiplied by ``beta`` on backward."""
    del beta
    return x


def _grad_scale_fwd(x, beta):
    return x, beta


def _grad_scale_bwd(beta, g):
    beta = jnp.asarray(beta)
    return (beta.astype(g.dtype) * g, jnp.zeros_like(beta))


grad_scale.defvjp(_grad_scale_fwd, _grad_scale_bwd)
