"""Optimizers with torch-parity update semantics, learning rate traced.

The reference mutates ``optimizer.param_groups[...].lr`` every step under
the DANN schedule (main.py:800-802); here the transformation chain is
lr-free (clip -> weight decay -> momentum/adam) and the traced per-step lr
scales the update inside the jitted step — no retrace, no state surgery.

torch parity details:
  * clip_grad_norm_(20) clips the *raw* gradients before the step
    (main.py:578-583);
  * SGD(weight_decay=wd) adds wd*p to the gradient BEFORE the momentum
    buffer update; nesterov=True, momentum=0.9 (main.py:83);
  * Adam(weight_decay=wd) likewise (main.py:86).
"""

from __future__ import annotations

from typing import Optional

import jax
import optax

__all__ = ["make_optimizer", "apply_updates_with_lr"]


def _torch_sgd_momentum(momentum: float, nesterov: bool):
    """torch.optim.SGD momentum: buf = m*buf + g; update = g + m*buf if
    nesterov else buf.  (optax.trace matches this form.)"""
    return optax.trace(decay=momentum, nesterov=nesterov)


def make_optimizer(optimizer: str = "SGD", momentum: float = 0.9,
                   weight_decay: float = 1e-4,
                   clip_gradient: Optional[float] = 20.0
                   ) -> optax.GradientTransformation:
    parts = []
    if clip_gradient is not None:
        parts.append(optax.clip_by_global_norm(clip_gradient))
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    if optimizer == "SGD":
        parts.append(_torch_sgd_momentum(momentum, nesterov=True))
    elif optimizer == "Adam":
        parts.append(optax.scale_by_adam())
    else:
        raise ValueError(f"optimizer not supported: {optimizer}")
    return optax.chain(*parts)


def apply_updates_with_lr(params, updates, lr):
    """params <- params - lr * updates (lr is a traced scalar)."""
    return jax.tree_util.tree_map(
        lambda p, u: p - lr * u.astype(p.dtype), params, updates)
