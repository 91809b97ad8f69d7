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

from typing import Any, NamedTuple, Optional

import jax
import jax.flatten_util  # registers jax.flatten_util.ravel_pytree
import jax.numpy as jnp
import optax

__all__ = ["make_optimizer", "make_flat_optimizer", "apply_updates_with_lr",
           "structural_participation", "decay_masked_params"]


def structural_participation(loss_fn, *args):
    """Per-leaf bool pytree over ``args[0]`` (params): True iff
    d(loss)/d(leaf) is NOT a structural zero, i.e. backprop reaches the
    leaf.  This is exactly torch autograd's ``p.grad is not None``, and
    torch.optim SKIPS grad=None params entirely — no weight decay, no
    moment update (main.py:578-581 relies on it: e.g. heads outside the
    selected place_adv layers, or AutoDIAL's alpha read via .item(),
    never move).  Our grads for such leaves are exact zero ARRAYS, so
    only the weight-decay term leaks updates into them; gate it on this
    mask (see ``decay_masked_params``) and the whole update is exactly
    zero — bitwise torch semantics under both SGD and Adam.

    Computed from the gradient jaxpr by input-dependence propagation:
    instantiated symbolic zeros are broadcasts of literals with no
    transitive dependence on any jaxpr input, while every real gradient
    depends on at least the parameter itself.  Trace-time only
    (ShapeDtypeStructs in, python bools out) — zero runtime cost, and
    safe to call on tracers (only shapes/dtypes are read).
    """
    from jax.extend import core as jex_core

    def _grads(*a):
        return jax.grad(loss_fn, has_aux=True)(*a)[0]

    def _sds(x):
        dt = x.dtype if hasattr(x, "dtype") else jnp.result_type(x)
        return jax.ShapeDtypeStruct(jnp.shape(x), dt)

    avals = jax.tree_util.tree_map(_sds, args)
    jaxpr = jax.make_jaxpr(_grads)(*avals).jaxpr
    live = set(jaxpr.invars)
    for eqn in jaxpr.eqns:
        # conservative: any live operand marks every output live (sound
        # for zero-detection — zeros instantiation is literal-only)
        if any(isinstance(v, jex_core.Var) and v in live
               for v in eqn.invars):
            live.update(eqn.outvars)
    flags = [isinstance(v, jex_core.Var) and v in live
             for v in jaxpr.outvars]
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(args[0]), flags)


def decay_masked_params(params, mask):
    """Zero the leaves torch would see as grad=None, for use as the
    ``params`` argument of the update chain: the chain reads params
    ONLY for the weight-decay term (clip/trace/adam are params-free),
    so zeroed params gate wd per leaf without touching what the lr
    apply subtracts from.  ``mask=None`` (or all-True) is the identity.
    """
    if mask is None:
        return params
    return jax.tree_util.tree_map(
        lambda p, m: p if m else jnp.zeros_like(p), params, mask)


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


class FlatOptState(NamedTuple):
    inner: Any          # optax state over the single flat leaf


class FlatOptimizer(NamedTuple):
    """The same clip->wd->momentum chain applied to ONE raveled vector.

    Why: the TPU step is op-count-bound (profiled r2: ~820 XLA ops/step
    at ~0.3-2us fixed cost each; the per-parameter optimizer chain alone
    is ~8 ops x ~40 leaves).  Raveling all leaves into a single flat
    vector makes clip/wd/momentum/lr-apply ~10 ops total; the only
    per-leaf work left is the ravel concat and the unravel slices, which
    XLA fuses with producers/consumers.  Mathematically identical to the
    chained form (global-norm clip is global either way; everything else
    is elementwise) up to float reduction order — torch step-parity is
    asserted by tests/test_train_parity_torch.py on THIS path.
    """
    tx: optax.GradientTransformation

    def init(self, params) -> FlatOptState:
        flat, _ = jax.flatten_util.ravel_pytree(params)
        return FlatOptState(self.tx.init({"p": flat}))

    def update(self, grads, state: FlatOptState, params, decay_mask=None):
        """optax-compatible: returns (updates pytree, new state)."""
        g, unravel = jax.flatten_util.ravel_pytree(grads)
        p, _ = jax.flatten_util.ravel_pytree(
            decay_masked_params(params, decay_mask))
        upd, inner = self.tx.update({"p": g}, state.inner, {"p": p})
        return unravel(upd["p"]), FlatOptState(inner)

    def update_and_apply(self, grads, state: FlatOptState, params, lr,
                         decay_mask=None):
        """Fused update + lr apply: params <- params - lr*update, all in
        the flat domain (one subtract instead of one per leaf)."""
        g, _ = jax.flatten_util.ravel_pytree(grads)
        p, unravel = jax.flatten_util.ravel_pytree(params)
        p_wd = (p if decay_mask is None else jax.flatten_util.ravel_pytree(
            decay_masked_params(params, decay_mask))[0])
        upd, inner = self.tx.update({"p": g}, state.inner, {"p": p_wd})
        new_flat = p - lr * upd["p"].astype(p.dtype)
        return unravel(new_flat), FlatOptState(inner)


def make_flat_optimizer(optimizer: str = "SGD", momentum: float = 0.9,
                        weight_decay: float = 1e-4,
                        clip_gradient: Optional[float] = 20.0
                        ) -> FlatOptimizer:
    return FlatOptimizer(make_optimizer(optimizer, momentum, weight_decay,
                                        clip_gradient))
