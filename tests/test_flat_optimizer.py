"""FlatOptimizer (single raveled vector, ~10 XLA ops) vs the per-leaf
optax chain: identical updates up to float reduction order.  The flat
path is the default (TrainConfig.fused_optimizer) and is ALSO verified
directly against torch in test_train_parity_torch.py; this test pins the
equivalence for both SGD and Adam and for multi-step trajectories."""

import jax
import jax.numpy as jnp
import numpy as np

from ta3n_tpu.config import DAConfig, ModelConfig, TrainConfig
from ta3n_tpu.models import VideoModel
from ta3n_tpu.train import (StepScalars, TrainState, create_train_state,
                            make_train_step)
from ta3n_tpu.train.optim import (apply_updates_with_lr,
                                  make_flat_optimizer, make_optimizer)

SEG, FDIM = 3, 16


def _tree(key, shapes):
    ks = jax.random.split(key, len(shapes))
    return {f"w{i}": jax.random.normal(k, s)
            for i, (k, s) in enumerate(zip(ks, shapes))}


def _check(opt_name):
    shapes = [(16, 8), (8,), (8, 4), (4,), (3, 3, 5)]
    params = _tree(jax.random.PRNGKey(0), shapes)
    grads = jax.tree_util.tree_map(
        lambda p: p * 0.3 + 1.0, _tree(jax.random.PRNGKey(1), shapes))

    chained = make_optimizer(opt_name, 0.9, 1e-4, 20.0)
    flat = make_flat_optimizer(opt_name, 0.9, 1e-4, 20.0)
    s1, s2 = chained.init(params), flat.init(params)
    p1, p2 = params, params
    for step in range(5):
        g = jax.tree_util.tree_map(lambda x: x * (1.0 + step), grads)
        u1, s1 = chained.update(g, s1, p1)
        p1 = apply_updates_with_lr(p1, u1, 0.05)
        p2, s2 = flat.update_and_apply(g, s2, p2, jnp.asarray(0.05))
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_flat_sgd_matches_chained():
    _check("SGD")


def test_flat_adam_matches_chained():
    _check("Adam")


def test_flat_update_interface_matches():
    """FlatOptimizer.update (optax-compatible signature) == chained."""
    shapes = [(6, 4), (4,)]
    params = _tree(jax.random.PRNGKey(2), shapes)
    grads = _tree(jax.random.PRNGKey(3), shapes)
    chained = make_optimizer("SGD", 0.9, 1e-4, 20.0)
    flat = make_flat_optimizer("SGD", 0.9, 1e-4, 20.0)
    u1, _ = chained.update(grads, chained.init(params), params)
    u2, _ = flat.update(grads, flat.init(params), params)
    for a, b in zip(jax.tree_util.tree_leaves(u1),
                    jax.tree_util.tree_leaves(u2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_full_step_fused_vs_chained():
    """Whole jitted train step: fused_optimizer=True == False."""
    cfg = ModelConfig(num_class=3, baseline_type="video",
                      frame_aggregation="trn-m", use_attn="TransAttn",
                      train_segments=SEG, val_segments=SEG, fc_dim=16,
                      feature_dim=FDIM, dropout_i=0.0, dropout_v=0.0)
    da = DAConfig(use_target="uSv", adv_DA="RevGrad",
                  place_adv=("Y", "Y", "Y"))
    rng = jax.random.PRNGKey(0)
    gen = np.random.default_rng(0)
    xs = gen.normal(size=(8, SEG, FDIM)).astype(np.float32)
    xt = gen.normal(size=(6, SEG, FDIM)).astype(np.float32)
    ys = gen.integers(0, 3, 8).astype(np.int32)
    yt = gen.integers(0, 3, 6).astype(np.int32)
    ms, mt = np.ones(8, np.float32), np.ones(6, np.float32)
    sc = StepScalars(np.float32([0.5, 0.5, 0.5]), np.float32(0),
                     np.float32(0), np.float32(0.01), np.float32(0.1))

    results = []
    for fused in (True, False):
        tc = TrainConfig(lr=0.1, batch_size=(8, 6, 8),
                         fused_optimizer=fused)
        model = VideoModel(cfg)
        st = create_train_state(model, rng, 8, 6, tc)
        step = make_train_step(model, da, tc)
        for _ in range(3):
            st, m = step(st, xs, ys, ms, xt, yt, mt, sc, rng)
        results.append(st.params)
    for a, b in zip(jax.tree_util.tree_leaves(results[0]),
                    jax.tree_util.tree_leaves(results[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def _torch_parity(opt_name):
    """The exact reference update — backward -> clip_grad_norm_(20) ->
    torch.optim.{SGD,Adam}(weight_decay=1e-4).step() (main.py:82-86,
    578-581) — vs our clip->wd->moment chain on IDENTICAL gradient
    streams, spanning 9 orders of gradient magnitude so Adam's
    eps-dominated denominator regime (sqrt(v_hat) ~ eps) is covered.
    This isolates the update RULE from model-forward rounding (which the
    end-to-end oracle, test_ref_oracle.py, shows can flip near-denormal
    gradient signs between frameworks)."""
    import torch

    lr = 0.03
    shapes = [(16, 8), (8,), (8, 4), (3, 3, 5)]
    rng = np.random.default_rng(7)
    init = [rng.normal(size=s).astype(np.float32) for s in shapes]
    stream = [[(rng.normal(size=s) * 10.0 ** rng.uniform(-8, 1)
                ).astype(np.float32) for s in shapes]
              for _ in range(6)]

    tp = [torch.nn.Parameter(torch.from_numpy(a.copy())) for a in init]
    if opt_name == "SGD":
        topt = torch.optim.SGD(tp, lr=lr, momentum=0.9,
                               weight_decay=1e-4, nesterov=True)
    else:
        topt = torch.optim.Adam(tp, lr=lr, weight_decay=1e-4)
    for g in stream:
        topt.zero_grad()
        for p, gi in zip(tp, g):
            p.grad = torch.from_numpy(gi.copy())
        torch.nn.utils.clip_grad_norm_(tp, 20.0)
        topt.step()

    params = {f"w{i}": jnp.asarray(a) for i, a in enumerate(init)}
    tx = make_optimizer(opt_name, 0.9, 1e-4, 20.0)
    st = tx.init(params)
    for g in stream:
        gt = {f"w{i}": jnp.asarray(x) for i, x in enumerate(g)}
        u, st = tx.update(gt, st, params)
        params = apply_updates_with_lr(params, u, lr)

    # SGD tracks torch to f32 ulps; Adam's residual is optax computing
    # the bias corrections in f32 (1 - 0.999^t at t=1 carries ~1e-5 rel
    # rounding) where torch uses f64 python scalars — measured <=2e-4
    # rel / 1e-6 abs over 6 steps.  A wrong beta/eps/wd ORDER would be
    # orders of magnitude larger, so the rule is still pinned.
    rtol, atol = (1e-5, 1e-7) if opt_name == "SGD" else (3e-4, 2e-6)
    for i, p in enumerate(tp):
        np.testing.assert_allclose(
            np.asarray(params[f"w{i}"]), p.detach().numpy(),
            rtol=rtol, atol=atol, err_msg=f"{opt_name} leaf w{i}")


def test_sgd_matches_torch_rule():
    _torch_parity("SGD")


def test_adam_matches_torch_rule():
    _torch_parity("Adam")
