"""Fused Pallas multi-scale TRN: equivalence with the XLA reference path
(forward and gradients), in interpreter mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ta3n_tpu.models.trn import RelationModuleMultiScale
from ta3n_tpu.ops.trn_fused import (trn_multiscale_fused,
                                    trn_multiscale_reference)

B, S, D, H = 6, 5, 16, 8


@pytest.fixture
def data():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, S, D)).astype(np.float32)
    from ta3n_tpu.ops.relation import build_relation_plan
    plan = build_relation_plan(S)
    weights = tuple(rng.normal(scale=0.1, size=(k * D, H)).astype(np.float32)
                    for k in plan.scales)
    biases = tuple(rng.normal(scale=0.1, size=(H,)).astype(np.float32)
                   for _ in plan.scales)
    return jnp.asarray(x), tuple(map(jnp.asarray, weights)), \
        tuple(map(jnp.asarray, biases))


def test_fused_forward_matches_reference(data):
    x, weights, biases = data
    want = trn_multiscale_reference(x, weights, biases, S)
    got = trn_multiscale_fused(x, weights, biases, S, 3, True)
    assert got.shape == (B, S - 1, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


def test_fused_gradients_match_reference(data):
    x, weights, biases = data

    def loss_ref(x, w, b):
        return jnp.sum(trn_multiscale_reference(x, w, b, S) ** 2)

    def loss_fused(x, w, b):
        return jnp.sum(trn_multiscale_fused(x, w, b, S, 3, True) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, weights, biases)
    g_fus = jax.grad(loss_fused, argnums=(0, 1, 2))(x, weights, biases)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_fus)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-4)


def test_module_pallas_flag_matches_xla(data):
    x, _, _ = data
    rng = jax.random.PRNGKey(0)
    mod_x = RelationModuleMultiScale(D, H, S, use_pallas="never")
    var = mod_x.init(rng, x)
    want = mod_x.apply(var, x)

    class Interp(RelationModuleMultiScale):
        def _pallas_ok(self):
            return False  # CPU: compiled pallas unsupported; equivalence of
            # the fused op itself is covered by the tests above

    mod_p = Interp(D, H, S)
    got = mod_p.apply(var, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_pallas_backward_matches_xla_backward(data):
    x, weights, biases = data
    g = jnp.asarray(np.random.default_rng(2).normal(
        size=(B, S - 1, H)).astype(np.float32))
    from ta3n_tpu.ops.trn_fused import (_fused_backward_pallas,
                                        _fused_bwd_xla, _fused_forward)
    masks = _fused_forward(x, weights, biases, S, 3, True)[1]
    dx_p, dw_p, db_p = _fused_backward_pallas(x, weights, masks, g, S, 3,
                                              True)
    dx_x, dw_x, db_x = _fused_bwd_xla(S, 3, (x, weights, biases), g)
    np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_x),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(dw_p, dw_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)
    for a, b in zip(db_p, db_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


def test_pallas_backward_multi_tile_accumulation(data):
    """dW accumulation across batch-tile grid steps: >1 tile vs 1 tile."""
    _, weights, biases = data
    rng = np.random.default_rng(3)
    xb = jnp.asarray(rng.normal(size=(20, S, D)).astype(np.float32))
    gb = jnp.asarray(rng.normal(size=(20, S - 1, H)).astype(np.float32))
    from ta3n_tpu.ops import trn_fused as tf
    dx1, dw1, db1 = tf._fused_bwd_xla(S, 3, (xb, weights, biases), gb)
    # force 3 grid tiles (20 rows, tile 8 -> padded 24)
    masks = tf._fused_forward(xb, weights, biases, S, 3, True)[1]
    dx2, dw2, db2 = tf._fused_backward_pallas(xb, weights, masks, gb,
                                              S, 3, True, tile_batch=8)
    np.testing.assert_allclose(np.asarray(dx2), np.asarray(dx1), rtol=1e-4,
                               atol=1e-5)
    for a, b in zip(dw2, dw1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


def test_fused_odd_batch_padding(data):
    x, weights, biases = data
    x7 = x[:5]
    want = trn_multiscale_reference(x7, weights, biases, S)
    got = trn_multiscale_fused(x7, weights, biases, S, 3, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


def test_infer_forward_matches_reference(data):
    # mask-free inference forward (eval/serve paths): identical output to
    # the training forward, no mask output produced
    from ta3n_tpu.ops.trn_fused import trn_multiscale_infer
    x, weights, biases = data
    want = trn_multiscale_reference(x, weights, biases, S)
    got = trn_multiscale_infer(x, weights, biases, S, 3, True)
    assert got.shape == (B, S - 1, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


def test_module_infer_flag_matches_train_forward(data):
    x, _, _ = data
    rng = jax.random.PRNGKey(0)
    mod = RelationModuleMultiScale(D, H, S, use_pallas="never")
    var = mod.init(rng, x)
    np.testing.assert_allclose(np.asarray(mod.apply(var, x, infer=True)),
                               np.asarray(mod.apply(var, x)), rtol=1e-6)
