"""Attentive-entropy layer-selection semantics, incl. the documented
divergence from the reference: main.py:560 indexes pred_domain_all[1]
and CRASHES for any --place_adv other than the published ones
(IndexError with < 2 selected layers; torch broadcast RuntimeError when
the 2nd selection is frame-level).  We select the first row-count-matching
candidate instead (see train/step.py loss_fn (4) and PARITY.md)."""

import jax
import jax.numpy as jnp
import numpy as np

from ta3n_tpu.config import DAConfig, ModelConfig, TrainConfig
from ta3n_tpu.losses import attentive_entropy
from ta3n_tpu.models import VideoModel
from ta3n_tpu.train import (StepScalars, create_train_state,
                            make_train_step)

SEG, FDIM, NC = 3, 16, 4
BS, BT = 6, 4


def _setup(place_adv):
    cfg = ModelConfig(num_class=NC, baseline_type="video",
                      frame_aggregation="trn-m", use_attn="TransAttn",
                      train_segments=SEG, val_segments=SEG, fc_dim=16,
                      feature_dim=FDIM, dropout_i=0.0, dropout_v=0.0)
    da = DAConfig(use_target="uSv", adv_DA="RevGrad",
                  add_loss_DA="attentive_entropy", place_adv=place_adv)
    tc = TrainConfig(lr=0.1, batch_size=(BS, BT, BS), gamma=1.0)
    model = VideoModel(cfg)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, rng, BS, BT, tc)
    gen = np.random.default_rng(0)
    xs = gen.normal(size=(BS, SEG, FDIM)).astype(np.float32)
    xt = gen.normal(size=(BT, SEG, FDIM)).astype(np.float32)
    ys = gen.integers(0, NC, size=BS).astype(np.int32)
    yt = gen.integers(0, NC, size=BT).astype(np.int32)
    ms, mt = np.ones(BS, np.float32), np.ones(BT, np.float32)
    sc = StepScalars(jnp.array([0.5, 0.5, 0.5]), jnp.asarray(0.0),
                     jnp.asarray(0.0), jnp.asarray(1.0), jnp.asarray(0.1))
    return model, da, tc, state, (xs, ys, ms, xt, yt, mt), sc, rng


def _expected_loss_e(model, state, batch, beta, dom_layer, rng):
    """Recompute attentive entropy from a raw forward pass (dropout=0)."""
    xs, ys, ms, xt, yt, mt = batch
    # the step folds the step counter in, then splits for dropout/MCD
    rng_fwd, _ = jax.random.split(jax.random.fold_in(rng, state.step))
    out_s, out_t = model.apply(
        {"params": state.params}, xs, xt, beta, jnp.asarray(0.0), True,
        False, rngs={"dropout": rng_fwd})
    pred_all = jnp.concatenate([out_s.out, out_t.out], axis=0)
    dom = jnp.concatenate([out_s.pred_domain[dom_layer],
                           out_t.pred_domain[dom_layer]], axis=0)
    m = jnp.concatenate([jnp.asarray(ms), jnp.asarray(mt)])
    return float(attentive_entropy(pred_all, dom, m))


def test_published_config_uses_second_selected_layer():
    """place_adv=YYY: pred_domain_all[1] == video level (main.py:560)."""
    model, da, tc, state, batch, sc, rng = _setup(("Y", "Y", "Y"))
    step = make_train_step(model, da, tc)
    want = _expected_loss_e(model, state, batch, sc.beta, 1, rng)
    _, m = step(state, *batch, sc, rng)
    np.testing.assert_allclose(float(m["loss_e"]), want, rtol=1e-5)


def test_single_selected_layer_falls_back_to_video_level():
    """place_adv=N,N,Y crashes the reference (IndexError); we fall back
    to the video-level domain logits."""
    model, da, tc, state, batch, sc, rng = _setup(("N", "N", "Y"))
    step = make_train_step(model, da, tc)
    want = _expected_loss_e(model, state, batch, sc.beta, 1, rng)
    _, m = step(state, *batch, sc, rng)
    np.testing.assert_allclose(float(m["loss_e"]), want, rtol=1e-5)
    assert np.isfinite(float(m["loss"]))


def test_frame_second_selection_falls_back_to_video_level():
    """place_adv=Y,N,Y crashes the reference (broadcast error: the 2nd
    selected layer is frame-level with (Bs+Bt)*S rows); we pick the
    video-level logits whose rows match."""
    model, da, tc, state, batch, sc, rng = _setup(("Y", "N", "Y"))
    step = make_train_step(model, da, tc)
    want = _expected_loss_e(model, state, batch, sc.beta, 1, rng)
    _, m = step(state, *batch, sc, rng)
    np.testing.assert_allclose(float(m["loss_e"]), want, rtol=1e-5)
    assert np.isfinite(float(m["loss"]))
