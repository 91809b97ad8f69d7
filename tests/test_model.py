"""VideoModel behaviour tests: shapes, attention, GRL wiring, BN routing,
torch-parity for the masked BatchNorm."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ta3n_tpu.config import ModelConfig
from ta3n_tpu.losses import entropy_from_logits
from ta3n_tpu.models import VideoModel
from ta3n_tpu.models.layers import MaskedBatchNorm

K = jax.random.PRNGKey(0)


def make(cfg, bs=4, bt=3, segments=None):
    s = segments or cfg.train_segments
    xs = jax.random.normal(K, (bs, s, cfg.input_feature_dim))
    xt = jax.random.normal(jax.random.PRNGKey(9),
                           (bt, s, cfg.input_feature_dim))
    m = VideoModel(cfg)
    var = m.init({"params": K, "dropout": K}, xs, xt,
                 jnp.zeros(3), jnp.asarray(0.0), True, False)
    return m, var, xs, xt


BASE = dict(num_class=6, train_segments=5, val_segments=5, fc_dim=32,
            feature_dim=24)


def test_trn_m_output_contract():
    cfg = ModelConfig(baseline_type="video", frame_aggregation="trn-m",
                      use_attn="TransAttn", **BASE)
    m, var, xs, xt = make(cfg)
    s, t = m.apply(var, xs, xt, jnp.array([0.5, 0.5, 0.5]),
                   jnp.asarray(0.0), True, False, rngs={"dropout": K})
    assert s.out.shape == (4, 6) and t.out.shape == (3, 6)
    # pred_domain order = (relation, video, frame) — models.py:722 reversal
    assert s.pred_domain[0].shape == (4, 4, 2)
    assert s.pred_domain[1].shape == (4, 2)
    assert s.pred_domain[2].shape == (4, 5, 2)
    assert s.attn.shape == (4, 4)
    # feat reversed order: (video logits, video feature, fc1)
    assert s.feat[0].shape == (4, 6)
    assert s.feat[1].shape == (4, 32 if cfg.num_bottleneck == 0 else 256)
    assert s.feat[2].shape == (4, 5, 24)  # shared_dim = min(32, 24) = 24


def test_eval_deterministic():
    cfg = ModelConfig(baseline_type="video", frame_aggregation="avgpool",
                      use_attn="none", **BASE)
    m, var, xs, xt = make(cfg)
    s1, _ = m.apply(var, xs, xt, jnp.zeros(3), jnp.asarray(0.0), False, False)
    s2, _ = m.apply(var, xs, xt, jnp.zeros(3), jnp.asarray(0.0), False, False)
    np.testing.assert_allclose(np.asarray(s1.out), np.asarray(s2.out))


def test_trans_attn_weights_formula():
    cfg = ModelConfig(baseline_type="video", frame_aggregation="trn-m",
                      use_attn="TransAttn", **BASE)
    m, var, xs, xt = make(cfg)
    s, _ = m.apply(var, xs, xt, jnp.zeros(3), jnp.asarray(0.0), False, False)
    # attn = 1 - H(softmax(relation domain logits)) (models.py:351-357)
    w = 1.0 - entropy_from_logits(s.pred_domain[0])
    np.testing.assert_allclose(np.asarray(s.attn), np.asarray(w), rtol=1e-5)


def test_grl_reverses_adversarial_gradient():
    """The domain loss must push the shared feature layer in opposite
    directions with GRL engaged vs detached (the RevGrad mechanism)."""
    cfg = ModelConfig(baseline_type="video", frame_aggregation="avgpool",
                      use_attn="none", dropout_i=0.0, dropout_v=0.0, **BASE)
    m, var, xs, xt = make(cfg)

    def domain_loss(params, beta):
        s, t = m.apply({"params": params}, xs, xt,
                       jnp.array([0.0, 0.0, beta]), jnp.asarray(0.0),
                       True, False, rngs={"dropout": K})
        logits = jnp.concatenate([s.pred_domain[2].reshape(-1, 2),
                                  t.pred_domain[2].reshape(-1, 2)])
        labels = jnp.concatenate([jnp.zeros(20, jnp.int32),
                                  jnp.ones(15, jnp.int32)])
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], 1))

    g_pos = jax.grad(domain_loss)(var["params"], 1.0)
    g_neg = jax.grad(domain_loss)(var["params"], -1.0)
    shared_pos = g_pos["fc_feature_shared_source"]["kernel"]
    shared_neg = g_neg["fc_feature_shared_source"]["kernel"]
    np.testing.assert_allclose(np.asarray(shared_pos),
                               -np.asarray(shared_neg), atol=1e-6)
    # discriminator's own weights are NOT reversed (after the GRL)
    disc_pos = g_pos["fc_classifier_domain"]["kernel"]
    disc_neg = g_neg["fc_classifier_domain"]["kernel"]
    np.testing.assert_allclose(np.asarray(disc_pos), np.asarray(disc_neg),
                               atol=1e-6)


def test_beta_zero_blocks_adversarial_gradient():
    cfg = ModelConfig(baseline_type="video", frame_aggregation="avgpool",
                      use_attn="none", dropout_i=0.0, dropout_v=0.0, **BASE)
    m, var, xs, xt = make(cfg)

    def domain_loss(params):
        s, t = m.apply({"params": params}, xs, xt, jnp.zeros(3),
                       jnp.asarray(0.0), True, False, rngs={"dropout": K})
        return jnp.sum(s.pred_domain[2] ** 2)

    g = jax.grad(domain_loss)(var["params"])
    np.testing.assert_allclose(
        np.asarray(g["fc_feature_shared_source"]["kernel"]), 0.0, atol=1e-7)


def test_mcd_second_classifier_differs():
    cfg = ModelConfig(baseline_type="video", frame_aggregation="avgpool",
                      use_attn="none", ens_DA="MCD", dropout_i=0.0,
                      dropout_v=0.0, **BASE)
    m, var, xs, xt = make(cfg)
    s, _ = m.apply(var, xs, xt, jnp.zeros(3), jnp.asarray(0.0), False, False)
    assert s.out.shape == s.out_2.shape
    assert not np.allclose(np.asarray(s.out), np.asarray(s.out_2))


def test_share_params_n_separate_streams():
    cfg = ModelConfig(baseline_type="video", frame_aggregation="avgpool",
                      use_attn="none", share_params="N", dropout_i=0.0,
                      dropout_v=0.0, **BASE)
    m, var, xs, xt = make(cfg)
    assert "fc_feature_shared_target" in var["params"]
    # same input through both streams gives different outputs (different
    # random init per stream)
    s, t = m.apply(var, xs, xs, jnp.zeros(3), jnp.asarray(0.0), False, False)
    assert not np.allclose(np.asarray(s.out), np.asarray(t.out))


def test_masked_batchnorm_matches_torch():
    x = np.random.default_rng(0).normal(size=(12, 5)).astype(np.float32)
    bn_t = torch.nn.BatchNorm1d(5)
    bn_t.train()
    want = bn_t(torch.from_numpy(x)).detach().numpy()

    bn = MaskedBatchNorm(5)
    var = bn.init(K, jnp.asarray(x))
    got, mut = bn.apply(var, jnp.asarray(x), mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
    # running stats: torch momentum 0.1, unbiased variance
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["mean"]),
                               bn_t.running_mean.numpy(), rtol=1e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["var"]),
                               bn_t.running_var.numpy(), rtol=1e-4,
                               atol=1e-6)


def test_masked_batchnorm_weighted_stats_equal_subset():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(10, 4)).astype(np.float32)
    w = np.array([1, 1, 1, 1, 1, 1, 0, 0, 0, 0], dtype=np.float32)
    bn = MaskedBatchNorm(4)
    var = bn.init(K, jnp.asarray(x))
    full, _ = bn.apply(var, jnp.asarray(x), jnp.asarray(w),
                       mutable=["batch_stats"])
    sub, _ = bn.apply(var, jnp.asarray(x[:6]), mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(full[:6]), np.asarray(sub),
                               rtol=1e-4, atol=1e-5)


def test_adabn_separate_domain_stats():
    cfg = ModelConfig(baseline_type="video", frame_aggregation="avgpool",
                      use_attn="none", use_bn="AdaBN", dropout_i=0.0,
                      dropout_v=0.0, **BASE)
    m = VideoModel(cfg)
    xs = jnp.ones((4, 5, 24)) * 2.0
    xt = jnp.ones((3, 5, 24)) * -1.0
    var = m.init({"params": K, "dropout": K}, xs, xt, jnp.zeros(3),
                 jnp.asarray(0.0), True, False)
    _, mut = m.apply(var, xs, xt, jnp.zeros(3), jnp.asarray(0.0), True,
                     False, rngs={"dropout": K}, mutable=["batch_stats"])
    stats = mut["batch_stats"]
    mean_s = np.asarray(stats["bn_shared_S"]["mean"])
    mean_t = np.asarray(stats["bn_shared_T"]["mean"])
    # alpha=1 (AdaBN): no mixing — stats must differ between domains
    assert not np.allclose(mean_s, mean_t)


def test_val_segments_path():
    kw = dict(BASE, val_segments=7)
    cfg = ModelConfig(baseline_type="video", frame_aggregation="avgpool",
                      use_attn="none", **kw)
    m, var, xs, xt = make(cfg)  # init with train segments
    xv = jax.random.normal(K, (2, 7, 24))
    s, t = m.apply(var, xv, xv, jnp.zeros(3), jnp.asarray(0.0), False, False)
    assert s.out.shape == (2, 6)


def test_gru_aggregation():
    cfg = ModelConfig(baseline_type="video", frame_aggregation="rnn",
                      use_attn="none", rnn_cell="GRU", n_ts=3, **BASE)
    m, var, xs, xt = make(cfg)
    s, t = m.apply(var, xs, xt, jnp.zeros(3), jnp.asarray(0.0), False,
                   False)
    assert s.out.shape == (4, 6)
    assert np.isfinite(np.asarray(s.out)).all()


def test_frame_and_tsn_baselines():
    for baseline, shape in [("frame", (4, 5, 6)), ("tsn", (4, 6))]:
        cfg = ModelConfig(baseline_type=baseline,
                          frame_aggregation="avgpool", use_attn="none",
                          **BASE)
        m, var, xs, xt = make(cfg)
        s, _ = m.apply(var, xs, xt, jnp.zeros(3), jnp.asarray(0.0), False,
                       False)
        assert s.out.shape == shape
