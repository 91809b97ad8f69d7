"""Train/eval step integration tests on synthetic data (SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ta3n_tpu.config import DAConfig, ModelConfig, TrainConfig
from ta3n_tpu.data import TSNLoader
from ta3n_tpu.data.synthetic import make_domain_pair
from ta3n_tpu.models import VideoModel
from ta3n_tpu.train import (StepScalars, create_train_state, dann_lr,
                            effective_beta, make_eval_step, make_train_step,
                            progress)

SEGMENTS = 3
FDIM = 16


def scalars(lr=0.1, beta=(0.0, 0.0, 0.0), gamma=0.0, alpha=0.0, mu=0.0):
    return StepScalars(jnp.asarray(beta, jnp.float32), jnp.asarray(mu),
                       jnp.asarray(alpha), jnp.asarray(gamma),
                       jnp.asarray(lr))


def run_steps(cfg, da, n_steps=20, lr=0.1, beta=(0, 0, 0), gamma=0.0,
              alpha=0.0, mu=0.0, bs=8, bt=6):
    src, tgt, val = make_domain_pair(num_source=32, num_target=24,
                                     num_val=16, num_class=cfg.num_class,
                                     feature_dim=FDIM, shift=1.0)
    tc = TrainConfig(lr=lr, batch_size=(bs, bt, bs))
    model = VideoModel(cfg)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, rng, bs, bt, tc)
    step = make_train_step(model, da, tc)
    ls = TSNLoader(src, batch_size=bs, num_segments=SEGMENTS, mode="test",
                   seed=1)
    lt = TSNLoader(tgt, batch_size=bt, num_segments=SEGMENTS, mode="test",
                   seed=2)
    losses = []
    i = 0
    while i < n_steps:
        for b_s, b_t in zip(ls.epoch(), lt.epoch()):
            state, m = step(state, b_s.features, b_s.labels, b_s.mask,
                            b_t.features, b_t.labels, b_t.mask,
                            scalars(lr, beta, gamma, alpha, mu),
                            jax.random.fold_in(rng, i))
            losses.append(float(m["loss_c"]))
            i += 1
            if i >= n_steps:
                break
    return state, model, losses, val


BASE = dict(num_class=4, train_segments=SEGMENTS, val_segments=SEGMENTS,
            fc_dim=16, feature_dim=FDIM, dropout_i=0.1, dropout_v=0.1)


def test_source_only_loss_decreases():
    cfg = ModelConfig(baseline_type="video", frame_aggregation="avgpool",
                      use_attn="none", **BASE)
    da = DAConfig(use_target="none")
    state, model, losses, val = run_steps(cfg, da, n_steps=25, lr=0.3)
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.9

    # eval path: top1 above chance on separable data
    ev = make_eval_step(model)
    lv = TSNLoader(val, batch_size=8, num_segments=SEGMENTS, mode="test",
                   shuffle=False)
    hits = total = 0.0
    for b in lv.epoch():
        r = ev(state.params, state.batch_stats, b.features, b.labels, b.mask)
        hits += float(r["top1"])
        total += float(r["n"])
    assert total == 16
    assert hits / total > 0.3


def test_full_ta3n_config_trains():
    cfg = ModelConfig(baseline_type="video", frame_aggregation="trn-m",
                      use_attn="TransAttn", **BASE)
    da = DAConfig(use_target="uSv", adv_DA="RevGrad",
                  add_loss_DA="attentive_entropy",
                  place_adv=("Y", "Y", "Y"))
    # lr 0.1: with the reference's real init (TRN fusion Linears at torch
    # DEFAULT init, not normal(0.001) — see layers.torch_default_uniform)
    # video-level gradients are ~1000x larger than under the pre-r4
    # all-normal(0.001) policy, and 0.2 diverges on this toy problem
    state, model, losses, _ = run_steps(cfg, da, n_steps=12, lr=0.1,
                                        beta=(0.5, 0.5, 0.5), gamma=0.01)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_dan_discrepancy_config():
    cfg = ModelConfig(baseline_type="video", frame_aggregation="avgpool",
                      use_attn="none", **BASE)
    da = DAConfig(use_target="uSv", dis_DA="DAN", place_dis=("N", "Y", "N"))
    state, model, losses, _ = run_steps(cfg, da, n_steps=6, lr=0.1,
                                        alpha=0.5)
    assert np.isfinite(losses).all()


def test_jan_and_coral_configs():
    """All-layer place_dis, incl. the 3D shared-layer feats that crash the
    reference for DAN/CORAL (guassian_kernel 4D expand, loss.py:49-52)."""
    cfg = ModelConfig(baseline_type="video", frame_aggregation="avgpool",
                      use_attn="none", **BASE)
    for dis in ("JAN", "CORAL", "DAN"):
        da = DAConfig(use_target="uSv", dis_DA=dis,
                      place_dis=("Y", "Y", "Y"))
        _, _, losses, _ = run_steps(cfg, da, n_steps=4, lr=0.1, alpha=0.5)
        assert np.isfinite(losses).all()


def test_mcd_config():
    cfg = ModelConfig(baseline_type="video", frame_aggregation="avgpool",
                      use_attn="none", ens_DA="MCD", **BASE)
    da = DAConfig(use_target="uSv", ens_DA="MCD")
    _, _, losses, _ = run_steps(cfg, da, n_steps=6, lr=0.1, mu=0.1)
    assert np.isfinite(losses).all()


def test_mcd_without_model_side_classifier_raises():
    """DAConfig.ens_DA='MCD' with a model lacking the second classifier
    would silently train an inert MCD (out_2 == out); hard error."""
    import pytest
    from ta3n_tpu.models import VideoModel
    from ta3n_tpu.train.step import make_train_step
    from ta3n_tpu.config import TrainConfig
    cfg = ModelConfig(baseline_type="video", frame_aggregation="avgpool",
                      use_attn="none", **BASE)  # ens_DA defaults 'none'
    da = DAConfig(use_target="uSv", ens_DA="MCD")
    with pytest.raises(ValueError, match="ens_DA"):
        make_train_step(VideoModel(cfg), da, TrainConfig())


def test_sv_supervised_target():
    cfg = ModelConfig(baseline_type="video", frame_aggregation="avgpool",
                      use_attn="none", **BASE)
    da = DAConfig(use_target="Sv")
    _, _, losses, _ = run_steps(cfg, da, n_steps=10, lr=0.2)
    assert losses[-1] < losses[0]


def test_target_entropy_config():
    cfg = ModelConfig(baseline_type="video", frame_aggregation="avgpool",
                      use_attn="none", **BASE)
    da = DAConfig(use_target="uSv", add_loss_DA="target_entropy")
    _, _, losses, _ = run_steps(cfg, da, n_steps=6, lr=0.1, gamma=0.1)
    assert np.isfinite(losses).all()


def test_adabn_config_updates_stats():
    cfg = ModelConfig(baseline_type="video", frame_aggregation="avgpool",
                      use_attn="none", use_bn="AdaBN", **BASE)
    da = DAConfig(use_target="uSv", adv_DA="RevGrad")
    state, model, losses, _ = run_steps(cfg, da, n_steps=4, lr=0.1,
                                        beta=(0.5, 0.5, 0.5))
    stats = state.batch_stats
    assert not np.allclose(np.asarray(stats["bn_shared_S"]["mean"]), 0.0)


def test_masked_rows_do_not_affect_updates():
    """Padded rows (mask 0) must not change the gradient — the static-shape
    analogue of removeDummy (main.py:825-832)."""
    kw = dict(BASE, dropout_i=0.0, dropout_v=0.0)
    cfg = ModelConfig(baseline_type="video", frame_aggregation="avgpool",
                      use_attn="none", **kw)
    da = DAConfig(use_target="uSv", adv_DA="RevGrad")
    tc = TrainConfig(lr=0.1, batch_size=(8, 6, 8))
    model = VideoModel(cfg)
    rng = jax.random.PRNGKey(0)
    step = make_train_step(model, da, tc)

    gen = np.random.default_rng(0)
    xs = gen.normal(size=(8, SEGMENTS, FDIM)).astype(np.float32)
    ys = gen.integers(0, 4, size=8).astype(np.int32)
    xt = gen.normal(size=(6, SEGMENTS, FDIM)).astype(np.float32)
    yt = gen.integers(0, 4, size=6).astype(np.int32)
    mask_s = np.array([1, 1, 1, 1, 1, 0, 0, 0], np.float32)
    mask_t = np.array([1, 1, 1, 1, 0, 0], np.float32)

    state0 = create_train_state(model, rng, 8, 6, tc)
    sc = scalars(0.1, (0.5, 0.5, 0.5))
    s1, m1 = step(state0, xs, ys, mask_s, xt, yt, mask_t, sc, rng)

    # garbage in the masked rows must not matter
    xs2 = xs.copy()
    xs2[5:] = 1e3
    xt2 = xt.copy()
    xt2[4:] = -1e3
    state0b = create_train_state(model, rng, 8, 6, tc)
    s2, m2 = step(state0b, xs2, ys, mask_s, xt2, yt, mask_t, sc, rng)

    p1 = jax.tree_util.tree_leaves(s1.params)
    p2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


def test_discrepancy_subbatch_matches_reference():
    """_discrepancy_loss replicates the reference's 256-row sub-batching
    (main.py:488-498: view into [n/256, 256, ...] chunks, per-layer loss
    = mean of per-chunk DAN/CORAL).  At the published batch
    (n_pair = min(128,74) = 74 <= 256) there is exactly one chunk; above
    256 the per-chunk mean is matched exactly for the divisible sizes the
    reference supports, and generalized with a remainder chunk where the
    reference's .view would raise."""
    from ta3n_tpu.losses.losses import CORAL, mmd_rbf
    from ta3n_tpu.train.step import _discrepancy_loss

    def reference_dan(feat_s, feat_t, place_dis, add_fc, n_pair):
        # golden re-derivation of main.py:476-499 (DAN branch)
        muls = [2.0, 2.0] + [2.0] * add_fc
        nums = [2, 5] + [5] * add_fc
        total = 0.0
        for l in range(add_fc + 2):
            if place_dis[l] != "Y" or l >= len(feat_s):
                continue
            fs = np.asarray(feat_s[l])[:n_pair].reshape(n_pair, -1)
            ft = np.asarray(feat_t[l])[:n_pair].reshape(n_pair, -1)
            size_batch = min(256, n_pair)
            assert n_pair % size_batch == 0  # torch .view contract
            cs = fs.reshape(-1, size_batch, fs.shape[-1])
            ct = ft.reshape(-1, size_batch, ft.shape[-1])
            vals = [float(mmd_rbf(jnp.asarray(cs[t]), jnp.asarray(ct[t]),
                                  kernel_mul=muls[l], kernel_num=nums[l],
                                  ver=2))
                    for t in range(cs.shape[0])]
            total += sum(vals) / len(vals)
        return total

    rng = np.random.default_rng(0)
    da = DAConfig(use_target="uSv", dis_DA="DAN",
                  place_dis=("Y", "Y", "N"))
    for n in (74, 512):  # published one-chunk size; 2-chunk size
        feat_s = [jnp.asarray(rng.normal(size=(n, 6)).astype(np.float32)),
                  jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))]
        feat_t = [jnp.asarray(
                      rng.normal(size=(n, 6)).astype(np.float32) + 0.3),
                  jnp.asarray(
                      rng.normal(size=(n, 8)).astype(np.float32) + 0.3)]
        ours = float(_discrepancy_loss(feat_s, feat_t, da, add_fc=1,
                                       n_pair=n))
        ref = reference_dan(feat_s, feat_t, da.place_dis, 1, n)
        np.testing.assert_allclose(ours, ref, rtol=1e-5)

    # remainder generalization (reference .view would crash at n=300):
    # mean over chunks [256, 44]
    n = 300
    feat_s = [jnp.asarray(rng.normal(size=(n, 6)).astype(np.float32))]
    feat_t = [jnp.asarray(rng.normal(size=(n, 6)).astype(np.float32) + .3)]
    da1 = DAConfig(use_target="uSv", dis_DA="DAN",
                   place_dis=("Y", "N", "N"))
    ours = float(_discrepancy_loss(feat_s, feat_t, da1, add_fc=1,
                                   n_pair=n))
    want = (float(mmd_rbf(feat_s[0][:256], feat_t[0][:256],
                          kernel_mul=2.0, kernel_num=2, ver=2))
            + float(mmd_rbf(feat_s[0][256:], feat_t[0][256:],
                            kernel_mul=2.0, kernel_num=2, ver=2))) / 2.0
    np.testing.assert_allclose(ours, want, rtol=1e-5)

    # CORAL takes the same chunked-mean path
    da2 = DAConfig(use_target="uSv", dis_DA="CORAL",
                   place_dis=("Y", "N", "N"))
    ours = float(_discrepancy_loss(feat_s, feat_t, da2, add_fc=1,
                                   n_pair=n))
    want = (float(CORAL(feat_s[0][:256], feat_t[0][:256]))
            + float(CORAL(feat_s[0][256:], feat_t[0][256:]))) / 2.0
    np.testing.assert_allclose(ours, want, rtol=1e-5)


def test_discrepancy_padded_chunks_weighted_out():
    """A trailing fully-padded 256-row chunk must not dilute (or NaN)
    the per-chunk discrepancy mean: the reference strips dummy rows
    BEFORE chunking (removeDummy main.py:420-422 -> view main.py:488-490),
    so with 200 valid of n_pair=512 rows it would average over ONE
    chunk.  Round-4 review finding: the padded chunk used to produce a
    NaN bandwidth (see test_mmd_rbf_degenerate_masks_finite) and was
    counted in the denominator."""
    from ta3n_tpu.losses.losses import CORAL, mmd_rbf
    from ta3n_tpu.train.step import _discrepancy_loss

    rng = np.random.default_rng(1)
    n, valid = 512, 200
    fs = [jnp.asarray(rng.normal(size=(n, 6)).astype(np.float32))]
    ft = [jnp.asarray(rng.normal(size=(n, 6)).astype(np.float32) + 0.3)]
    m = jnp.asarray((np.arange(n) < valid).astype(np.float32))

    da = DAConfig(use_target="uSv", dis_DA="DAN",
                  place_dis=("Y", "N", "N"))
    ours = float(_discrepancy_loss(fs, ft, da, add_fc=1, n_pair=n,
                                   mask_s=m, mask_t=m))
    assert np.isfinite(ours)
    want = float(mmd_rbf(fs[0][:256], ft[0][:256], kernel_mul=2.0,
                         kernel_num=2, ver=2, mask_source=m[:256],
                         mask_target=m[:256]))
    np.testing.assert_allclose(ours, want, rtol=1e-5)

    da2 = DAConfig(use_target="uSv", dis_DA="CORAL",
                   place_dis=("Y", "N", "N"))
    ours2 = float(_discrepancy_loss(fs, ft, da2, add_fc=1, n_pair=n,
                                    mask_s=m, mask_t=m))
    want2 = float(CORAL(fs[0][:256], ft[0][:256], mask_source=m[:256],
                        mask_target=m[:256]))
    np.testing.assert_allclose(ours2, want2, rtol=1e-5)
