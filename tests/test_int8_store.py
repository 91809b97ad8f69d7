"""Int8 quantized feature stores (--store_dtype int8, data/quantized.py):
4x HBM residency vs f32.  Contracts: quantization error bounded by
scale/2 per row; the on-device dequantizing gather is BITWISE equal to
gathering a host-dequantized f32 store (so the whole training/eval math
is exactly 'train on dequant(quant(x))'); streaming shard quantization
is bitwise-equal to resident quantization.  Capacity capability beyond
the reference (dataset.py:53-66 keeps f32 .t7 files, no residency
concept)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ta3n_tpu.config import DAConfig, ModelConfig, TrainConfig
from ta3n_tpu.data import ShardPlan, ShardStream, TSNLoader
from ta3n_tpu.data.quantized import (dequantize_rows, is_quantized,
                                     quantize_rows)
from ta3n_tpu.data.synthetic import make_domain_pair
from ta3n_tpu.models import VideoModel
from ta3n_tpu.train import (StepScalars, create_train_state,
                            make_eval_step, make_train_step)
from ta3n_tpu.train.loop import Trainer
from ta3n_tpu.train.step import device_gather

SEG, FDIM = 3, 16


def _flagship():
    cfg = ModelConfig(num_class=3, baseline_type="video",
                      frame_aggregation="trn-m", use_attn="TransAttn",
                      train_segments=SEG, val_segments=SEG, fc_dim=16,
                      feature_dim=FDIM, dropout_i=0.0, dropout_v=0.0)
    da = DAConfig(use_target="uSv", adv_DA="RevGrad",
                  place_adv=("Y", "Y", "Y"))
    tc = TrainConfig(lr=0.1, batch_size=(8, 6, 8))
    return VideoModel(cfg), da, tc


def test_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(40, FDIM)).astype(np.float32) * \
        rng.uniform(0.01, 30.0, size=(40, 1)).astype(np.float32)
    x[7] = 0.0  # all-zero row (shard padding)
    q, scale = quantize_rows(x)
    assert q.dtype == np.int8 and scale.dtype == np.float32
    back = dequantize_rows(q, scale)
    # round-to-nearest: |x - q*s| <= s/2 per row
    err = np.abs(back - x).max(axis=1)
    assert (err <= scale / 2 + 1e-7).all()
    np.testing.assert_array_equal(back[7], 0.0)  # padding rows exact
    # Flow-shaped [rows, streams, D] store
    xf = rng.normal(size=(10, 2, FDIM)).astype(np.float32)
    qf, sf = quantize_rows(xf)
    errf = np.abs(dequantize_rows(qf, sf) - xf).reshape(10, -1).max(axis=1)
    assert (errf <= sf / 2 + 1e-7).all()


def test_device_gather_int8_bitwise_matches_host_dequant():
    src, _, _ = make_domain_pair(num_source=20, num_target=8, num_val=8,
                                 num_class=3, feature_dim=FDIM)
    q, scale = quantize_rows(src.features)
    store_q = (jnp.asarray(q), jnp.asarray(scale))
    assert is_quantized(store_q)
    store_deq = jnp.asarray(dequantize_rows(q, scale))
    loader = TSNLoader(src, batch_size=6, num_segments=SEG, mode="test",
                       seed=5)
    for b in loader.index_epoch():
        got = np.asarray(device_gather(store_q, b.abs_indices))
        want = np.asarray(device_gather(store_deq, b.abs_indices))
        np.testing.assert_array_equal(got, want)


def test_int8_step_bitwise_matches_dequantized_store_step():
    """A train step on the (q, scale) store equals the same step on a
    pre-dequantized f32 store bitwise — int8 training IS training on
    dequant(quant(x)), nothing else changes."""
    src, tgt, _ = make_domain_pair(num_source=24, num_target=18, num_val=8,
                                   num_class=3, feature_dim=FDIM)
    model, da, tc = _flagship()
    rng = jax.random.PRNGKey(0)
    step = make_train_step(model, da, tc, gather_on_device=True)

    qs, ss = quantize_rows(src.features)
    qt, st_ = quantize_rows(tgt.features)
    store_qs = (jnp.asarray(qs), jnp.asarray(ss))
    store_qt = (jnp.asarray(qt), jnp.asarray(st_))
    deq_s = jnp.asarray(dequantize_rows(qs, ss))
    deq_t = jnp.asarray(dequantize_rows(qt, st_))

    li_s = TSNLoader(src, batch_size=8, num_segments=SEG, mode="test",
                     seed=1)
    li_t = TSNLoader(tgt, batch_size=6, num_segments=SEG, mode="test",
                     seed=2)
    li_s2 = TSNLoader(src, batch_size=8, num_segments=SEG, mode="test",
                      seed=1)
    li_t2 = TSNLoader(tgt, batch_size=6, num_segments=SEG, mode="test",
                      seed=2)
    sc = StepScalars(np.float32([0.5, 0.5, 0.5]), np.float32(0),
                     np.float32(0), np.float32(0), np.float32(0.1))
    st_q = create_train_state(model, rng, 8, 6, tc)
    st_d = create_train_state(model, rng, 8, 6, tc)
    for (bq_s, bq_t), (bd_s, bd_t) in zip(
            zip(li_s.index_epoch(), li_t.index_epoch()),
            zip(li_s2.index_epoch(), li_t2.index_epoch())):
        st_q, m_q = step(st_q, store_qs, bq_s.abs_indices, bq_s.labels,
                         bq_s.mask, store_qt, bq_t.abs_indices,
                         bq_t.labels, bq_t.mask, sc, rng)
        st_d, m_d = step(st_d, deq_s, bd_s.abs_indices, bd_s.labels,
                         bd_s.mask, deq_t, bd_t.abs_indices,
                         bd_t.labels, bd_t.mask, sc, rng)
        np.testing.assert_array_equal(np.asarray(m_q["loss"]),
                                      np.asarray(m_d["loss"]))
    for a, b in zip(jax.tree_util.tree_leaves(st_q.params),
                    jax.tree_util.tree_leaves(st_d.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_int8_eval_step_bitwise_matches_dequantized():
    src, _, val = make_domain_pair(num_source=12, num_target=8, num_val=12,
                                   num_class=3, feature_dim=FDIM)
    model, _, tc = _flagship()
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, rng, 8, 6, tc)
    ev = make_eval_step(model, gather_on_device=True)
    q, s = quantize_rows(val.features)
    store_q = (jnp.asarray(q), jnp.asarray(s))
    deq = jnp.asarray(dequantize_rows(q, s))
    lv = TSNLoader(val, batch_size=8, num_segments=SEG, mode="test",
                   shuffle=False)
    for b in lv.index_epoch():
        r_q = ev(state.params, state.batch_stats, store_q,
                 b.abs_indices, b.labels, b.mask)
        r_d = ev(state.params, state.batch_stats, deq,
                 b.abs_indices, b.labels, b.mask)
        for k in r_q:
            np.testing.assert_array_equal(np.asarray(r_q[k]),
                                          np.asarray(r_d[k]))


def test_streaming_int8_shards_bitwise_equal_resident_int8():
    """Per-row quantization commutes with shard slicing/padding: the
    int8 ShardStream feeds exactly the rows the resident (q, scale)
    store holds."""
    src, _, _ = make_domain_pair(num_source=30, num_target=8, num_val=8,
                                 num_class=3, feature_dim=FDIM)
    plan = ShardPlan(src.offsets, budget_rows=100)
    assert plan.num_shards >= 2
    stream = ShardStream(src.features, plan, dtype=np.int8)
    q_full, s_full = quantize_rows(src.features)
    for sid in range(plan.num_shards):
        q_sh, s_sh = stream.get(sid)
        assert np.asarray(q_sh).dtype == np.int8
        lo, hi = int(plan.row_lo[sid]), int(plan.row_hi[sid])
        np.testing.assert_array_equal(np.asarray(q_sh)[:hi - lo],
                                      q_full[lo:hi])
        np.testing.assert_array_equal(np.asarray(s_sh)[:hi - lo],
                                      s_full[lo:hi])
        # padding rows dequantize to exact zeros
        np.testing.assert_array_equal(np.asarray(q_sh)[hi - lo:], 0)
        np.testing.assert_array_equal(np.asarray(s_sh)[hi - lo:], 1.0)


def test_trainer_int8_device_store_end_to_end(tmp_path):
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
                 use_mesh=True, device_store=True, store_dtype="int8",
                 eval_freq=1, print_freq=1, show_freq=100)
    # the wiring actually quantized: stores are (q int8, scale f32) pairs
    assert is_quantized(tr._dev_store_s)
    assert np.asarray(tr._dev_store_s[0]).dtype == np.int8
    assert np.asarray(tr._dev_store_v[1]).dtype == np.float32
    best = tr.fit()
    assert np.isfinite(best) and best >= 0.0


def test_disk_quantized_store_roundtrip(tmp_path):
    """store.quantize() + save/load: int8 features + scales persist;
    host gathers dequantize transparently and bitwise-match the manual
    dequant; subset carries scales."""
    import os
    from ta3n_tpu.data import FeatureStore
    src, _, _ = make_domain_pair(num_source=20, num_target=8, num_val=8,
                                 num_class=3, feature_dim=FDIM)
    qs = src.quantize()
    assert qs.quantized and qs.features.dtype == np.int8
    assert qs.quantize() is qs  # idempotent
    d = str(tmp_path / "qstore")
    qs.save(d)
    # 4x smaller rows on disk
    assert (os.path.getsize(os.path.join(d, "features.npy"))
            < src.features.nbytes // 3)
    loaded = FeatureStore.load(d)
    assert loaded.quantized
    vids = np.array([0, 3, 5])
    frames = np.array([[0, 1, 2]] * 3)
    got = loaded.gather(vids, frames)
    deq = dequantize_rows(np.asarray(loaded.features),
                          np.asarray(loaded.scales))
    abs_idx = loaded.offsets[vids][:, None] + frames
    np.testing.assert_array_equal(got, deq[abs_idx])
    sub = loaded.subset([1, 4])
    assert sub.quantized
    np.testing.assert_array_equal(
        sub.gather(np.array([0]), frames[:1]),
        loaded.gather(np.array([1]), frames[:1]))


def test_disk_quantized_host_batches_bitwise_match_device_gather():
    src, _, _ = make_domain_pair(num_source=20, num_target=8, num_val=8,
                                 num_class=3, feature_dim=FDIM)
    qs = src.quantize()
    l_host = TSNLoader(qs, batch_size=6, num_segments=SEG, mode="test",
                       seed=5)
    l_idx = TSNLoader(qs, batch_size=6, num_segments=SEG, mode="test",
                      seed=5)
    store_dev = (jnp.asarray(np.ascontiguousarray(qs.features)),
                 jnp.asarray(np.ascontiguousarray(qs.scales)))
    for b_host, b_idx in zip(l_host.epoch(), l_idx.index_epoch()):
        got = np.asarray(device_gather(store_dev, b_idx.abs_indices))
        got = got * b_idx.mask[:, None, None]
        np.testing.assert_array_equal(got, b_host.features)


def test_trainer_disk_quantized_store_resident_and_streaming(tmp_path):
    src, tgt, val = make_domain_pair(num_source=24, num_target=18,
                                     num_val=12, num_class=3,
                                     feature_dim=FDIM, shift=0.8)
    src, tgt, val = src.quantize(), tgt.quantize(), val.quantize()
    cfg = ModelConfig(num_class=3, baseline_type="video",
                      frame_aggregation="avgpool", train_segments=SEG,
                      val_segments=SEG, fc_dim=16, feature_dim=FDIM,
                      dropout_i=0.1, dropout_v=0.1)
    da = DAConfig(use_target="uSv", adv_DA="RevGrad")
    tc = TrainConfig(lr=0.05, epochs=2, batch_size=(8, 6, 8),
                     beta=(0.5, 0.5, 0.5))

    def loaders():
        return (TSNLoader(src, batch_size=8, num_segments=SEG,
                          mode="test", seed=1),
                TSNLoader(tgt, batch_size=6, num_segments=SEG,
                          mode="test", seed=2),
                TSNLoader(val, batch_size=8, num_segments=SEG,
                          mode="test", shuffle=False))

    tr = Trainer(cfg, da, tc, *loaders(), path_exp=str(tmp_path) + "/a/",
                 use_mesh=True, device_store=True, eval_freq=1,
                 print_freq=1, show_freq=100)
    # upload was the already-quantized (q, scale) pair
    assert is_quantized(tr._dev_store_s)
    assert np.asarray(tr._dev_store_s[0]).dtype == np.int8
    assert np.isfinite(tr.fit())

    tr2 = Trainer(cfg, da, tc, *loaders(), path_exp=str(tmp_path) + "/b/",
                  use_mesh=True, device_store=True, store_budget_rows=60,
                  eval_freq=1, print_freq=1, show_freq=100)
    assert tr2.streaming
    assert np.isfinite(tr2.fit())


def test_sweep_int8_store_bitwise_matches_dequantized():
    """run_sweep(store_dtype='int8') == run_sweep on pre-dequantized
    stores, member by member (the sweep CLI's --store_dtype path)."""
    from ta3n_tpu.data import FeatureStore
    from ta3n_tpu.train.sweep import run_sweep
    src, tgt, val = make_domain_pair(num_source=16, num_target=16,
                                     num_val=8, num_class=3,
                                     feature_dim=FDIM, seed=0)
    cfg = ModelConfig(num_class=3, baseline_type="video",
                      frame_aggregation="avgpool", train_segments=SEG,
                      val_segments=SEG, fc_dim=16, feature_dim=FDIM,
                      dropout_i=0.0, dropout_v=0.0)
    da = DAConfig(use_target="uSv", adv_DA="RevGrad")
    tc = TrainConfig(lr=0.1, epochs=2, batch_size=(8, 8, 8))
    members = [(0, 0.1, 0.0), (1, 0.05, 0.0)]

    def loaders(s, t, v):
        return (TSNLoader(s, batch_size=8, num_segments=SEG, mode="test",
                          seed=1),
                TSNLoader(t, batch_size=8, num_segments=SEG, mode="test",
                          seed=2),
                TSNLoader(v, batch_size=8, num_segments=SEG, mode="test",
                          shuffle=False))

    def deq(store):
        return FeatureStore(dequantize_rows(*quantize_rows(store.features)),
                            store.offsets, store.paths, store.labels)

    out_q = run_sweep(cfg, da, tc, *loaders(src, tgt, val), members,
                      store_dtype="int8")
    out_d = run_sweep(cfg, da, tc, *loaders(deq(src), deq(tgt), deq(val)),
                      members)
    for rq, rd in zip(out_q["results"], out_d["results"]):
        np.testing.assert_array_equal(rq["final_loss"], rd["final_loss"])
        assert rq["top1"] == rd["top1"]
    assert out_q["ensemble_top1"] == out_d["ensemble_top1"]


def test_combined_store_path_rejects_int8():
    src, tgt, _ = make_domain_pair(num_source=12, num_target=8, num_val=8,
                                   num_class=3, feature_dim=FDIM)
    model, da, tc = _flagship()
    rng = jax.random.PRNGKey(0)
    step = make_train_step(model, da, tc, gather_on_device=True,
                           combined_store_rows=int(src.offsets[-1]))
    q, s = quantize_rows(np.concatenate([src.features, tgt.features]))
    li_s = TSNLoader(src, batch_size=8, num_segments=SEG, mode="test",
                     seed=1)
    li_t = TSNLoader(tgt, batch_size=6, num_segments=SEG, mode="test",
                     seed=2)
    b_s = next(iter(li_s.index_epoch()))
    b_t = next(iter(li_t.index_epoch()))
    sc = StepScalars(np.float32([0.5, 0.5, 0.5]), np.float32(0),
                     np.float32(0), np.float32(0), np.float32(0.1))
    state = create_train_state(model, rng, 8, 6, tc)
    with pytest.raises(TypeError, match="int8"):
        step(state, (jnp.asarray(q), jnp.asarray(s)), b_s.abs_indices,
             b_s.labels, b_s.mask, b_t.abs_indices, b_t.labels,
             b_t.mask, sc, rng)
