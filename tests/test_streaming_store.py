"""Larger-than-HBM store streaming (data/streaming.py): shard plan,
shard-local epochs, and the core contract — training through the
double-buffered shard stream is BITWISE equal to the fully-resident
store consuming the same batches (VERDICT r1 #6; reference premise:
dataset.py:53-66 per-file loading scales to any dataset size)."""

import jax
import jax.numpy as jnp
import numpy as np

from ta3n_tpu.config import DAConfig, ModelConfig, TrainConfig
from ta3n_tpu.data import ShardPlan, ShardStream, TSNLoader
from ta3n_tpu.data.synthetic import make_domain_pair
from ta3n_tpu.models import VideoModel
from ta3n_tpu.train import (StepScalars, create_train_state,
                            make_train_step)
from ta3n_tpu.train.loop import Trainer

SEG, FDIM = 3, 16


def test_shard_plan_partition():
    # videos of 4 rows each; budget 10 -> 2 videos (8 rows) per shard
    offsets = np.arange(0, 41, 4, dtype=np.int64)  # 10 videos
    plan = ShardPlan(offsets, budget_rows=10)
    assert plan.num_shards == 5
    np.testing.assert_array_equal(plan.video_lo, [0, 2, 4, 6, 8])
    np.testing.assert_array_equal(plan.row_lo, [0, 8, 16, 24, 32])
    np.testing.assert_array_equal(plan.shard_of(np.arange(10)),
                                  [0, 0, 1, 1, 2, 2, 3, 3, 4, 4])


def test_shard_plan_rejects_oversized_video():
    offsets = np.array([0, 4, 30, 34], dtype=np.int64)  # video 1: 26 rows
    try:
        ShardPlan(offsets, budget_rows=10)
        assert False, "expected ValueError"
    except ValueError as e:
        assert "budget_rows" in str(e)


def test_shard_array_padded_to_budget():
    offsets = np.array([0, 3, 7], dtype=np.int64)
    feats = np.arange(7 * 2, dtype=np.float32).reshape(7, 2)
    plan = ShardPlan(offsets, budget_rows=4)
    assert plan.num_shards == 2
    a0 = plan.shard_array(feats, 0)
    assert a0.shape == (4, 2)
    np.testing.assert_array_equal(a0[:3], feats[:3])
    np.testing.assert_array_equal(a0[3], 0)


def test_shard_epoch_covers_every_record_once():
    src, _, _ = make_domain_pair(num_source=30, num_target=8, num_val=8,
                                 num_class=3, feature_dim=FDIM)
    loader = TSNLoader(src, batch_size=4, num_segments=SEG, mode="test",
                       seed=3)
    plan = ShardPlan(src.offsets, budget_rows=80)
    assert plan.num_shards >= 3
    seen = []
    for sid, b in loader.shard_index_epoch(plan):
        real = b.mask > 0
        # local indices stay within the shard budget
        assert b.abs_indices[real].min() >= 0
        assert b.abs_indices[real].max() < plan.budget_rows
        # every real row's video belongs to this shard
        glob = b.abs_indices[real] + int(plan.row_lo[sid])
        vid = np.searchsorted(src.offsets, glob[:, 0], side="right") - 1
        assert (plan.shard_of(vid) == sid).all()
        seen.extend(np.asarray(b.labels)[real].tolist())
    assert len(seen) == loader.num_videos


def _flagship(num_class=3):
    cfg = ModelConfig(num_class=num_class, baseline_type="video",
                      frame_aggregation="trn-m", use_attn="TransAttn",
                      train_segments=SEG, val_segments=SEG, fc_dim=16,
                      feature_dim=FDIM, dropout_i=0.5, dropout_v=0.5)
    da = DAConfig(use_target="uSv", adv_DA="RevGrad",
                  place_adv=("Y", "Y", "Y"))
    tc = TrainConfig(lr=0.1, batch_size=(8, 6, 8))
    return VideoModel(cfg), da, tc


def test_streaming_training_bitwise_equals_resident():
    src, tgt, _ = make_domain_pair(num_source=30, num_target=24, num_val=8,
                                   num_class=3, feature_dim=FDIM)
    model, da, tc = _flagship()
    rng = jax.random.PRNGKey(0)
    step = make_train_step(model, da, tc, gather_on_device=True)

    plan_s = ShardPlan(src.offsets, budget_rows=100)
    plan_t = ShardPlan(tgt.offsets, budget_rows=100)
    assert plan_s.num_shards >= 2 and plan_t.num_shards >= 2

    # two epochs of identical (sid, batch) sequences for both runs
    def epochs(store, plan, bs, seed):
        loader = TSNLoader(store, batch_size=bs, num_segments=SEG,
                           mode="test", seed=seed)
        out = []
        for _ in range(2):
            out.extend(loader.shard_index_epoch(plan))
        return out

    seq_s = epochs(src, plan_s, 8, 1)
    seq_t = epochs(tgt, plan_t, 6, 2)
    sc = StepScalars(np.float32([0.5, 0.5, 0.5]), np.float32(0),
                     np.float32(0), np.float32(0.01), np.float32(0.1))

    # --- streaming run: double-buffered shard stream ---
    stream_s = ShardStream(src.features, plan_s)
    stream_t = ShardStream(tgt.features, plan_t)
    st1 = create_train_state(model, rng, 8, 6, tc)
    # restart stream per epoch like the Trainer does
    for (sid_s, b_s), (sid_t, b_t) in zip(seq_s, seq_t):
        st1, m1 = step(st1, stream_s.get(sid_s), b_s.abs_indices,
                       b_s.labels, b_s.mask, stream_t.get(sid_t),
                       b_t.abs_indices, b_t.labels, b_t.mask, sc, rng)

    # --- resident run: same batches, global indices, whole store ---
    store_s = jnp.asarray(np.ascontiguousarray(src.features))
    store_t = jnp.asarray(np.ascontiguousarray(tgt.features))
    st2 = create_train_state(model, rng, 8, 6, tc)
    for (sid_s, b_s), (sid_t, b_t) in zip(seq_s, seq_t):
        gi_s = b_s.abs_indices + np.int32(plan_s.row_lo[sid_s])
        gi_t = b_t.abs_indices + np.int32(plan_t.row_lo[sid_t])
        # masked rows read row 0 in both runs
        gi_s[b_s.mask == 0] = 0
        gi_t[b_t.mask == 0] = 0
        st2, m2 = step(st2, store_s, gi_s, b_s.labels, b_s.mask,
                       store_t, gi_t, b_t.labels, b_t.mask, sc, rng)

    for a, b in zip(jax.tree_util.tree_leaves(st1.params),
                    jax.tree_util.tree_leaves(st2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_streaming_end_to_end(tmp_path):
    """Full Trainer run in streaming mode (shards forced tiny), incl.
    streamed validation, on the 8-device mesh."""
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
                 use_mesh=True, device_store=True, store_budget_rows=80,
                 eval_freq=1, print_freq=1, show_freq=100)
    assert tr.streaming and tr._plan_s.num_shards >= 2
    best = tr.fit()
    assert best >= 0.0


def test_trainer_streaming_multi_step_end_to_end(tmp_path):
    """Streaming + K steps/dispatch: chunks break at shard switches."""
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
                 use_mesh=False, device_store=True, store_budget_rows=80,
                 steps_per_call=2, eval_freq=1, print_freq=4,
                 show_freq=100)
    assert tr.streaming and tr.multi_step is not None
    best = tr.fit()
    assert best >= 0.0


def test_shard_array_flow_store():
    """Flow stores are [rows, 2, D]; shard padding keeps trailing dims."""
    offsets = np.array([0, 3, 7], dtype=np.int64)
    feats = np.arange(7 * 2 * 3, dtype=np.float32).reshape(7, 2, 3)
    plan = ShardPlan(offsets, budget_rows=4)
    a1 = plan.shard_array(feats, 1)
    assert a1.shape == (4, 2, 3)
    np.testing.assert_array_equal(a1[:4], feats[3:7])


def test_trainer_streaming_device_sampler_bitwise_equals_host(tmp_path):
    """Streaming + --device_sampler: shard-local batches generated ON
    DEVICE must train bitwise-identically to the host shard stream in
    deterministic mode (VERDICT r2 next-#7).  Constant schedules so the
    two modes' scalar streams coincide exactly."""
    def make(tag, device_sampler):
        src, tgt, val = make_domain_pair(num_source=24, num_target=18,
                                         num_val=12, num_class=3,
                                         feature_dim=FDIM, shift=0.8)
        cfg = ModelConfig(num_class=3, baseline_type="video",
                          frame_aggregation="trn-m", train_segments=SEG,
                          val_segments=SEG, fc_dim=16, feature_dim=FDIM,
                          use_attn="TransAttn", dropout_i=0.1,
                          dropout_v=0.1)
        da = DAConfig(use_target="uSv", adv_DA="RevGrad")
        tc = TrainConfig(lr=0.05, epochs=2, batch_size=(8, 6, 8),
                         beta=(0.5, 0.5, 0.5))
        ls = TSNLoader(src, batch_size=8, num_segments=SEG, mode="test",
                       shuffle=False, seed=1)
        lt = TSNLoader(tgt, batch_size=6, num_segments=SEG, mode="test",
                       shuffle=False, seed=2)
        lv = TSNLoader(val, batch_size=8, num_segments=SEG, mode="test",
                       shuffle=False)
        tr = Trainer(cfg, da, tc, ls, lt, lv,
                     path_exp=str(tmp_path) + "/" + tag + "/",
                     use_mesh=True, device_store=True,
                     store_budget_rows=80, steps_per_call=2,
                     device_sampler=device_sampler,
                     eval_freq=1, print_freq=100, show_freq=100)
        best = tr.fit()
        return tr, best

    tr_d, best_d = make("dev", True)
    tr_h, best_h = make("host", False)
    assert tr_d.shard_sampled_step is not None
    assert tr_h.shard_sampled_step is None and tr_h.streaming
    assert best_d == best_h
    assert int(tr_d.state.step) == int(tr_h.state.step)
    for a, b in zip(jax.tree_util.tree_leaves(tr_d.state.params),
                    jax.tree_util.tree_leaves(tr_h.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
