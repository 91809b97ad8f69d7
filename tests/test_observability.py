"""Attention logging, tensorboard embeddings, pretrain_source, profiler,
and Flow-modality coverage."""

import os

import numpy as np
import pytest

from ta3n_tpu.config import DAConfig, ModelConfig, TrainConfig
from ta3n_tpu.data import FeatureStore, TSNLoader
from ta3n_tpu.data.synthetic import make_domain_pair, make_synthetic_store
from ta3n_tpu.train.loop import Trainer


def make_trainer(tmp_path, save_attention=-1, tensorboard=False,
                 pretrain=False, use_mesh=False):
    src, tgt, val = make_domain_pair(num_source=24, num_target=18,
                                     num_val=12, num_class=3,
                                     feature_dim=16, shift=0.8)
    cfg = ModelConfig(num_class=3, baseline_type="video",
                      frame_aggregation="trn-m", train_segments=3,
                      val_segments=3, fc_dim=16, feature_dim=16,
                      use_attn="TransAttn", dropout_i=0.1, dropout_v=0.1)
    da = DAConfig(use_target="uSv", adv_DA="RevGrad",
                  pretrain_source=pretrain)
    tc = TrainConfig(lr=0.05, epochs=2, batch_size=(8, 6, 8),
                     beta=(0.5, 0.5, 0.5))
    ls = TSNLoader(src, batch_size=8, num_segments=3, mode="test", seed=1)
    lt = TSNLoader(tgt, batch_size=6, num_segments=3, mode="test", seed=2)
    lv = TSNLoader(val, batch_size=8, num_segments=3, mode="test",
                   shuffle=False)
    return Trainer(cfg, da, tc, ls, lt, lv, path_exp=str(tmp_path) + "/",
                   save_model=False, save_attention=save_attention,
                   use_mesh=use_mesh,
                   tensorboard_dir=(str(tmp_path) + "/tb"
                                    if tensorboard else None),
                   eval_freq=1, print_freq=1, show_freq=100)


def test_attention_logging(tmp_path):
    tr = make_trainer(tmp_path, save_attention=1)
    tr.fit()
    src_log = os.path.join(str(tmp_path), "attn_source_1.log")
    tgt_log = os.path.join(str(tmp_path), "attn_target_1.log")
    assert os.path.isfile(src_log) and os.path.isfile(tgt_log)
    rows = np.loadtxt(src_log)
    assert rows.shape == (2, 2)  # 2 epochs x (segments-1) relation scales
    assert np.isfinite(rows).all()


def test_tensorboard_embeddings(tmp_path):
    tr = make_trainer(tmp_path, tensorboard=True)
    if not tr.tb.active:
        pytest.skip("tensorboardX not available")
    tr.fit()
    tb_dir = str(tmp_path) + "/tb"
    files = os.listdir(tb_dir)
    assert any("tfevents" in f for f in files)


def test_profiler_trace_written(tmp_path):
    import os
    tr = make_trainer(tmp_path)
    tr.profile_dir = str(tmp_path / "prof")
    tr.train_epoch(1)
    found = [f for _, _, files in os.walk(tr.profile_dir) for f in files]
    assert any("xplane" in f or "trace" in f for f in found), found


def test_profiler_trace_written_multi_step_path(tmp_path):
    """--profile_dir must also capture a trace in the K-step production
    path (review finding: it was silently ignored there)."""
    from ta3n_tpu.data.synthetic import make_domain_pair as mdp
    src, tgt, val = mdp(num_source=24, num_target=18, num_val=12,
                        num_class=3, feature_dim=16, shift=0.8)
    cfg = ModelConfig(num_class=3, baseline_type="video",
                      frame_aggregation="trn-m", train_segments=3,
                      val_segments=3, fc_dim=16, feature_dim=16,
                      use_attn="TransAttn", dropout_i=0.1, dropout_v=0.1)
    da = DAConfig(use_target="uSv", adv_DA="RevGrad")
    tc = TrainConfig(lr=0.05, epochs=1, batch_size=(8, 6, 8),
                     beta=(0.5, 0.5, 0.5))
    ls = TSNLoader(src, batch_size=8, num_segments=3, mode="test", seed=1)
    lt = TSNLoader(tgt, batch_size=6, num_segments=3, mode="test", seed=2)
    lv = TSNLoader(val, batch_size=8, num_segments=3, mode="test",
                   shuffle=False)
    tr = Trainer(cfg, da, tc, ls, lt, lv, path_exp=str(tmp_path) + "/",
                 use_mesh=False, device_store=True, steps_per_call=1,
                 profile_dir=str(tmp_path / "prof_multi"),
                 eval_freq=100, print_freq=100, show_freq=100)
    # force the multi path with a tiny K so two chunks exist
    from ta3n_tpu.train.step import make_multi_train_step
    tr.steps_per_call = 1
    tr.multi_step = make_multi_train_step(tr.model, da, tc)
    tr.steps_per_call = 1  # chunks of 1 -> >=2 chunks per epoch
    tr.train_epoch(1)
    found = [f for _, _, files in os.walk(tr.profile_dir)
             for f in files]
    assert any("xplane" in f or "trace" in f for f in found), found


def test_pretrain_source_step(tmp_path):
    tr = make_trainer(tmp_path, pretrain=True)
    best = tr.fit()
    assert best >= 0.0


def test_flow_modality_end_to_end():
    """Flow stores have 2 streams per frame: the model consumes
    S * streams rows per video (the reference's forward breaks on this —
    we define segments as the total temporal rows)."""
    rng = np.random.default_rng(0)
    feats, paths, labels = [], [], []
    for i in range(10):
        n = int(rng.integers(6, 15))
        feats.append(rng.normal(size=(n, 2, 16)).astype(np.float32))
        paths.append(f"v{i}")
        labels.append(int(rng.integers(0, 2)))
    store = FeatureStore.from_arrays(feats, paths, labels)
    assert store.num_streams == 2
    loader = TSNLoader(store, batch_size=4, num_segments=3, new_length=1,
                       mode="test")
    b = next(iter(loader.epoch()))
    assert b.features.shape == (4, 6, 16)  # 3 segments x 2 streams

    import jax
    import jax.numpy as jnp
    from ta3n_tpu.models import VideoModel
    cfg = ModelConfig(num_class=2, baseline_type="video",
                      frame_aggregation="avgpool", use_attn="none",
                      train_segments=6, val_segments=6, fc_dim=16,
                      feature_dim=16, modality="Flow", new_length=1)
    m = VideoModel(cfg)
    k = jax.random.PRNGKey(0)
    var = m.init({"params": k, "dropout": k}, b.features, b.features,
                 jnp.zeros(3), jnp.asarray(0.0), True, False)
    s, t = m.apply(var, b.features, b.features, jnp.zeros(3),
                   jnp.asarray(0.0), False, False)
    assert s.out.shape == (4, 2)
