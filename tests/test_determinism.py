"""Run-level determinism: two Trainers with the same seed must produce
bit-identical parameters (SURVEY §5.2 — the reference relies on global
seeds but its loader workers are unseeded; here the whole pipeline is
keyed)."""

import jax
import numpy as np
import pytest

from ta3n_tpu.config import DAConfig, ModelConfig, TrainConfig
from ta3n_tpu.data import TSNLoader
from ta3n_tpu.data.synthetic import make_domain_pair
from ta3n_tpu.train.loop import Trainer


def run_once(tmp_path, tag, device_store=False):
    src, tgt, val = make_domain_pair(num_source=24, num_target=18,
                                     num_val=12, num_class=3,
                                     feature_dim=16, shift=0.8)
    cfg = ModelConfig(num_class=3, baseline_type="video",
                      frame_aggregation="trn-m", train_segments=3,
                      val_segments=3, fc_dim=16, feature_dim=16,
                      use_attn="TransAttn", dropout_i=0.5, dropout_v=0.5)
    da = DAConfig(use_target="uSv", adv_DA="RevGrad")
    tc = TrainConfig(lr=0.05, epochs=1, batch_size=(8, 6, 8),
                     beta=(0.5, 0.5, 0.5))
    ls = TSNLoader(src, batch_size=8, num_segments=3, mode="test", seed=1)
    lt = TSNLoader(tgt, batch_size=6, num_segments=3, mode="test", seed=2)
    lv = TSNLoader(val, batch_size=8, num_segments=3, mode="test",
                   shuffle=False)
    tr = Trainer(cfg, da, tc, ls, lt, lv,
                 path_exp=str(tmp_path) + f"/{tag}/", use_mesh=False,
                 device_store=device_store, eval_freq=1, print_freq=100,
                 show_freq=100, seed=11)
    tr.fit()
    return tr.state.params


def test_same_seed_same_params(tmp_path):
    p1 = run_once(tmp_path, "a")
    p2 = run_once(tmp_path, "b")
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_device_store_run_matches_host_run(tmp_path):
    p1 = run_once(tmp_path, "host", device_store=False)
    p2 = run_once(tmp_path, "dev", device_store=True)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-7)


def test_none_aggregation_maps_to_avgpool():
    cfg = ModelConfig(num_class=3, frame_aggregation="none",
                      baseline_type="frame", feature_dim=16)
    assert cfg.frame_aggregation == "avgpool"
