"""bfloat16 compute path: trains to comparable accuracy as float32 on the
synthetic task (mechanical accuracy sanity; real-data A/B is ROADMAP #5)."""

import numpy as np

from ta3n_tpu.config import DAConfig, ModelConfig, TrainConfig
from ta3n_tpu.data import TSNLoader
from ta3n_tpu.data.synthetic import make_domain_pair
from ta3n_tpu.train.loop import Trainer


def run(compute_dtype, tmp_path):
    src, tgt, val = make_domain_pair(num_source=48, num_target=36,
                                     num_val=24, num_class=3,
                                     feature_dim=16, shift=0.5)
    cfg = ModelConfig(num_class=3, baseline_type="video",
                      frame_aggregation="trn-m", train_segments=3,
                      val_segments=3, fc_dim=16, feature_dim=16,
                      use_attn="TransAttn", dropout_i=0.1, dropout_v=0.1,
                      compute_dtype=compute_dtype)
    da = DAConfig(use_target="uSv", adv_DA="RevGrad")
    tc = TrainConfig(lr=0.2, epochs=4, batch_size=(12, 9, 12),
                     beta=(0.3, 0.3, 0.3))
    ls = TSNLoader(src, batch_size=12, num_segments=3, mode="test", seed=1)
    lt = TSNLoader(tgt, batch_size=9, num_segments=3, mode="test", seed=2)
    lv = TSNLoader(val, batch_size=12, num_segments=3, mode="test",
                   shuffle=False)
    tr = Trainer(cfg, da, tc, ls, lt, lv,
                 path_exp=str(tmp_path) + f"/{compute_dtype}/",
                 use_mesh=False, eval_freq=4, print_freq=100,
                 show_freq=100)
    return tr.fit()


def test_bf16_trains_comparably(tmp_path):
    acc32 = run("float32", tmp_path)
    acc16 = run("bfloat16", tmp_path)
    assert acc32 > 38.0          # above the 33% chance level
    assert acc16 > acc32 - 20.0  # bf16 within a reasonable band
