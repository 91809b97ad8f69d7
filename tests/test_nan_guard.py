"""Divergence guard: a non-finite training loss aborts at the next
metric flush (zero extra device syncs); nan_guard=False restores the
reference's train-through-NaN behavior (main.py:569 averages whatever
the loss tensor holds)."""

import numpy as np
import pytest

from ta3n_tpu.config import DAConfig, ModelConfig, TrainConfig
from ta3n_tpu.data import TSNLoader
from ta3n_tpu.data.synthetic import make_domain_pair
from ta3n_tpu.train.loop import Trainer, TrainingDivergedError

SEG, FDIM = 3, 16


def _trainer(poison: bool, **kw):
    src, tgt, val = make_domain_pair(num_source=16, num_target=12,
                                     num_val=8, num_class=3,
                                     feature_dim=FDIM, seed=0)
    if poison:
        src.features[:] = np.nan  # every gathered source row is NaN
    cfg = ModelConfig(num_class=3, baseline_type="video",
                      frame_aggregation="trn-m", use_attn="TransAttn",
                      train_segments=SEG, val_segments=SEG, fc_dim=16,
                      feature_dim=FDIM, dropout_i=0.0, dropout_v=0.0)
    da = DAConfig(use_target="uSv", adv_DA="RevGrad")
    tc = TrainConfig(lr=0.1, epochs=1, batch_size=(8, 6, 8))
    ls = TSNLoader(src, batch_size=8, num_segments=SEG, mode="test",
                   seed=1)
    lt = TSNLoader(tgt, batch_size=6, num_segments=SEG, mode="test",
                   seed=2)
    lv = TSNLoader(val, batch_size=8, num_segments=SEG, mode="test",
                   shuffle=False)
    return Trainer(cfg, da, tc, ls, lt, lv, use_mesh=False,
                   print_freq=1, show_freq=10 ** 9, eval_freq=1, **kw)


def test_nan_aborts_by_default():
    with pytest.raises(TrainingDivergedError, match="non-finite"):
        _trainer(poison=True).fit()


def test_nan_guard_off_trains_through():
    best = _trainer(poison=True, nan_guard=False).fit()
    assert best >= 0.0  # reference behavior: run completes


def test_guard_inert_on_healthy_run():
    best = _trainer(poison=False).fit()
    assert best >= 0.0
