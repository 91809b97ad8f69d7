"""All five BASELINE.json driver configs train end-to-end on synthetic
features shaped like their real datasets."""

import numpy as np
import pytest

from ta3n_tpu.config import DAConfig, ModelConfig, TrainConfig
from ta3n_tpu.data import TSNLoader
from ta3n_tpu.data.synthetic import make_domain_pair
from ta3n_tpu.train.loop import Trainer

# (name, model kwargs, da kwargs, feature_dim)
CONFIGS = [
    # 1. TemPooling source-only (avgpool, no DA)
    ("tempooling_source_only",
     dict(frame_aggregation="avgpool", use_attn="none"),
     dict(use_target="none"), 32),
    # 2. TemPooling + RevGrad frame-level adversarial DA
    ("tempooling_revgrad",
     dict(frame_aggregation="avgpool", use_attn="none"),
     dict(use_target="uSv", adv_DA="RevGrad", place_adv=("N", "N", "Y")),
     32),
    # 3. TemRelation + relation/video adversarial DA
    ("temrelation_adv",
     dict(frame_aggregation="trn-m", use_attn="none"),
     dict(use_target="uSv", adv_DA="RevGrad", place_adv=("Y", "Y", "N")),
     32),
    # 4. full TA3N (published recipe structure)
    ("full_ta3n",
     dict(frame_aggregation="trn-m", use_attn="TransAttn"),
     dict(use_target="uSv", adv_DA="RevGrad",
          add_loss_DA="attentive_entropy", place_adv=("Y", "Y", "Y")),
     32),
    # 5. Kinetics->Gameplay: C3D features (4096-d)
    ("kinetics_gameplay_c3d",
     dict(frame_aggregation="trn-m", use_attn="TransAttn",
          base_model="c3d"),
     dict(use_target="uSv", adv_DA="RevGrad",
          add_loss_DA="attentive_entropy", place_adv=("Y", "Y", "Y")),
     None),  # feature_dim from the c3d table (4096)
]


@pytest.mark.parametrize("name,mkw,dkw,fdim", CONFIGS,
                         ids=[c[0] for c in CONFIGS])
def test_baseline_config_trains(tmp_path, name, mkw, dkw, fdim):
    feature_dim = fdim if fdim is not None else 4096
    src, tgt, val = make_domain_pair(num_source=16, num_target=12,
                                     num_val=8, num_class=3,
                                     feature_dim=feature_dim, shift=0.8)
    cfg = ModelConfig(num_class=3, baseline_type="video",
                      train_segments=3, val_segments=3, fc_dim=16,
                      feature_dim=fdim, dropout_i=0.2, dropout_v=0.2,
                      **mkw)
    assert cfg.input_feature_dim == feature_dim
    da = DAConfig(**dkw)
    tc = TrainConfig(lr=0.05, epochs=1, batch_size=(8, 6, 8),
                     beta=(0.5, 0.5, 0.5), gamma=0.01)
    ls = TSNLoader(src, batch_size=8, num_segments=3, mode="test", seed=1)
    lt = TSNLoader(tgt, batch_size=6, num_segments=3, mode="test", seed=2)
    lv = TSNLoader(val, batch_size=8, num_segments=3, mode="test",
                   shuffle=False)
    tr = Trainer(cfg, da, tc, ls, lt, lv, path_exp=str(tmp_path) + "/",
                 use_mesh=False, eval_freq=1, print_freq=100,
                 show_freq=100)
    best = tr.fit()
    assert np.isfinite(best) and best >= 0.0
