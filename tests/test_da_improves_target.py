"""End-to-end evidence the adversarial plumbing HELPS, not just matches
torch (VERDICT r1 #4): on the rotation-shift benchmark
(make_rotated_domain_pair — fixed task geometry, seeds vary data/init),
source-only training fails on the target domain and FULL TA3N (trn-m +
TransAttn + RevGrad YYY + attentive entropy, DANN beta ramp) recovers
most of the gap.  The in-environment stand-in for the reference's
published DA gains (BASELINE.md: UCF->HMDB +6.66, Kinetics->Gameplay
+10.3; /root/reference/main.py:437-562).

Measured on this exact configuration (8-device mesh, epochs 120,
seeds 0/1/2): source-only 72.7/73.4/93.8, full TA3N 77.3/99.2/100.0 —
gain positive on every seed (min +4.7, mean +12.2).  Adversarial
training is chaotic (single-device vs mesh runs diverge after hundreds
of steps), so the assertions are 3-seed aggregates with slack, not
single-run point values.  scripts/da_wins_experiment.py reproduces and
extends this sweep; scripts/dann_probe.py is the fast calibration
harness.
"""

import jax
import numpy as np

from ta3n_tpu.config import DAConfig, ModelConfig, TrainConfig
from ta3n_tpu.data import TSNLoader
from ta3n_tpu.data.synthetic import make_rotated_domain_pair
from ta3n_tpu.train.loop import Trainer

SEG, FDIM = 5, 16


def _run(use_da: bool, seed: int = 0, epochs: int = 120) -> float:
    src, tgt, val = make_rotated_domain_pair(
        num_source=128, num_target=128, num_val=128, num_class=4,
        feature_dim=FDIM, angle_deg=60.0, centroid_scale=4.0, seed=seed)
    cfg = ModelConfig(num_class=4, baseline_type="video",
                      frame_aggregation="trn-m", train_segments=SEG,
                      val_segments=SEG, fc_dim=16, feature_dim=FDIM,
                      use_attn="TransAttn", dropout_i=0.0, dropout_v=0.0)
    if use_da:
        da = DAConfig(use_target="uSv", adv_DA="RevGrad",
                      add_loss_DA="attentive_entropy",
                      place_adv=("Y", "Y", "Y"))
    else:
        da = DAConfig(use_target="none")
    tc = TrainConfig(lr=0.05, epochs=epochs, batch_size=(16, 16, 16),
                     beta=(-1.0, -1.0, -1.0),  # DANN ramp (main.py:351)
                     gamma=0.003)
    ls = TSNLoader(src, batch_size=16, num_segments=SEG, mode="test",
                   seed=seed + 1)
    lt = TSNLoader(tgt, batch_size=16, num_segments=SEG, mode="test",
                   seed=seed + 2)
    lv = TSNLoader(val, batch_size=16, num_segments=SEG, mode="test",
                   shuffle=False)
    tr = Trainer(cfg, da, tc, ls, lt, lv, use_mesh=True,
                 eval_freq=max(epochs // 5, 1), print_freq=10 ** 9,
                 show_freq=10 ** 9, seed=seed)
    return tr.fit()


def test_adversarial_da_beats_source_only():
    assert len(jax.devices()) == 8  # runs sharded over the full mesh
    seeds = (0, 1, 2)
    source_only = [_run(use_da=False, seed=s) for s in seeds]
    full_ta3n = [_run(use_da=True, seed=s) for s in seeds]
    results = list(zip(seeds, source_only, full_ta3n))
    # DA wins on EVERY seed (measured min gain +4.7)
    for s, so, da in results:
        assert da - so > 0.0, results
    # and by a stable aggregate margin (measured: 79.9 vs 92.2)
    assert float(np.mean(full_ta3n)) - float(np.mean(source_only)) >= 6.0, \
        results
    assert float(np.mean(full_ta3n)) >= 85.0, results
    assert float(np.mean(source_only)) <= 88.0, results


def _run_dan(seed: int = 0, epochs: int = 120, alpha: float = 0.2,
             use_da: bool = True) -> float:
    """The round-3 STABILIZED DAN configuration (BENCH_NOTES 'DAN
    stabilized'): MMD on the aggregated layer only, alpha=0.2, lr=0.03.
    alpha=1 (the reference default) collapses both domains' features to
    a degenerate point on this benchmark; 0.2 keeps CE dominant."""
    src, tgt, val = make_rotated_domain_pair(
        num_source=128, num_target=128, num_val=128, num_class=4,
        feature_dim=FDIM, angle_deg=60.0, centroid_scale=4.0, seed=seed)
    cfg = ModelConfig(num_class=4, baseline_type="video",
                      frame_aggregation="trn-m", train_segments=SEG,
                      val_segments=SEG, fc_dim=16, feature_dim=FDIM,
                      use_attn="TransAttn", dropout_i=0.0, dropout_v=0.0)
    da = (DAConfig(use_target="uSv", dis_DA="DAN",
                   place_dis=("N", "Y", "N"))
          if use_da else DAConfig(use_target="none"))
    tc = TrainConfig(lr=0.03, epochs=epochs, batch_size=(16, 16, 16),
                     alpha=alpha, beta=(0.75, 0.75, 0.5), gamma=0.003)
    ls = TSNLoader(src, batch_size=16, num_segments=SEG, mode="test",
                   seed=seed + 1)
    lt = TSNLoader(tgt, batch_size=16, num_segments=SEG, mode="test",
                   seed=seed + 2)
    lv = TSNLoader(val, batch_size=16, num_segments=SEG, mode="test",
                   shuffle=False)
    tr = Trainer(cfg, da, tc, ls, lt, lv, use_mesh=True,
                 eval_freq=max(epochs // 5, 1), print_freq=10 ** 9,
                 show_freq=10 ** 9, seed=seed)
    return tr.fit()


def test_stabilized_dan_beats_source_only():
    """Pins the stabilized DAN window (VERDICT r2 next-#4): measured
    seed-0 gain +24.2 (74.2 -> 98.4); asserted with slack."""
    source_only = _run_dan(seed=0, use_da=False)
    dan = _run_dan(seed=0, use_da=True)
    assert dan - source_only > 5.0, (source_only, dan)
    assert dan >= 90.0, (source_only, dan)
