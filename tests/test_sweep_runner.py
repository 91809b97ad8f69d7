"""run_sweep (train/sweep.py): divergence reporting and the
emergency-checkpoint path on preemption — the Trainer's failure
handling (SURVEY §5.3) applied to sweeps."""

import os
import signal

import jax
import numpy as np
import pytest

from ta3n_tpu.config import DAConfig, ModelConfig, TrainConfig
from ta3n_tpu.data import TSNLoader
from ta3n_tpu.data.synthetic import make_domain_pair
from ta3n_tpu.io_utils.checkpoint import load_checkpoint
from ta3n_tpu.train.sweep import run_sweep

SEG, FDIM = 3, 16


def _setup():
    src, tgt, val = make_domain_pair(num_source=16, num_target=16,
                                     num_val=8, num_class=3,
                                     feature_dim=FDIM, seed=0)
    cfg = ModelConfig(num_class=3, baseline_type="video",
                      frame_aggregation="avgpool", train_segments=SEG,
                      val_segments=SEG, fc_dim=16, feature_dim=FDIM,
                      dropout_i=0.0, dropout_v=0.0)
    da = DAConfig(use_target="uSv", adv_DA="RevGrad")
    tc = TrainConfig(lr=0.1, epochs=4, batch_size=(8, 8, 8))
    ls = TSNLoader(src, batch_size=8, num_segments=SEG, mode="test",
                   seed=1)
    lt = TSNLoader(tgt, batch_size=8, num_segments=SEG, mode="test",
                   seed=2)
    lv = TSNLoader(val, batch_size=8, num_segments=SEG, mode="test",
                   shuffle=False)
    return cfg, da, tc, ls, lt, lv


class _KillingLoader:
    """Proxy that SIGTERMs the process at the start of epoch N."""

    def __init__(self, inner, kill_on_call: int):
        self._inner = inner
        self._calls = 0
        self._kill_on = kill_on_call

    def index_epoch(self):
        self._calls += 1
        if self._calls == self._kill_on:
            os.kill(os.getpid(), signal.SIGTERM)
        return self._inner.index_epoch()

    def __len__(self):
        return len(self._inner)

    @property
    def store(self):
        return self._inner.store


def test_sweep_results_and_manifest(tmp_path):
    cfg, da, tc, ls, lt, lv = _setup()
    out = run_sweep(cfg, da, tc, ls, lt, lv,
                    [(0, 0.1, 0.0), (1, 0.05, 0.0)],
                    save_dir=str(tmp_path))
    assert len(out["results"]) == 2
    assert out["ensemble_top1"] is not None
    for row in out["results"]:
        assert "diverged" not in row
        assert np.isfinite(row["final_loss"])
        payload = load_checkpoint(row["checkpoint"])
        assert int(payload["epoch"]) == tc.epochs


def test_sweep_preemption_saves_emergency_checkpoints(tmp_path):
    cfg, da, tc, ls, lt, lv = _setup()
    killing = _KillingLoader(ls, kill_on_call=2)  # start of epoch 2
    with pytest.raises(KeyboardInterrupt, match="SIGTERM"):
        run_sweep(cfg, da, tc, killing, lt, lv,
                  [(0, 0.1, 0.0), (1, 0.05, 0.0)],
                  save_dir=str(tmp_path))
    payload = load_checkpoint(str(tmp_path / "member_01" / "checkpoint"))
    assert int(payload["epoch"]) == 1   # one epoch completed
    assert float(payload["prec1"]) == -1.0  # unvalidated emergency save


def test_sweep_eval_failure_still_saves_members(tmp_path):
    """A failure AFTER training (during validation) must not discard
    the trained sweep: emergency checkpoints carry the full epoch
    count."""
    cfg, da, tc, ls, lt, lv = _setup()
    killing_val = _KillingLoader(lv, kill_on_call=1)
    with pytest.raises(KeyboardInterrupt, match="SIGTERM"):
        run_sweep(cfg, da, tc, ls, lt, killing_val, [(0, 0.1, 0.0)],
                  save_dir=str(tmp_path))
    payload = load_checkpoint(str(tmp_path / "member_00" / "checkpoint"))
    assert int(payload["epoch"]) == tc.epochs  # training fully done
    assert float(payload["prec1"]) == -1.0     # but unvalidated


def test_sweep_eval_freq_tracks_best(tmp_path):
    """eval_freq > 0: per-member best_top1/best_epoch tracked across
    periodic validations; model_best holds the best epoch while
    checkpoint holds the final state."""
    cfg, da, tc, ls, lt, lv = _setup()
    out = run_sweep(cfg, da, tc, ls, lt, lv,
                    [(0, 0.1, 0.0), (1, 0.05, 0.0)],
                    save_dir=str(tmp_path), eval_freq=1)
    for row in out["results"]:
        assert row["best_top1"] >= row["top1"] - 1e-9
        assert 1 <= row["best_epoch"] <= tc.epochs
        best = load_checkpoint(row["best_checkpoint"])
        assert int(best["epoch"]) == row["best_epoch"]
        assert abs(float(best["best_prec1"]) - row["best_top1"]) < 1e-6
        final = load_checkpoint(row["checkpoint"])
        assert int(final["epoch"]) == tc.epochs


def test_sweep_frame_baseline_skips_ensemble_score(tmp_path):
    """frame baseline expands eval logits per frame; the deep-ensemble
    score must be skipped (None), not mis-aligned."""
    src, tgt, val = make_domain_pair(num_source=16, num_target=16,
                                     num_val=8, num_class=3,
                                     feature_dim=FDIM, seed=0)
    cfg = ModelConfig(num_class=3, baseline_type="frame",
                      frame_aggregation="avgpool", train_segments=SEG,
                      val_segments=SEG, fc_dim=16, feature_dim=FDIM,
                      dropout_i=0.0, dropout_v=0.0)
    da = DAConfig(use_target="uSv", adv_DA="RevGrad")
    tc = TrainConfig(lr=0.1, epochs=1, batch_size=(8, 8, 8))
    ls = TSNLoader(src, batch_size=8, num_segments=SEG, mode="test",
                   seed=1)
    lt = TSNLoader(tgt, batch_size=8, num_segments=SEG, mode="test",
                   seed=2)
    lv = TSNLoader(val, batch_size=8, num_segments=SEG, mode="test",
                   shuffle=False)
    out = run_sweep(cfg, da, tc, ls, lt, lv, [(0, 0.1, 0.0)])
    assert out["ensemble_top1"] is None
    assert out["results"][0]["top1"] >= 0.0


def test_sweep_resume_bitwise_matches_uninterrupted(tmp_path):
    """Preempt a sweep at epoch 2, resume=True from its emergency
    member checkpoints: final members match the uninterrupted sweep
    BITWISE (restacked states are exact; the shared loader streams are
    fast-forwarded past the completed epochs)."""
    members = [(0, 0.1, 0.0), (1, 0.05, 0.0)]

    def run(save_dir, kill=False, resume=False):
        cfg, da, tc, ls, lt, lv = _setup()  # epochs=4, fresh loaders
        if kill:
            ls = _KillingLoader(ls, kill_on_call=3)  # start of epoch 3
        return run_sweep(cfg, da, tc, ls, lt, lv, members,
                         save_dir=save_dir, resume=resume, eval_freq=1)

    out_a = run(str(tmp_path / "a"))

    with pytest.raises(KeyboardInterrupt, match="SIGTERM"):
        run(str(tmp_path / "b"), kill=True)  # emergency saves at epoch 2
    out_b = run(str(tmp_path / "b"), resume=True)

    assert [r["top1"] for r in out_a["results"]] == \
        [r["top1"] for r in out_b["results"]]
    # best tracking survives the preemption (seeded from the persisted
    # model_best metas, which may predate the resume)
    assert [(r["best_top1"], r["best_epoch"]) for r in out_a["results"]] \
        == [(r["best_top1"], r["best_epoch"]) for r in out_b["results"]]

    # resuming under a different configuration is rejected
    with pytest.raises(ValueError, match="different sweep config"):
        cfg, da, tc, ls, lt, lv = _setup()
        run_sweep(cfg, da, tc, ls, lt, lv, [(5, 0.2, 0.0), (6, 0.3, 0.0)],
                  save_dir=str(tmp_path / "b"), resume=True)
    from ta3n_tpu.io_utils.checkpoint import load_checkpoint
    for k in range(2):
        a = load_checkpoint(str(tmp_path / "a" / f"member_{k:02d}"
                                / "checkpoint"))
        b = load_checkpoint(str(tmp_path / "b" / f"member_{k:02d}"
                                / "checkpoint"))
        assert int(a["epoch"]) == int(b["epoch"]) == 4
        for la, lb in zip(jax.tree_util.tree_leaves(a["params"]),
                          jax.tree_util.tree_leaves(b["params"])):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_restack_rejects_mixed_epochs(tmp_path):
    """_restack_members refuses checkpoint sets whose epochs disagree
    (not one sweep's save set)."""
    from ta3n_tpu.io_utils import save_checkpoint
    from ta3n_tpu.train.ensemble import create_ensemble_state
    from ta3n_tpu.train.sweep import _restack_members
    from ta3n_tpu.config import ModelConfig, TrainConfig
    from ta3n_tpu.models import VideoModel
    from ta3n_tpu.train.step import create_train_state

    cfg = ModelConfig(num_class=3, baseline_type="video",
                      frame_aggregation="avgpool", train_segments=SEG,
                      val_segments=SEG, fc_dim=16, feature_dim=FDIM,
                      dropout_i=0.0, dropout_v=0.0)
    tc = TrainConfig(lr=0.1, epochs=2, batch_size=(8, 8, 8))
    import jax as _jax
    model = VideoModel(cfg)
    st = create_train_state(model, _jax.random.PRNGKey(0), 8, 8, tc)
    host = _jax.tree_util.tree_map(np.asarray, st)
    for k, ep in enumerate((1, 2)):
        save_checkpoint(str(tmp_path / f"member_{k:02d}") + "/", {
            "epoch": ep, "arch": "none", "params": host.params,
            "batch_stats": host.batch_stats, "opt_state": host.opt_state,
            "best_prec1": 0.0, "prec1": 0.0, "step": ep})
    with pytest.raises(ValueError, match="disagree on epoch"):
        _restack_members(str(tmp_path), 2, 2, st)
