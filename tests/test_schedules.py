"""Schedule parity tests (main.py:231,350-352,789-802)."""

import math

import pytest

from ta3n_tpu.train import (alpha_schedule, dann_beta, dann_lr,
                            effective_beta, loss_plateau_lr, progress,
                            step_decay_lr)


def test_alpha_schedule():
    assert alpha_schedule(0.5, 3, 30) == 0.5  # fixed when >= 0
    want = 2 / (1 + math.exp(-10 / 30)) - 1
    assert alpha_schedule(-1, 10, 30) == pytest.approx(want)


def test_dann_beta():
    assert dann_beta(0.0) == pytest.approx(0.0)
    assert dann_beta(1.0) == pytest.approx(2 / (1 + math.exp(-10)) - 1)
    assert effective_beta([-1, 0.75, 0.5], 0.5) == pytest.approx(
        [dann_beta(0.5), 0.75, 0.5])


def test_progress():
    # p = (i + epoch*len) / (epochs*len) (main.py:333-334,350)
    assert progress(5, 2 * 10, 30 * 10) == pytest.approx(25 / 300)


def test_dann_lr():
    assert dann_lr(0.03, 0.0) == pytest.approx(0.03)
    assert dann_lr(0.03, 0.5) == pytest.approx(0.03 / 6 ** 0.75)


def test_step_decay():
    assert step_decay_lr(1.0, 10, 5, [10, 20]) == 1.0
    assert step_decay_lr(1.0, 10, 10, [10, 20]) == pytest.approx(0.1)
    assert step_decay_lr(1.0, 10, 25, [10, 20]) == pytest.approx(0.01)


def test_loss_plateau():
    assert loss_plateau_lr(1.0, 10, 2.0, 1.0) == pytest.approx(0.1)
    assert loss_plateau_lr(1.0, 10, 1.0, 2.0) == 1.0


def test_step_decay_resume_rederives_lr():
    """lr_adaptive='none' resume past a decay epoch must continue at the
    decayed lr (review finding: the old `epoch in lr_steps` division
    never fired for resumed runs)."""
    from ta3n_tpu.train.schedules import step_decay_lr
    assert step_decay_lr(0.1, 10.0, 9, (10, 20)) == 0.1
    assert abs(step_decay_lr(0.1, 10.0, 15, (10, 20)) - 0.01) < 1e-12
    assert abs(step_decay_lr(0.1, 10.0, 25, (10, 20)) - 0.001) < 1e-12
