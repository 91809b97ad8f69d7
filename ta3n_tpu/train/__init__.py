from ta3n_tpu.train.optim import apply_updates_with_lr, make_optimizer
from ta3n_tpu.train.schedules import (alpha_schedule, dann_beta, dann_lr,
                                      effective_beta, loss_plateau_lr,
                                      progress, step_decay_lr)
from ta3n_tpu.train.step import (StepScalars, TrainState, create_train_state,
                                 make_eval_step, make_train_step,
                                 topk_correct)

__all__ = [
    "apply_updates_with_lr",
    "make_optimizer",
    "alpha_schedule",
    "dann_beta",
    "dann_lr",
    "effective_beta",
    "loss_plateau_lr",
    "progress",
    "step_decay_lr",
    "StepScalars",
    "TrainState",
    "create_train_state",
    "make_eval_step",
    "make_train_step",
    "topk_correct",
]
