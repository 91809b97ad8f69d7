from ta3n_tpu.losses.losses import (
    CORAL,
    JAN,
    attentive_entropy,
    cross_entropy_soft,
    dis_MCD,
    entropy_from_logits,
    gaussian_kernel,
    masked_mean,
    mmd_linear,
    mmd_rbf,
    weighted_cross_entropy,
)

__all__ = [
    "CORAL",
    "JAN",
    "attentive_entropy",
    "cross_entropy_soft",
    "dis_MCD",
    "entropy_from_logits",
    "gaussian_kernel",
    "masked_mean",
    "mmd_linear",
    "mmd_rbf",
    "weighted_cross_entropy",
]
