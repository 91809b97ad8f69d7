"""Loss library: entropy, adversarial-support, MMD-family, CORAL.

Pure jnp functions with optional row masks.  Masks replace the reference's
"pad with dummy rows, slice them off before the loss" dance
(`main.py:358-372,825-832`): every batch has a static shape and padded rows
simply carry zero weight, which keeps one XLA program for every batch size.

Behavioural parity with the reference loss surface (`loss.py:8-120`) plus
the torch criterion semantics used by the train loop (`main.py:204-206`).
CORAL is *implemented* here even though the reference crashes when it is
selected (flag exists at `opts.py:44`, call site `main.py:492-495`, but no
function is defined — see SURVEY §2.10); we fix it rather than replicate
the NameError.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

__all__ = [
    "masked_mean",
    "entropy_from_logits",
    "weighted_cross_entropy",
    "cross_entropy_soft",
    "attentive_entropy",
    "dis_MCD",
    "mmd_linear",
    "gaussian_kernel",
    "mmd_rbf",
    "JAN",
    "CORAL",
]


def masked_mean(x: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    """Mean of ``x`` over rows where ``mask`` is 1 (mean of all if None)."""
    if mask is None:
        return jnp.mean(x)
    mask = mask.astype(x.dtype)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(x * mask) / denom


def entropy_from_logits(logits: jax.Array) -> jax.Array:
    """Per-row Shannon entropy of softmax(logits): sum(-p * log p, axis=-1).

    Matches `torch.sum(-softmax(x) * logsoftmax(x), 1)` (reference
    loss.py:8-12, models.py:351-357).
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(logp)
    return jnp.sum(-p * logp, axis=-1)


def weighted_cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    class_weights: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Class-weighted CE with torch `nn.CrossEntropyLoss(weight=w)` semantics.

    torch reduces with the *weighted* mean: sum_i w[y_i]*nll_i / sum_i w[y_i]
    (criterion built at reference main.py:204-206).  Padded rows are excluded
    via ``mask`` (replaces removeDummy, main.py:825-832).
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    # one-hot select instead of take_along_axis / weight gathers: per-row
    # gathers compile to slow kCustom fusions on TPU (profiled ~20 us/step
    # at [1010,2]); an [N,C] compare+select runs on the VPU in ~1 us.
    onehot = labels[:, None] == jnp.arange(logits.shape[-1])[None, :]
    nll = -jnp.sum(jnp.where(onehot, logp, 0.0), axis=-1)
    if class_weights is not None:
        w = jnp.sum(jnp.where(onehot, class_weights[None, :].astype(nll.dtype),
                              0.0), axis=-1)
    else:
        w = jnp.ones_like(nll)
    if mask is not None:
        w = w * mask.astype(w.dtype)
    denom = jnp.maximum(jnp.sum(w), 1e-12)
    return jnp.sum(w * nll) / denom


def cross_entropy_soft(pred: jax.Array, mask: Optional[jax.Array] = None
                       ) -> jax.Array:
    """Mean self-entropy of softmax(pred) — target-entropy minimization.

    Parity: reference loss.py:8-12 (used at main.py:542-545).
    """
    return masked_mean(entropy_from_logits(pred), mask)


def attentive_entropy(pred: jax.Array, pred_domain: jax.Array,
                      mask: Optional[jax.Array] = None) -> jax.Array:
    """Entropy of class logits weighted by (1 + domain-prediction entropy).

    Parity: reference loss.py:15-25 (used at main.py:558-562 with the
    *video-level* domain logits `pred_domain_all[1]`).
    """
    weights = 1.0 + entropy_from_logits(pred_domain)
    return masked_mean(weights * entropy_from_logits(pred), mask)


def dis_MCD(out1: jax.Array, out2: jax.Array,
            mask: Optional[jax.Array] = None) -> jax.Array:
    """Mean |softmax(out1) - softmax(out2)| (MCD discrepancy, loss.py:29-30)."""
    d = jnp.abs(jax.nn.softmax(out1, axis=-1) - jax.nn.softmax(out2, axis=-1))
    if mask is None:
        return jnp.mean(d)
    m = mask.astype(d.dtype)[:, None]
    denom = jnp.maximum(jnp.sum(m) * d.shape[-1], 1.0)
    return jnp.sum(d * m) / denom


def _as_2d(x: jax.Array) -> jax.Array:
    """Flatten trailing dims: the MMD family is defined on [n, d] rows.

    The reference feeds only 2-D video-level features in its published
    configs; for >2-D inputs it silently reduces over a middle axis
    (loss.py:51 with 3-D input) — we flatten instead, which is the standard
    definition.  Documented divergence (SURVEY §2.10 spirit).
    """
    return x.reshape(x.shape[0], -1)


def mmd_linear(f_of_X: jax.Array, f_of_Y: jax.Array) -> jax.Array:
    """Linear-kernel MMD (reference loss.py:33-44; unused by the train loop)."""
    delta = _as_2d(f_of_X) - _as_2d(f_of_Y)
    return jnp.mean(delta @ delta.T)


def gaussian_kernel(source: jax.Array, target: jax.Array,
                    kernel_mul: float = 2.0, kernel_num: int = 5,
                    fix_sigma: Optional[float] = None,
                    mask_source: Optional[jax.Array] = None,
                    mask_target: Optional[jax.Array] = None) -> jax.Array:
    """Multi-bandwidth RBF kernel matrix over the stacked [src; tgt] rows.

    Median-heuristic-ish bandwidth: mean pairwise L2^2 over off-diagonal
    count, divided/multiplied by powers of ``kernel_mul``
    (reference loss.py:46-59, including the 'guassian' behaviour).
    With row masks the bandwidth statistic is computed over valid-row
    pairs only; masked rows' kernel VALUES are still produced (static
    shapes) and must be weighted out by the caller.  Masks must be
    given for both streams or neither.
    """
    if (mask_source is None) != (mask_target is None):
        raise ValueError("mask_source and mask_target must be given "
                         "together (both or neither)")
    source = _as_2d(source)
    target = _as_2d(target)
    n = source.shape[0] + target.shape[0]
    total = jnp.concatenate([source, target], axis=0)
    # L2^2 by direct difference (subtract-then-square, loss.py:49-52) —
    # NOT the GEMM expansion |x|^2+|y|^2-2xy.  The expansion cancels
    # catastrophically whenever pairwise distances are small relative to
    # row norms — exactly the early-training regime (normal_(0.001)
    # init makes all rows near-duplicates): ~1e-3 relative kernel error
    # in f32, and garbage under the TPU's default-bf16 dot.  The diff
    # tensor is [n, n, d] but XLA fuses broadcast-sub-square-reduce
    # without materializing it; n here is <= 2*256 sub-batch rows.
    # MEASURED on TPU (scripts/profile_dan_step.py, BENCH_NOTES "DAN
    # step cost"): compiled temp memory 13.9 MB at the published DAN
    # config (CHEAPER than the flagship adversarial step) and 71.4 MB
    # at the adversarial worst case (512-row chunks x 2560-d flat
    # frame features, [512,512,2560] = 2.6 GB if materialized) —
    # fusion confirmed, the trade is O(n^2 d) vector FLOPs (5.6 ms/step
    # at that worst case), not memory.
    l2 = jnp.sum(jnp.square(total[:, None, :] - total[None, :, :]), axis=-1)
    if fix_sigma is not None:
        bandwidth = jnp.asarray(fix_sigma, dtype=total.dtype)
    elif mask_source is not None:
        m = jnp.concatenate([mask_source, mask_target]).astype(total.dtype)
        w = m[:, None] * m[None, :]
        n_eff = jnp.sum(m)
        bandwidth = (jax.lax.stop_gradient(jnp.sum(l2 * w))
                     / jnp.maximum(n_eff * n_eff - n_eff, 1.0))
        # <=1 valid row total (a fully-padded sub-batch chunk) gives a
        # zero bandwidth statistic -> l2/0 NaN on the diagonal, which a
        # downstream masked mean cannot weight out (NaN*0=NaN).  Any
        # positive bandwidth is equivalent there (the valid-pair kernel
        # values are exp(0)=1 regardless), so floor it to 1.
        bandwidth = jnp.where(bandwidth > 0.0,
                              bandwidth, jnp.ones_like(bandwidth))
    else:
        bandwidth = jax.lax.stop_gradient(jnp.sum(l2)) / (n * n - n)
    bandwidth = bandwidth / (kernel_mul ** (kernel_num // 2))
    vals = [jnp.exp(-l2 / (bandwidth * (kernel_mul ** i)))
            for i in range(kernel_num)]
    return sum(vals)


def _mmd_from_kernels(kernels: jax.Array, batch_size: int, ver: int,
                      mask_source: Optional[jax.Array] = None,
                      mask_target: Optional[jax.Array] = None) -> jax.Array:
    if ver == 1:
        if mask_source is not None:
            raise ValueError("row masks are only supported for ver=2 "
                             "(the train loop's variant, main.py:496-500)")
        idx = jnp.arange(batch_size)
        s1, s2 = idx, (idx + 1) % batch_size
        t1, t2 = s1 + batch_size, s2 + batch_size
        loss = (jnp.sum(kernels[s1, s2]) + jnp.sum(kernels[t1, t2])
                - jnp.sum(kernels[s1, t2]) - jnp.sum(kernels[s2, t1]))
        return jnp.abs(loss) / batch_size
    if ver == 2:
        xx = kernels[:batch_size, :batch_size]
        yy = kernels[batch_size:, batch_size:]
        xy = kernels[:batch_size, batch_size:]
        yx = kernels[batch_size:, :batch_size]
        if mask_source is None:
            return jnp.mean(xx + yy - xy - yx)
        # masked block means: the static-shape analogue of the
        # reference stripping dummy rows before the loss (removeDummy,
        # main.py:420-422 -> loss at main.py:496-500); with all-ones
        # masks this equals the unmasked mean
        ms = mask_source.astype(kernels.dtype)
        mt = mask_target.astype(kernels.dtype)

        def bmean(block, wr, wc):
            w = wr[:, None] * wc[None, :]
            return jnp.sum(block * w) / jnp.maximum(jnp.sum(w), 1.0)

        return (bmean(xx, ms, ms) + bmean(yy, mt, mt)
                - bmean(xy, ms, mt) - bmean(yx, mt, ms))
    raise ValueError("ver == 1 or 2")


def mmd_rbf(source: jax.Array, target: jax.Array, kernel_mul: float = 2.0,
            kernel_num: int = 5, fix_sigma: Optional[float] = None,
            ver: int = 2, mask_source: Optional[jax.Array] = None,
            mask_target: Optional[jax.Array] = None) -> jax.Array:
    """RBF MMD (reference loss.py:61-83; DAN call site main.py:496-500).

    Optional row masks exclude padded rows from both the bandwidth
    statistic and the block means (ver=2 only)."""
    batch_size = source.shape[0]
    kernels = gaussian_kernel(source, target, kernel_mul, kernel_num,
                              fix_sigma, mask_source, mask_target)
    return _mmd_from_kernels(kernels, batch_size, ver,
                             mask_source, mask_target)


def JAN(source_list: Sequence[jax.Array], target_list: Sequence[jax.Array],
        kernel_muls: Sequence[float] = (2.0, 2.0),
        kernel_nums: Sequence[int] = (2, 5),
        fix_sigma_list: Sequence[Optional[float]] = (None, None),
        ver: int = 2, mask_source: Optional[jax.Array] = None,
        mask_target: Optional[jax.Array] = None) -> jax.Array:
    """Joint MMD: elementwise product of per-layer kernels (loss.py:85-120).

    Optional row masks as in mmd_rbf."""
    batch_size = source_list[0].shape[0]
    joint = None
    for src, tgt, mul, num, sigma in zip(source_list, target_list,
                                         kernel_muls, kernel_nums,
                                         fix_sigma_list):
        k = gaussian_kernel(src, tgt, mul, num, sigma,
                            mask_source, mask_target)
        joint = k if joint is None else joint * k
    return _mmd_from_kernels(joint, batch_size, ver,
                             mask_source, mask_target)


def loss_adaptive_weight(loss: jax.Array, pred: jax.Array) -> jax.Array:
    """Uncertainty-style adaptive loss weighting:
    loss / log(var(pred)) + log(std(pred)).

    Parity: reference `loss_adaptive_weight` (main.py:804-807) — defined
    but never called by the reference train loop; provided for API
    completeness.  torch .var()/.std() are unbiased over all elements.
    """
    flat = pred.reshape(-1)
    n = flat.shape[0]
    var = jnp.var(flat) * n / jnp.maximum(n - 1, 1)
    return loss / jnp.log(var) + jnp.log(jnp.sqrt(var))


def rand_select_batch(key: jax.Array, x: jax.Array, num: int):
    """Random row subset: (indices, rows).

    Parity: reference `randSelectBatch` (utils/utils.py:8-11) — unused by
    the reference loop; provided for API completeness, keyed instead of
    relying on global RNG state.
    """
    idx = jax.random.permutation(key, x.shape[0])[:num]
    return idx, x[idx]


def CORAL(source: jax.Array, target: jax.Array,
          mask_source: Optional[jax.Array] = None,
          mask_target: Optional[jax.Array] = None) -> jax.Array:
    """Deep CORAL: squared Frobenius distance of feature covariances.

    The reference *advertises* CORAL (opts.py:44) and calls it
    (main.py:492-495) but never defines it — selecting it raises NameError
    (SURVEY §2.10).  We implement the standard Deep CORAL loss
    (Sun & Saenko 2016): ||C_s - C_t||_F^2 / (4 d^2).

    With row masks, mean/covariance run over the valid rows only (the
    static-shape analogue of the reference's removeDummy row-stripping
    before the loss, main.py:420-422).
    """
    source = _as_2d(source)
    target = _as_2d(target)
    d = source.shape[1]

    def cov(x, m):
        if m is None:
            n = jnp.asarray(x.shape[0], x.dtype)
            xm = x - jnp.mean(x, axis=0, keepdims=True)
        else:
            w = m.astype(x.dtype)[:, None]
            n = jnp.maximum(jnp.sum(w), 1.0)
            xm = (x - jnp.sum(x * w, axis=0, keepdims=True) / n) * w
        return (xm.T @ xm) / jnp.maximum(n - 1, 1)

    diff = cov(source, mask_source) - cov(target, mask_target)
    return jnp.sum(diff * diff) / (4.0 * d * d)
