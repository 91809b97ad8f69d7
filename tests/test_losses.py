"""Loss-library parity tests against torch golden implementations.

Each test re-derives the reference formula (loss.py:8-120, main.py:204-206)
with torch on CPU and compares numerically.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from ta3n_tpu.losses import (CORAL, JAN, attentive_entropy,
                             cross_entropy_soft, dis_MCD, gaussian_kernel,
                             mmd_linear, mmd_rbf, weighted_cross_entropy)

RNG = np.random.default_rng(0)


def _t(x):
    return torch.from_numpy(np.asarray(x))


def torch_entropy(pred):
    sm = torch.softmax(pred, dim=1)
    lsm = torch.log_softmax(pred, dim=1)
    return torch.sum(-sm * lsm, 1)


def test_cross_entropy_soft_matches_torch():
    x = RNG.normal(size=(7, 5)).astype(np.float32)
    want = torch_entropy(_t(x)).mean().item()
    got = float(cross_entropy_soft(jnp.asarray(x)))
    assert got == pytest.approx(want, rel=1e-5)


def test_attentive_entropy_matches_torch():
    x = RNG.normal(size=(9, 4)).astype(np.float32)
    d = RNG.normal(size=(9, 2)).astype(np.float32)
    weights = 1 + torch_entropy(_t(d))
    want = torch.mean(weights * torch_entropy(_t(x))).item()
    got = float(attentive_entropy(jnp.asarray(x), jnp.asarray(d)))
    assert got == pytest.approx(want, rel=1e-5)


def test_dis_mcd_matches_torch():
    a = RNG.normal(size=(6, 5)).astype(np.float32)
    b = RNG.normal(size=(6, 5)).astype(np.float32)
    want = torch.mean(torch.abs(F.softmax(_t(a), dim=1)
                                - F.softmax(_t(b), dim=1))).item()
    got = float(dis_MCD(jnp.asarray(a), jnp.asarray(b)))
    assert got == pytest.approx(want, rel=1e-5)


def test_weighted_cross_entropy_matches_torch():
    logits = RNG.normal(size=(10, 4)).astype(np.float32)
    labels = RNG.integers(0, 4, size=10)
    w = RNG.uniform(0.5, 2.0, size=4).astype(np.float32)
    crit = torch.nn.CrossEntropyLoss(weight=_t(w))
    want = crit(_t(logits), _t(labels)).item()
    got = float(weighted_cross_entropy(jnp.asarray(logits),
                                       jnp.asarray(labels), jnp.asarray(w)))
    assert got == pytest.approx(want, rel=1e-5)


def test_weighted_cross_entropy_mask_equals_slicing():
    logits = RNG.normal(size=(8, 3)).astype(np.float32)
    labels = RNG.integers(0, 3, size=8)
    mask = np.array([1, 1, 1, 1, 1, 0, 0, 0], dtype=np.float32)
    got = float(weighted_cross_entropy(jnp.asarray(logits),
                                       jnp.asarray(labels), None,
                                       jnp.asarray(mask)))
    want = float(weighted_cross_entropy(jnp.asarray(logits[:5]),
                                        jnp.asarray(labels[:5])))
    assert got == pytest.approx(want, rel=1e-6)


def torch_gaussian_kernel(source, target, kernel_mul=2.0, kernel_num=5,
                          fix_sigma=None):
    # golden re-derivation of reference loss.py:46-59
    n = source.size(0) + target.size(0)
    total = torch.cat([source, target], dim=0)
    t0 = total.unsqueeze(0).expand(n, n, total.size(1))
    t1 = total.unsqueeze(1).expand(n, n, total.size(1))
    l2 = ((t0 - t1) ** 2).sum(2)
    bandwidth = fix_sigma if fix_sigma else torch.sum(l2.data) / (n * n - n)
    bandwidth = bandwidth / (kernel_mul ** (kernel_num // 2))
    return sum(torch.exp(-l2 / (bandwidth * (kernel_mul ** i)))
               for i in range(kernel_num))


@pytest.mark.parametrize("ver", [1, 2])
def test_mmd_rbf_matches_torch(ver):
    s = RNG.normal(size=(6, 8)).astype(np.float32)
    t = RNG.normal(size=(6, 8)).astype(np.float32)
    k = torch_gaussian_kernel(_t(s), _t(t))
    bs = 6
    if ver == 1:
        loss = torch.zeros(())
        for i in range(bs):
            s1, s2 = i, (i + 1) % bs
            t1, t2 = s1 + bs, s2 + bs
            loss = loss + k[s1, s2] + k[t1, t2] - k[s1, t2] - k[s2, t1]
        want = (loss.abs() / bs).item()
    else:
        want = torch.mean(k[:bs, :bs] + k[bs:, bs:]
                          - k[:bs, bs:] - k[bs:, :bs]).item()
    got = float(mmd_rbf(jnp.asarray(s), jnp.asarray(t), ver=ver))
    assert got == pytest.approx(want, rel=1e-4)


def test_jan_matches_torch():
    s1 = RNG.normal(size=(5, 6)).astype(np.float32)
    t1 = RNG.normal(size=(5, 6)).astype(np.float32)
    s2 = RNG.normal(size=(5, 3)).astype(np.float32)
    t2 = RNG.normal(size=(5, 3)).astype(np.float32)
    k = (torch_gaussian_kernel(_t(s1), _t(t1), 2.0, 2)
         * torch_gaussian_kernel(_t(s2), _t(t2), 2.0, 5))
    bs = 5
    want = torch.mean(k[:bs, :bs] + k[bs:, bs:]
                      - k[:bs, bs:] - k[bs:, :bs]).item()
    got = float(JAN([jnp.asarray(s1), jnp.asarray(s2)],
                    [jnp.asarray(t1), jnp.asarray(t2)]))
    assert got == pytest.approx(want, rel=1e-4)


def test_mmd_linear_matches_torch():
    s = RNG.normal(size=(4, 7)).astype(np.float32)
    t = RNG.normal(size=(4, 7)).astype(np.float32)
    delta = _t(s) - _t(t)
    want = torch.mean(delta @ delta.T).item()
    got = float(mmd_linear(jnp.asarray(s), jnp.asarray(t)))
    assert got == pytest.approx(want, rel=1e-5)


def test_loss_adaptive_weight_matches_torch():
    # reference main.py:804-807 (defined-but-unused utility)
    from ta3n_tpu.losses import loss_adaptive_weight
    pred = RNG.normal(size=(6, 4)).astype(np.float32)
    loss = np.float32(2.5)
    t = _t(pred)
    want = (loss / t.var().log() + t.std().log()).item()
    got = float(loss_adaptive_weight(jnp.asarray(loss), jnp.asarray(pred)))
    assert got == pytest.approx(want, rel=1e-5)


def test_rand_select_batch():
    import jax
    from ta3n_tpu.losses import rand_select_batch
    x = jnp.arange(20.0).reshape(10, 2)
    idx, rows = rand_select_batch(jax.random.PRNGKey(0), x, 4)
    assert idx.shape == (4,) and rows.shape == (4, 2)
    np.testing.assert_allclose(np.asarray(rows),
                               np.asarray(x)[np.asarray(idx)])
    assert len(set(np.asarray(idx).tolist())) == 4  # no repeats


def test_coral_reference_formula():
    # The reference never defines CORAL (NameError when selected,
    # main.py:492-495); golden-check our implementation against the
    # published Deep CORAL formula.
    s = RNG.normal(size=(10, 4)).astype(np.float64)
    t = RNG.normal(size=(12, 4)).astype(np.float64)

    def cov(x):
        xm = x - x.mean(axis=0)
        return xm.T @ xm / (x.shape[0] - 1)

    want = np.sum((cov(s) - cov(t)) ** 2) / (4 * 16)
    got = float(CORAL(jnp.asarray(s), jnp.asarray(t)))
    assert got == pytest.approx(want, rel=1e-5)


def test_mmd_rbf_degenerate_masks_finite():
    """<=1 valid row total in a masked slice used to zero the RBF
    bandwidth statistic -> l2/0 NaN on the kernel diagonal, which the
    downstream masked block means cannot weight out (NaN*0=NaN) -> NaN
    loss AND gradients (round-4 review finding; reached via
    _discrepancy_loss's 256-row chunking when a trailing chunk is fully
    padded).  Any positive bandwidth is equivalent for the surviving
    valid pairs (exp(0)=1), so gaussian_kernel floors it; the loss must
    stay finite and all-padded slices must contribute exactly 0."""
    import jax

    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    one = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    zero = jnp.zeros(4)

    assert np.isfinite(float(mmd_rbf(s, t, mask_source=one,
                                     mask_target=zero)))
    assert float(mmd_rbf(s, t, mask_source=zero, mask_target=zero)) == 0.0
    assert float(JAN([s, s], [t, t], mask_source=zero,
                     mask_target=zero)) == 0.0
    # identical valid rows also give a zero bandwidth statistic
    si = jnp.ones((4, 8))
    ones = jnp.ones(4)
    assert np.isfinite(float(mmd_rbf(si, si, mask_source=ones,
                                     mask_target=ones)))

    # gradients must be finite too (the Trainer's nan_guard aborts on NaN)
    g = jax.grad(lambda a: mmd_rbf(a, t, mask_source=one,
                                   mask_target=zero))(s)
    assert np.isfinite(np.asarray(g)).all()

    # masks come in pairs: one-sided masks are a caller bug
    with pytest.raises(ValueError, match="both or neither"):
        gaussian_kernel(s, t, mask_source=one)


def test_gaussian_kernel_near_duplicate_rows():
    """Cancellation regression (round 4): rows with large norms and tiny
    pairwise distances — the early-training regime under the reference's
    normal_(0.001) init, where all features are near-duplicates.  The
    |x|^2+|y|^2-2xy GEMM expansion loses ~1e-3 relative accuracy in f32
    here (and is garbage under the TPU's default-bf16 dot); the
    subtract-first formula (loss.py:49-52, used since round 4) is exact.
    Ground truth in float64."""
    base = RNG.normal(size=(1, 64)).astype(np.float32) * 3.0
    s = (base + 1e-3 * RNG.normal(size=(6, 64))).astype(np.float32)
    t = (base + 1e-3 * RNG.normal(size=(6, 64))).astype(np.float32)

    def f64_mmd(a, b):
        tot = np.concatenate([a, b]).astype(np.float64)
        l2 = ((tot[:, None, :] - tot[None, :, :]) ** 2).sum(-1)
        bw = l2.sum() / (len(tot) ** 2 - len(tot)) / (2.0 ** (5 // 2))
        k = sum(np.exp(-l2 / (bw * 2.0 ** i)) for i in range(5))
        n = len(a)
        return np.mean(k[:n, :n] + k[n:, n:] - k[:n, n:] - k[n:, :n])

    want = f64_mmd(s, t)
    got = float(mmd_rbf(jnp.asarray(s), jnp.asarray(t), ver=2))
    assert got == pytest.approx(want, rel=1e-5)


def test_jan_gradients_match_reference_autograd():
    """JAN gradient parity vs the ACTUAL reference's autograd
    (loss.py:85-120 through tests/ref_harness.py), in the
    near-duplicate-rows regime where gradients are huge (max ~230 here:
    tiny bandwidth -> steep kernels).  This pins that the chaotic step-3+
    divergence of the jan_general oracle corner (test_ref_oracle.py) is
    f32-rounding amplification, not a gradient bug."""
    import jax

    from tests import ref_harness
    ref_harness.patch_torch()
    ns = ref_harness.load_reference()

    rng = np.random.default_rng(7)
    base0 = rng.normal(size=(1, 6)).astype(np.float32)
    base1 = rng.normal(size=(1, 256)).astype(np.float32)
    a0 = (base0 + 1e-3 * rng.normal(size=(4, 6))).astype(np.float32)
    b0 = (base0 + 1e-3 * rng.normal(size=(4, 6))).astype(np.float32)
    a1 = (base1 + 1e-3 * rng.normal(size=(4, 256))).astype(np.float32)
    b1 = (base1 + 1e-3 * rng.normal(size=(4, 256))).astype(np.float32)

    ts = [torch.tensor(x, requires_grad=True) for x in (a0, a1, b0, b1)]
    loss = ns.loss.JAN([ts[0], ts[1]], [ts[2], ts[3]],
                       kernel_muls=[2.0] * 2, kernel_nums=[2, 5],
                       fix_sigma_list=[None] * 2, ver=2)
    loss.backward()

    def f(args):
        x0, x1, y0, y1 = args
        return JAN([x0, x1], [y0, y1], kernel_muls=(2.0, 2.0),
                   kernel_nums=(2, 5), fix_sigma_list=(None, None), ver=2)

    val, grads = jax.value_and_grad(f)(tuple(jnp.asarray(x)
                                             for x in (a0, a1, b0, b1)))
    assert float(val) == pytest.approx(float(loss), rel=1e-6)
    for t, g in zip(ts, grads):
        ref_g = t.grad.numpy()
        scale = np.abs(ref_g).max()
        assert scale > 1.0  # the steep regime this test exists for
        np.testing.assert_allclose(np.asarray(g), ref_g,
                                   atol=1e-6 * scale, rtol=1e-5)
