"""int8 quantized inference (`ModelConfig.quantize='int8'`).

W8A8 dynamic quantization: MXU-sized dense GEMMs (both dims >= 128) run
as int8 x int8 -> int32 dots with per-output-channel weight scales and
per-row activation scales; logits heads stay f32.  Inference-only — the
train-step builders reject it (round() has zero gradient).

The reference has no quantized inference at all; this is a
beating-not-matching capability (serving HBM/compute via the MXU's
native s8 mode).
"""

import dataclasses
import json
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ta3n_tpu.config import ModelConfig, TrainConfig
from ta3n_tpu.models import VideoModel
from ta3n_tpu.models.layers import int8_batched_matmul, int8_matmul
from ta3n_tpu.serve import Predictor

# MXU-sized dims so the quantized path actually activates
CFG = ModelConfig(num_class=6, baseline_type="video",
                  frame_aggregation="trn-m", train_segments=3,
                  val_segments=3, feature_dim=256, fc_dim=256,
                  dropout_i=0.0, dropout_v=0.0, use_attn="TransAttn")
QCFG = dataclasses.replace(CFG, quantize="int8")


@pytest.fixture(scope="module")
def params():
    m = VideoModel(CFG)
    x = jnp.zeros((4, 3, 256), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, x, jnp.zeros(3),
               jnp.asarray(0.0), False, False)
    # the reference init is normal(0.001); scale matrices up to trained-
    # network magnitudes so logits are meaningfully separated
    return jax.tree_util.tree_map(
        lambda a: a * 50.0 if a.ndim >= 2 else a, v["params"])


def _probs(cfg, params, x):
    m = VideoModel(cfg)
    s, _ = m.apply({"params": params}, x, x, jnp.zeros(3),
                   jnp.asarray(0.0), False, False)
    return np.asarray(jax.nn.softmax(s.out, axis=-1))


def test_int8_matmul_exact_on_grid():
    """When weights/activations already sit exactly on their int8 grids,
    the quantized matmul reproduces the f32 product exactly (validates
    the scale/zero-point/rescale math end-to-end).  The activation grid
    is ASYMMETRIC: 256 levels spanning [row min, row max], so the exact
    grid is lo + k*(hi-lo)/255 — both a non-negative (post-ReLU-like)
    and a signed row range are pinned."""
    rng = np.random.default_rng(0)
    sw, sx = 0.5, 0.25
    w = (rng.integers(-127, 128, size=(128, 128)) * sw).astype(np.float32)
    w[0, :] = 127 * sw  # pin each column's max-abs to exactly 127*sw
    # rows 0-1: unsigned grid k*sx, k in [0,255] with both ends pinned
    xu = (rng.integers(0, 256, size=(2, 128)) * sx).astype(np.float32)
    xu[:, 0], xu[:, 1] = 0.0, 255 * sx
    # rows 2-3: signed grid k*sx, k in [-128,127] with both ends pinned
    xs = (rng.integers(-128, 128, size=(2, 128)) * sx).astype(np.float32)
    xs[:, 0], xs[:, 1] = -128 * sx, 127 * sx
    x = np.concatenate([xu, xs])
    got = np.asarray(int8_matmul(jnp.asarray(x), jnp.asarray(w)))
    want = x.astype(np.float64) @ w.astype(np.float64)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-4)


def test_int8_asymmetric_beats_symmetric_on_relu_inputs():
    """On non-negative (post-ReLU) activations — what the model's
    quantized GEMMs actually see — the asymmetric activation grid uses
    all 256 levels over [0, max] where a symmetric grid wastes half;
    assert the implementation's error is well below the symmetric
    bound's floor (ADVICE r3 #3)."""
    rng = np.random.default_rng(3)
    x = np.maximum(rng.normal(size=(64, 256)), 0.0).astype(np.float64)

    # the implementation's asymmetric activation reconstruction
    hi = x.max(axis=1, keepdims=True)
    lo = x.min(axis=1, keepdims=True)
    s = np.where(hi > lo, (hi - lo) / 255.0, 1.0)
    zp = np.round(lo / s) + 128.0
    xq_asym = (np.clip(np.round(x / s) - zp, -128, 127) + zp) * s

    # symmetric 127-level reference quantization of the same rows
    sx = np.abs(x).max(axis=1, keepdims=True) / 127.0
    xq_sym = np.clip(np.round(x / sx), -127, 127) * sx

    err_asym = np.abs(xq_asym - x).mean()
    err_sym = np.abs(xq_sym - x).mean()
    assert err_asym < 0.6 * err_sym, (err_asym, err_sym)

    # and the full matmul (incl. shared weight-quant error) must not be
    # worse than a symmetric-activation W8A8 product
    xf = x.astype(np.float32)
    w = rng.normal(scale=0.05, size=(256, 256)).astype(np.float32)
    got = np.asarray(int8_matmul(jnp.asarray(xf), jnp.asarray(w)))
    want = x @ w.astype(np.float64)
    sw_ = np.abs(w).max(axis=0) / 127.0
    wq = np.clip(np.round(w / sw_), -127, 127) * sw_
    sym = xq_sym @ wq.astype(np.float64)
    assert np.abs(got - want).mean() < np.abs(sym - want).mean()


def test_int8_constant_rows_exact():
    """A degenerate activation row (max == min != 0) has no range for the
    asymmetric grid; the scale-1.0 fallback used to reconstruct such a
    row as round(c) — an identity product of all-0.3 returned 0.0 and
    all-0.7 returned 1.0 (round-4 review finding).  The fallback is now
    the symmetric max-abs/127 grid, which is exact to ~1 ulp for
    constant rows; all-zero rows stay exactly zero."""
    eye = jnp.eye(128, dtype=jnp.float32)
    for c in (0.3, 0.7, -0.45, 0.0):
        x = jnp.full((2, 128), c, dtype=jnp.float32)
        got = np.asarray(int8_matmul(x, eye))
        np.testing.assert_allclose(got, np.full((2, 128), c), rtol=2e-6,
                                   atol=1e-7)
    # batched variant: one degenerate head row among normal rows
    rng = np.random.default_rng(5)
    xb = rng.normal(size=(3, 2, 128)).astype(np.float32)
    xb[1, 0, :] = 0.3
    w = np.stack([np.eye(128), np.eye(128)]).astype(np.float32)
    got = np.asarray(int8_batched_matmul(jnp.asarray(xb), jnp.asarray(w)))
    np.testing.assert_allclose(got[1, 0], np.full(128, 0.3), rtol=2e-6,
                               atol=1e-7)


def test_int8_batched_matmul_matches_einsum():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 2, 128)).astype(np.float32)
    w = rng.normal(size=(2, 128, 128)).astype(np.float32)
    got = np.asarray(int8_batched_matmul(jnp.asarray(x), jnp.asarray(w)))
    want = np.einsum("bri,rio->bro", x, w)
    # dynamic-quant error bound: ~1/127 per operand
    err = np.abs(got - want).max() / np.abs(want).max()
    assert err < 0.02, err


def test_quantized_model_close_to_f32(params):
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 3, 256), jnp.float32)
    p32 = _probs(CFG, params, x)
    p8 = _probs(QCFG, params, x)
    assert (p32.argmax(-1) == p8.argmax(-1)).mean() == 1.0
    assert np.abs(p32 - p8).max() < 0.05


def test_quantized_trace_uses_int8_mxu_dots(params):
    m = VideoModel(QCFG)
    x = jnp.zeros((4, 3, 256), jnp.float32)
    jaxpr = str(jax.make_jaxpr(
        lambda p, xx: m.apply({"params": p}, xx, xx, jnp.zeros(3),
                              jnp.asarray(0.0), False, False)[0].out)(
        params, x))
    # shared FC, frame/video domain FCs, 2 TRN scale GEMMs, relation fc1
    n_int8 = len(re.findall(r"i8\[", jaxpr))
    assert n_int8 >= 12, n_int8  # >= 6 GEMMs x (weight + activation)
    # and the f32 trace has none
    jaxpr32 = str(jax.make_jaxpr(
        lambda p, xx: VideoModel(CFG).apply(
            {"params": p}, xx, xx, jnp.zeros(3), jnp.asarray(0.0),
            False, False)[0].out)(params, x))
    assert "i8[" not in jaxpr32


def test_logits_heads_stay_f32(params):
    """The classifier / 2-way domain logits heads are below the quant
    threshold by design: their kernels must never be converted to int8."""
    m = VideoModel(QCFG)
    x = jnp.zeros((4, 3, 256), jnp.float32)
    jaxpr = jax.make_jaxpr(
        lambda p, xx: m.apply({"params": p}, xx, xx, jnp.zeros(3),
                              jnp.asarray(0.0), False, False)[0].out)(
        params, x)
    # num_class=6 and 2-way outputs: no int8 tensor may have 6 or 2 as
    # its last dim
    assert not re.search(r"i8\[\d+,(2|6)\]", str(jaxpr))


def test_train_step_rejects_quantize():
    from ta3n_tpu.config import DAConfig
    from ta3n_tpu.train.step import make_train_step

    with pytest.raises(ValueError, match="inference-only"):
        make_train_step(VideoModel(QCFG), DAConfig(),
                        TrainConfig(batch_size=(4, 4, 4)))


def test_quantize_validation():
    with pytest.raises(ValueError, match="quantize"):
        dataclasses.replace(CFG, quantize="fp8")


def test_pallas_disabled_under_quantize():
    from ta3n_tpu.models.trn import RelationModuleMultiScale

    mod = RelationModuleMultiScale(256, 256, 3, quantize="int8",
                                   use_pallas="always")
    assert not mod._pallas_ok()


def test_quantized_ensemble_predictor(params, tmp_path):
    """int8 inference composes with deep-ensemble serving: the vmapped
    member pass over QuantDense equals the mean of solo quantized
    predictors."""
    p2 = jax.tree_util.tree_map(lambda a: a * 1.1, params)
    stacked = jax.tree_util.tree_map(
        lambda a, b: np.stack([np.asarray(a), np.asarray(b)]), params, p2)
    ens = Predictor(QCFG, stacked, n_members=2, batch_size=4, top_k=3)
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(3), (4, 3, 256)),
                   np.float32)
    probs = ens(x)[0]
    solos = [Predictor(QCFG, p, batch_size=4, top_k=3)(x)[0]
             for p in (params, p2)]
    np.testing.assert_allclose(probs, np.mean(solos, axis=0),
                               rtol=1e-5, atol=1e-6)


def test_predictor_and_export_roundtrip(params, tmp_path):
    """A quantized Predictor serves, exports (quantize recorded in
    meta.json), and the artifact reproduces the live predictor."""
    live = Predictor(QCFG, jax.device_get(params), batch_size=4, top_k=3)
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (4, 3, 256)),
                   np.float32)
    p_live, _, ti_live = live(x)
    p32 = Predictor(CFG, jax.device_get(params), batch_size=4, top_k=3)(x)[0]
    assert (p32.argmax(-1) == p_live.argmax(-1)).all()

    out = live.export(str(tmp_path / "artifact"), platforms=("cpu",))
    with open(str(tmp_path / "artifact/meta.json")) as f:
        assert json.load(f)["model_cfg"]["quantize"] == "int8"
    served = Predictor.from_exported(out)
    p_art, _, ti_art = served(x)
    np.testing.assert_allclose(p_art, p_live, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(ti_art, ti_live)
