"""Building-block layers: init policies, masked BatchNorm, temporal conv,
attention weighting.

Parity notes reference `/root/reference/models.py` throughout.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ta3n_tpu.losses.losses import entropy_from_logits

# torch init parity: the Linears the reference's init loop TOUCHES are
# `normal_(weight, 0, 0.001); constant_(bias, 0)` (models.py:141-305).
normal_001 = nn.initializers.normal(stddev=0.001)
# TCL conv / RNN weights use kaiming_normal_ (models.py:51,210-212) =
# He-normal over fan_in.
kaiming_normal = nn.initializers.he_normal()


def torch_default_uniform(fan_in: Optional[int] = None):
    """torch ``nn.Linear`` DEFAULT init: weight kaiming_uniform(a=√5)
    and bias U(±1/√fan_in) — both reduce to U(±sqrt(1/fan_in)).

    The reference's normal_(0.001) loop lists its layers explicitly and
    NEVER touches the TRN fusion Linears (TRNmodule.py:18,50), the
    relation-domain classifiers (models.py:286-294) or the 'general'
    attention MLP (models.py:320-325) — those keep torch's default, and
    the difference is learning-speed-critical: with normal(0.001) the
    TRN output is ~1e-3-scale, so every video-level gradient is ~1000×
    too small (caught by the reference A/B, scripts/ref_ab_experiment).

    For kernels (shape [fan_in, out]) the fan-in is derived from the
    shape; for biases (shape [out]) pass ``fan_in`` explicitly.
    """
    def init(key, shape, dtype=jnp.float32):
        fi = fan_in if fan_in is not None else shape[0]
        bound = (1.0 / fi) ** 0.5
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


# int8 inference (ModelConfig.quantize='int8'): a dense GEMM is quantized
# only when BOTH dims reach the MXU tile width — smaller GEMMs gain
# nothing on the systolic array and the ones below this line are exactly
# the logits heads (num_class / 2-way domain outputs), which stay f32 for
# accuracy.
_QUANT_MIN_DIM = 128


def _activation_scale(hi: jax.Array, lo: jax.Array) -> jax.Array:
    """Per-row activation scale for the asymmetric 256-level grid.

    Degenerate rows (max == min) have no range for the asymmetric grid;
    falling back to scale 1.0 would reconstruct a constant-c row as
    round(c) (0.3 -> 0, a 100% error).  Fall back to the symmetric
    max-abs/127 grid instead: c/(|c|/127) rounds to +/-127 and the
    rank-1 zero-point correction reconstructs c exactly (to 1 ulp).
    All-zero rows keep scale 1.0 (reconstruct 0 exactly).
    """
    rng = hi - lo
    return jnp.where(rng > 0, rng / 255.0,
                     jnp.where(jnp.abs(hi) > 0, jnp.abs(hi) / 127.0, 1.0))


def int8_matmul(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """W8A8 dynamically-quantized ``x @ kernel`` on the int8 MXU path.

    Weights: symmetric per-output-channel scales (max-abs/127 over the
    input axis).  Activations: ASYMMETRIC per-row quantization — scale
    (max-min)/255 with a per-row zero point, so the full 256-level grid
    covers the actual row range.  The model's quantized GEMMs all see
    post-ReLU inputs (non-negative), where a symmetric grid would waste
    half its levels (effective 7-bit); the asymmetric grid halves that
    quantization error.  The zero-point lands back in the s8 dot via a
    rank-1 correction ``zp * colsum(w8)`` — colsum const-folds with the
    weights when the kernel is a trace-time constant (serve.Predictor
    closes params over the jit), so per call only the dynamic activation
    quant and one broadcast-multiply-add run.

    int8 x int8 -> int32 accumulation (``preferred_element_type=int32``
    maps onto the TPU MXU's native s8 mode), rescaled back to f32.

    x: [..., in_f]; kernel: [in_f, out_f] -> [..., out_f] float32.
    """
    kf = kernel.astype(jnp.float32)
    sw = jnp.max(jnp.abs(kf), axis=0) / 127.0            # [out_f]
    sw = jnp.where(sw > 0, sw, 1.0)
    w8 = jnp.clip(jnp.round(kf / sw), -127, 127).astype(jnp.int8)
    colsum = jnp.sum(w8.astype(jnp.int32), axis=0).astype(jnp.float32)
    xf = x.astype(jnp.float32)
    hi = jnp.max(xf, axis=-1, keepdims=True)
    lo = jnp.min(xf, axis=-1, keepdims=True)
    sx = _activation_scale(hi, lo)
    zp = jnp.round(lo / sx) + 128.0                      # [..., 1]
    x8 = jnp.clip(jnp.round(xf / sx) - zp, -128, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x8, w8, (((x8.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    # x ~= sx * (x8 + zp)  =>  x @ W ~= sx*sw*(acc + zp * colsum)
    return (acc.astype(jnp.float32) + zp * colsum) * sx * sw


def int8_batched_matmul(x: jax.Array, w: jax.Array) -> jax.Array:
    """W8A8 quantized ``einsum('bri,rio->bro', x, w)`` (stacked heads).

    Per-(head, output-channel) weight scales; per-(row, head) ASYMMETRIC
    activation quantization (see `int8_matmul` — full 256-level grid
    over the row range, zero point folded back via per-head weight
    column sums); same int8 MXU contraction as `int8_matmul`.
    """
    wf = w.astype(jnp.float32)
    sw = jnp.max(jnp.abs(wf), axis=1, keepdims=True) / 127.0   # [r,1,o]
    sw = jnp.where(sw > 0, sw, 1.0)
    w8 = jnp.clip(jnp.round(wf / sw), -127, 127).astype(jnp.int8)
    colsum = jnp.sum(w8.astype(jnp.int32), axis=1).astype(jnp.float32)
    xf = x.astype(jnp.float32)
    hi = jnp.max(xf, axis=-1, keepdims=True)                   # [b,r,1]
    lo = jnp.min(xf, axis=-1, keepdims=True)
    sx = _activation_scale(hi, lo)
    zp = jnp.round(lo / sx) + 128.0
    x8 = jnp.clip(jnp.round(xf / sx) - zp, -128, 127).astype(jnp.int8)
    acc = jnp.einsum("bri,rio->bro", x8, w8,
                     preferred_element_type=jnp.int32)
    # x ~= sx*(x8 + zp)  =>  out ~= sx*sw*(acc + zp * colsum[r,o])
    return ((acc.astype(jnp.float32) + zp * colsum[None])
            * sx * sw.transpose(1, 0, 2))


class QuantDense(nn.Module):
    """A `dense` layer computed on the int8 MXU path at inference.

    Identical param layout/init to ``nn.Dense`` (`<name>/{kernel,bias}`,
    weight normal(0.001), bias 0), so checkpoints and flax init streams
    are bitwise those of `dense(...)`; only the matmul arithmetic
    changes, and only when both dims reach `_QUANT_MIN_DIM`.
    """

    features: int
    dtype: Optional[jnp.dtype] = None
    init: str = "normal001"  # "normal001" | "torch_default"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_f = x.shape[-1]
        if self.init == "torch_default":
            k_init = torch_default_uniform()
            b_init = torch_default_uniform(in_f)
        else:
            k_init, b_init = normal_001, nn.initializers.zeros
        kernel = self.param("kernel", k_init, (in_f, self.features))
        bias = self.param("bias", b_init, (self.features,))
        if in_f >= _QUANT_MIN_DIM and self.features >= _QUANT_MIN_DIM:
            y = int8_matmul(x, kernel) + bias.astype(jnp.float32)
        else:  # logits heads: plain f32 math (nn.Dense semantics)
            dt = self.dtype or jnp.promote_types(x.dtype, kernel.dtype)
            y = (x.astype(dt) @ kernel.astype(dt)) + bias.astype(dt)
        return y.astype(self.dtype) if self.dtype is not None else y


def dense(features: int, dtype=None, name: Optional[str] = None,
          quantize: str = "none", init: str = "normal001",
          fan_in: Optional[int] = None) -> nn.Module:
    """A Linear with the reference's init policy.

    ``init='torch_default'`` selects torch's default Linear init for the
    layers the reference's normal_(0.001) loop never touches (see
    `torch_default_uniform`); pass ``fan_in`` with it (the bias bound
    depends on the input width, which nn.Dense's bias_init can't see).
    ``quantize='int8'`` (ModelConfig.quantize, inference paths only)
    swaps the arithmetic for the W8A8 int8 MXU path with the same params.
    """
    if quantize == "int8":
        return QuantDense(features, dtype=dtype, name=name, init=init)
    if init == "torch_default":
        if fan_in is None:
            raise ValueError("init='torch_default' requires fan_in=")
        return nn.Dense(features, kernel_init=torch_default_uniform(),
                        bias_init=torch_default_uniform(fan_in),
                        dtype=dtype, name=name)
    return nn.Dense(features, kernel_init=normal_001,
                    bias_init=nn.initializers.zeros, dtype=dtype, name=name)


class DenseParams(nn.Module):
    """The parameters of a `dense` layer without the matmul.

    Lets callers stack several same-shaped heads into ONE batched GEMM
    (the train step is op-count-bound, BENCH_NOTES.md) while keeping the
    per-head checkpoint layout: the param tree entry is still
    `<name>/{kernel,bias}` with the same shapes, and flax derives each
    param's init RNG from its (module name, param name) path, so the
    initialized values are bitwise identical to `dense(...)`'s.
    """

    features: int
    init: str = "normal001"  # "normal001" | "torch_default"

    @nn.compact
    def __call__(self, in_features: int):
        if self.init == "torch_default":
            k_init = torch_default_uniform()
            b_init = torch_default_uniform(in_features)
        else:
            k_init, b_init = normal_001, nn.initializers.zeros
        kernel = self.param("kernel", k_init,
                            (in_features, self.features))
        bias = self.param("bias", b_init, (self.features,))
        return kernel, bias


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d with optional per-row *statistics* weights.

    torch semantics (reference builds `nn.BatchNorm1d`, models.py:195-199):
      * train: normalize with (weighted) batch stats (biased variance),
        update running stats with momentum 0.1 and the *unbiased* variance;
      * eval: normalize with running stats.

    The row weights let the AdaBN/AutoDIAL `domainAlign` mix domains into a
    BN's statistics without the reference's dynamic-shape batch surgery
    (models.py:490-543): every row is normalized by this BN's stats, rows
    with weight 0 simply don't contribute to them.
    """

    features: int
    momentum: float = 0.1
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, stats_weight: Optional[jax.Array] = None,
                 use_running_average: bool = False) -> jax.Array:
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            if stats_weight is None:
                n = jnp.asarray(x.shape[0], jnp.float32)
                mean = jnp.mean(xf, axis=0)
                var = jnp.mean(jnp.square(xf - mean), axis=0)
            else:
                w = stats_weight.astype(jnp.float32)[:, None]
                n = jnp.maximum(jnp.sum(w), 1.0)
                mean = jnp.sum(w * xf, axis=0) / n
                var = jnp.sum(w * jnp.square(xf - mean), axis=0) / n
            if not self.is_initializing():
                m = self.momentum
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased

        inv = jax.lax.rsqrt(var + self.epsilon)
        y = (x - mean) * inv * scale + bias
        return y.astype(x.dtype)


class TCL(nn.Module):
    """Temporal conv layer: Conv(kernel=(conv_size,1)) over the segment axis.

    Parity: reference TCL (models.py:44-56) — a Conv2d(dim, dim, (k,1),
    padding=(k//2, 0)) with kaiming init, applied to [B, 1, S, D].  Here the
    layout is channel-last: [B, S, D, C].
    """

    conv_size: int
    dim: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: [B, S, D, dim]
        return nn.Conv(self.dim, kernel_size=(self.conv_size, 1),
                       padding=((self.conv_size // 2,) * 2, (0, 0)),
                       kernel_init=kaiming_normal)(x)


def trans_attn_weights(pred_domain: jax.Array) -> jax.Array:
    """TransAttn weights = 1 - entropy(softmax(domain logits)).

    Parity: get_trans_attn (models.py:351-357).  Input [..., 2]; output [...].
    """
    return 1.0 - entropy_from_logits(pred_domain)


class GeneralAttn(nn.Module):
    """'general' attention: Dense -> tanh -> Dense(1), softmax over axis 1.

    Parity: attn_layer (models.py:320-325) + get_general_attn
    (models.py:359-366).  Input [B, T, D]; output weights [B, T, 1].
    The reference builds attn_layer OUTSIDE its normal_(0.001) init loop,
    so both Linears keep torch's default init (torch_default_uniform).

    ``quantize='int8'`` runs attn_fc1 (dim x dim, MXU-sized for the
    published aggregated_dim=256) on the int8 path; attn_fc2 (out=1) is
    below the MXU tile and stays f32 via QuantDense's own gate.
    """

    dim: int
    quantize: str = "none"

    @nn.compact
    def __call__(self, feat: jax.Array) -> jax.Array:
        h = dense(self.dim, name="attn_fc1", quantize=self.quantize,
                  init="torch_default", fan_in=feat.shape[-1])(feat)
        h = jnp.tanh(h)
        w = dense(1, name="attn_fc2", quantize=self.quantize,
                  init="torch_default", fan_in=self.dim)(h)
        return jax.nn.softmax(w, axis=1)
