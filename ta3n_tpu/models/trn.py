"""Temporal Relation Network aggregators (single- and multi-scale).

TPU-native re-design of the reference `TRNmodule.py`: instead of a Python
loop over scales and subsets with one tiny GEMM each (TRNmodule.py:58-82),
the selected frame subsets are baked into static gather indices
(`ta3n_tpu.ops.relation`) and each scale runs ONE batched GEMM over all of
its selected subsets.  On TPU with MXU-aligned dims the whole multi-scale
stack runs as a single fused Pallas kernel (`ta3n_tpu.ops.trn_fused`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ta3n_tpu.models.layers import (_QUANT_MIN_DIM, dense, int8_matmul,
                                    torch_default_uniform)
from ta3n_tpu.ops.relation import build_relation_plan
from ta3n_tpu.ops.trn_fused import trn_multiscale_fused, trn_multiscale_infer

__all__ = ["RelationModule", "RelationModuleMultiScale", "force_xla_trn"]

# Set by force_xla_trn(): overrides use_pallas='auto'/'always' so traces
# contain no TPU custom calls.  Needed when tracing for serialization
# (jax.export multi-platform artifacts, serve.Predictor.export) on a host
# whose default backend is a real TPU — a Pallas custom call would pin the
# artifact to that exact backend.
_FORCE_XLA = False


class force_xla_trn:
    """Context manager: force the XLA TRN path for traces made inside."""

    def __enter__(self):
        global _FORCE_XLA
        self._prev = _FORCE_XLA
        _FORCE_XLA = True
        return self

    def __exit__(self, *exc):
        global _FORCE_XLA
        _FORCE_XLA = self._prev
        return False


class RelationModule(nn.Module):
    """Single-scale relation: ReLU -> Linear(S*D -> bottleneck) -> ReLU.

    Parity: reference RelationModule (TRNmodule.py:6-25).  Output is
    [B, 1, bottleneck] (a 1-relation tensor) so the downstream relation
    machinery is uniform; the reference returns [B, bottleneck] and its
    plain-'trn' DA path crashes on it (models.py:639 uses a ModuleList that
    only exists for trn-m; models.py:651 then sums over the feature axis) —
    we fix rather than replicate.
    """

    img_feature_dim: int
    num_bottleneck: int
    num_frames: int
    dtype: jnp.dtype = jnp.float32
    quantize: str = "none"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: [B, S, D]
        b = x.shape[0]
        h = x.reshape(b, self.num_frames * self.img_feature_dim)
        h = nn.relu(h)
        # torch DEFAULT Linear init: the reference's normal_(0.001) loop
        # never touches the TRN fusion Linears (layers.py
        # torch_default_uniform)
        h = dense(self.num_bottleneck, dtype=self.dtype, name="fc_fusion",
                  quantize=self.quantize, init="torch_default",
                  fan_in=self.num_frames * self.img_feature_dim)(h)
        h = nn.relu(h)
        return h[:, None, :]


class RelationModuleMultiScale(nn.Module):
    """Multi-scale relation: sum over a deterministic subset selection per
    scale k = S..2, producing one bottleneck feature per scale.

    Parity: reference RelationModuleMultiScale (TRNmodule.py:27-86), with
    its exact subset-selection quirks (see ops/relation.py).  Output:
    [B, S-1, bottleneck].

    Param layout (per scale i): ``w_scale_i`` [k_i*D, H], ``b_scale_i`` [H]
    with the reference init: torch's DEFAULT Linear init (the reference
    builds these via TRNmodule.py OUTSIDE its normal_(0.001) loop).
    """

    img_feature_dim: int
    num_bottleneck: int
    num_frames: int
    subsample_num: int = 3
    dtype: jnp.dtype = jnp.float32
    use_pallas: str = "auto"   # "auto" | "never" | "always"
    quantize: str = "none"     # int8: quantized XLA path (no Pallas)

    def _pallas_ok(self) -> bool:
        if _FORCE_XLA or self.use_pallas == "never":
            return False
        if self.quantize == "int8":
            # the fused f32 kernel would bypass quantization; the XLA
            # path below carries the int8 scale GEMMs
            return False
        if self.use_pallas == "always":
            return True
        # MXU-aligned dims on a real TPU backend (f32 and bf16; the kernels
        # compare in f32 — the VPU has no sub-f32 comparisons)
        return (jax.default_backend() == "tpu"
                and self.img_feature_dim % 128 == 0
                and self.num_bottleneck % 128 == 0)

    @nn.compact
    def __call__(self, x: jax.Array, infer: bool = False) -> jax.Array:
        # x: [B, S, D]; infer=True selects the mask-free fused forward
        # (no backward possible — eval/serve paths only)
        b = x.shape[0]
        d = self.img_feature_dim
        hdim = self.num_bottleneck
        plan = build_relation_plan(self.num_frames, self.subsample_num)

        # torch DEFAULT Linear init — the reference's normal_(0.001) loop
        # never touches the TRN fusion Linears (TRNmodule.py:50; see
        # layers.torch_default_uniform for why this is load-bearing)
        weights, biases = [], []
        for scale_id, k in enumerate(plan.scales):
            weights.append(self.param(f"w_scale_{scale_id}",
                                      torch_default_uniform(),
                                      (k * d, hdim)))
            biases.append(self.param(f"b_scale_{scale_id}",
                                     torch_default_uniform(k * d),
                                     (hdim,)))

        if self._pallas_ok():
            fused = trn_multiscale_infer if infer else trn_multiscale_fused
            return fused(
                x.astype(self.dtype),
                tuple(w.astype(self.dtype) for w in weights),
                tuple(bi.astype(self.dtype) for bi in biases),
                self.num_frames, self.subsample_num)

        # XLA path: one batched GEMM per scale
        outs = []
        for scale_id, (k, subsets) in enumerate(zip(plan.scales,
                                                    plan.subsets)):
            n_sel = subsets.shape[0]
            gathered = x[:, subsets.reshape(-1), :].reshape(b, n_sel, k * d)
            if (self.quantize == "int8" and k * d >= _QUANT_MIN_DIM
                    and hdim >= _QUANT_MIN_DIM):
                z = int8_matmul(nn.relu(gathered), weights[scale_id])
            else:
                z = jnp.einsum("bjf,fh->bjh",
                               nn.relu(gathered).astype(self.dtype),
                               weights[scale_id].astype(self.dtype),
                               preferred_element_type=jnp.float32)
            z = nn.relu(z + biases[scale_id][None, None, :])
            outs.append(jnp.sum(z, axis=1))  # TRNmodule.py:79
        return jnp.stack(outs, axis=1).astype(self.dtype)
