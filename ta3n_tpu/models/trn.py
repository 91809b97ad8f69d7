"""Temporal Relation Network aggregators (single- and multi-scale).

TPU-native re-design of the reference `TRNmodule.py`: instead of a Python
loop over scales and subsets with one tiny GEMM each (TRNmodule.py:58-82),
the selected frame subsets are baked into static gather indices
(`ta3n_tpu.ops.relation`) and each scale runs ONE batched GEMM over all of
its selected subsets; XLA fuses the gathers/ReLUs into the matmuls.  A
fully fused Pallas kernel for the hot multi-scale path lives in
`ta3n_tpu.ops.trn_fused`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ta3n_tpu.models.layers import dense
from ta3n_tpu.ops.relation import build_relation_plan

__all__ = ["RelationModule", "RelationModuleMultiScale"]


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

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: [B, S, D]
        b = x.shape[0]
        h = x.reshape(b, self.num_frames * self.img_feature_dim)
        h = nn.relu(h)
        h = dense(self.num_bottleneck, dtype=self.dtype, name="fc_fusion")(h)
        h = nn.relu(h)
        return h[:, None, :]


class RelationModuleMultiScale(nn.Module):
    """Multi-scale relation: sum over a deterministic subset selection per
    scale k = S..2, producing one bottleneck feature per scale.

    Parity: reference RelationModuleMultiScale (TRNmodule.py:27-86), with
    its exact subset-selection quirks (see ops/relation.py).  Output:
    [B, S-1, bottleneck].
    """

    img_feature_dim: int
    num_bottleneck: int
    num_frames: int
    subsample_num: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: [B, S, D]
        b = x.shape[0]
        d = self.img_feature_dim
        plan = build_relation_plan(self.num_frames, self.subsample_num)
        outs = []
        for scale_id, (k, subsets) in enumerate(zip(plan.scales,
                                                    plan.subsets)):
            n_sel = subsets.shape[0]
            # Static gather of the selected subsets: [B, n_sel, k, D].
            gathered = x[:, subsets.reshape(-1), :].reshape(b, n_sel, k * d)
            h = nn.relu(gathered)
            h = dense(self.num_bottleneck, dtype=self.dtype,
                      name=f"fc_fusion_scale_{scale_id}")(h)
            h = nn.relu(h)
            # Sum the selected relations of this scale (TRNmodule.py:79).
            outs.append(jnp.sum(h, axis=1))
        return jnp.stack(outs, axis=1)  # [B, S-1, bottleneck]
