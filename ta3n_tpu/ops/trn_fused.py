"""Fused multi-scale TRN Pallas kernel.

The multi-scale TRN (reference TRNmodule.py:58-82) is, per scale k:
    out_k = sum_j relu( concat(x[:, subset_kj, :]) @ W_k + b_k )
summed over min(3, C(S,k)) statically-selected subsets, for k = S..2.
The reference runs a Python loop with one tiny GEMM per subset; the
XLA path (models/trn.py) batches each scale; this kernel fuses ALL
scales and subsets into a single Pallas launch:

  * x tile [TB, S*D] stays in VMEM; every subset-frame dot hits the MXU
    with float32 accumulation; relu/bias/sum fuse on the VPU;
  * subset frame indices are compile-time constants (ops/relation.py), so
    'gathers' are static VMEM slices — no gather ops, no index traffic;
  * one kernel, one output write [TB, (S-1)*H] — vs 10+ HLO ops.

The backward is a second fused Pallas kernel: the forward saves every
subset's relu mask (an extra [B, n_subsets*H] bf16 output — 0/1 is exact
in bf16), so the backward needs no z recompute — one launch produces dx
plus every scale's dW/db, with weight-gradient accumulation across
batch-tile grid steps (revisited output blocks).  When the whole batch
fits one tile, the ragged sublane edge is left to Mosaic's own masking
instead of an explicit pad op.  Measured on v5e at the published config
(B=202): bwd 48.5 -> 40.8 us, fwd 16.9 -> 22.3 us (the mask write), pad
+ relayout ops -8.8 us; net -11 us on the TRN path (honest A/B in
BENCH_NOTES.md).  An XLA einsum backward is kept as the interpret/CPU
fallback and as the equivalence oracle in tests.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ta3n_tpu.ops.relation import build_relation_plan

__all__ = ["trn_multiscale_fused", "trn_multiscale_infer",
           "trn_multiscale_reference"]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def trn_multiscale_reference(x: jax.Array, weights: Sequence[jax.Array],
                             biases: Sequence[jax.Array],
                             num_frames: int, subsample_num: int = 3
                             ) -> jax.Array:
    """Pure-XLA reference implementation (used for tests and as the
    fallback path).  x: [B, S, D]; weights[k]: [k_scale*D, H]."""
    plan = build_relation_plan(num_frames, subsample_num)
    b, s, d = x.shape
    outs = []
    for scale_id, (k, subsets) in enumerate(zip(plan.scales, plan.subsets)):
        g = x[:, subsets.reshape(-1), :].reshape(b, subsets.shape[0], k * d)
        z = jnp.einsum("bjf,fh->bjh", jax.nn.relu(g), weights[scale_id],
                       preferred_element_type=jnp.float32)
        z = z + biases[scale_id][None, None, :]
        outs.append(jnp.sum(jax.nn.relu(z), axis=1))
    return jnp.stack(outs, axis=1).astype(x.dtype)


def _fwd_kernel(plan, d: int, h: int, n_scales: int, with_masks: bool,
                *refs):
    x_ref = refs[0]
    w_refs = refs[1:1 + n_scales]
    b_refs = refs[1 + n_scales:1 + 2 * n_scales]
    out_ref = refs[1 + 2 * n_scales]
    # relu masks, one [TB,H] per subset (training forward only — the
    # inference variant skips the write and the extra output)
    mask_ref = refs[2 + 2 * n_scales] if with_masks else None

    x = jax.nn.relu(x_ref[:, :])  # [TB, S*D]; relu #1 of the fusion MLP
    sub_id = 0
    for scale_id, subsets in enumerate(plan.subsets):
        w = w_refs[scale_id]
        bias = b_refs[scale_id][0, :]
        acc = None
        for subset in subsets:
            z = None
            for p, frame in enumerate(subset):
                xi = x[:, frame * d:(frame + 1) * d]
                wi = w[p * d:(p + 1) * d, :]
                zi = jnp.dot(xi, wi, preferred_element_type=jnp.float32)
                z = zi if z is None else z + zi
            zb = z + bias[None, :]
            # saved for the backward: skips the z recompute there
            mask = (zb > 0.0).astype(jnp.float32)
            if with_masks:
                mask_ref[:, sub_id * h:(sub_id + 1) * h] = mask.astype(
                    mask_ref.dtype)
            sub_id += 1
            zr = mask * zb
            acc = zr if acc is None else acc + zr
        out_ref[:, scale_id * h:(scale_id + 1) * h] = acc.astype(
            out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def trn_multiscale_fused(x, weights, biases, num_frames: int,
                         subsample_num: int = 3, interpret: bool = False):
    """Fused forward.  x: [B, S, D] -> [B, S-1, H]."""
    return _fused_forward(x, weights, biases, num_frames, subsample_num,
                          interpret)[0]


def trn_multiscale_infer(x, weights, biases, num_frames: int,
                         subsample_num: int = 3, interpret: bool = False):
    """Inference-only fused forward: no relu-mask output/write (the mask
    is only consumed by the backward), saving its ~5.4 us and the
    [B, n_sub*H] HBM write on eval/serve paths.  Not differentiable —
    training paths use `trn_multiscale_fused`."""
    return _fused_forward(x, weights, biases, num_frames, subsample_num,
                          interpret, with_masks=False)[0]


def _fused_forward(x, weights, biases, num_frames, subsample_num,
                   interpret, with_masks=True):
    plan = build_relation_plan(num_frames, subsample_num)
    b, s, d = x.shape
    h = weights[0].shape[-1]
    n_scales = len(plan.scales)
    n_sub = sum(len(sub) for sub in plan.subsets)

    # VMEM budget: weights are resident every grid step; size the batch
    # tile so tile + outputs + double-buffering stay under the raised cap.
    weight_bytes = sum(w.size * w.dtype.itemsize for w in weights)
    tb = min(_round_up(b, 8), 256)
    while tb > 64 and (2 * tb * s * d * 4 + 2 * tb * (n_scales + n_sub)
                       * h * 4 + weight_bytes) > 96 * 2**20:
        tb //= 2
    if _round_up(b, 8) <= tb:
        # whole batch in one tile: Mosaic masks the ragged sublane edge
        # itself, so skip the explicit pad (saved ~6.5 us/step at B=202)
        tb = b
    b_pad = _round_up(b, tb)
    xf = x.reshape(b, s * d)
    if b_pad != b:
        xf = jnp.pad(xf, ((0, b_pad - b), (0, 0)))

    grid = (b_pad // tb,)
    in_specs = [pl.BlockSpec((tb, s * d), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for w in weights:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    for _ in biases:
        in_specs.append(pl.BlockSpec((1, h), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    out_specs = [pl.BlockSpec((tb, n_scales * h), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    out_shapes = [jax.ShapeDtypeStruct((b_pad, n_scales * h), x.dtype)]
    if with_masks:
        out_specs.append(pl.BlockSpec((tb, n_sub * h), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
        # 0/1 exactly representable; halves the save/reload
        out_shapes.append(jax.ShapeDtypeStruct((b_pad, n_sub * h),
                                               jnp.bfloat16))

    kernel = functools.partial(_fwd_kernel, plan, d, h, n_scales,
                               with_masks)
    flops = 2 * b_pad * h * d * sum(
        len(sub) * k for k, sub in zip(plan.scales, plan.subsets))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=xf.size * 4,
                                      transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2**20),
        interpret=interpret,
    )(xf, *weights, *[bi.reshape(1, h) for bi in biases])
    out = outs[0][:b].reshape(b, n_scales, h)
    masks = outs[1][:b] if with_masks else None
    return out, masks


def _bwd_kernel(plan, d: int, h: int, n_scales: int, *refs):
    """Fused backward: the forward saved every subset's relu mask, so no
    z recompute here (saves one GEMM per subset-frame); chain rule +
    dW/db accumulation across the batch-tile grid (out blocks revisited
    every step)."""
    x_ref = refs[0]
    g_ref = refs[1]
    m_ref = refs[2]
    w_refs = refs[3:3 + n_scales]
    dx_ref = refs[3 + n_scales]
    dw_refs = refs[4 + n_scales:4 + 2 * n_scales]
    db_refs = refs[4 + 2 * n_scales:4 + 3 * n_scales]

    first_tile = pl.program_id(0) == 0

    # compare in f32: the VPU has no sub-f32 comparison ops
    xf32 = x_ref[:, :].astype(jnp.float32)
    xr = jnp.maximum(xf32, 0.0).astype(x_ref.dtype)  # relu(x)
    relu_mask = (xf32 > 0).astype(jnp.float32)
    num_frames = plan.num_frames
    tb = x_ref.shape[0]
    # per-frame accumulators (static python list — no scatter ops)
    dx_frames = [jnp.zeros((tb, d), jnp.float32) for _ in range(num_frames)]

    sub_id = 0
    for scale_id, subsets in enumerate(plan.subsets):
        w = w_refs[scale_id]
        gs = g_ref[:, scale_id * h:(scale_id + 1) * h].astype(jnp.float32)
        dw_acc = jnp.zeros(w.shape, jnp.float32)
        db_acc = jnp.zeros((1, h), jnp.float32)
        for subset in subsets:
            m = m_ref[:, sub_id * h:(sub_id + 1) * h].astype(
                jnp.float32) * gs  # [TB, H]
            sub_id += 1
            db_acc = db_acc + jnp.sum(m, axis=0, keepdims=True)
            parts = []
            for p, frame in enumerate(subset):
                parts.append(jnp.dot(
                    xr[:, frame * d:(frame + 1) * d].T, m,
                    preferred_element_type=jnp.float32))
                dxi = jnp.dot(m, w[p * d:(p + 1) * d, :].T,
                              preferred_element_type=jnp.float32)
                dx_frames[frame] = dx_frames[frame] + dxi
            dw_acc = dw_acc + jnp.concatenate(parts, axis=0)

        @pl.when(first_tile)
        def _(dw_ref=dw_refs[scale_id], db_ref=db_refs[scale_id],
              dw_acc=dw_acc, db_acc=db_acc):
            dw_ref[:, :] = dw_acc.astype(dw_ref.dtype)
            db_ref[:, :] = db_acc.astype(db_ref.dtype)

        @pl.when(jnp.logical_not(first_tile))
        def _(dw_ref=dw_refs[scale_id], db_ref=db_refs[scale_id],
              dw_acc=dw_acc, db_acc=db_acc):
            dw_ref[:, :] = dw_ref[:, :] + dw_acc.astype(dw_ref.dtype)
            db_ref[:, :] = db_ref[:, :] + db_acc.astype(db_ref.dtype)

    dx = jnp.concatenate(dx_frames, axis=1)
    dx_ref[:, :] = (dx * relu_mask).astype(dx_ref.dtype)


def _fused_backward_pallas(x, weights, masks, g, num_frames,
                           subsample_num, interpret, tile_batch=None):
    plan = build_relation_plan(num_frames, subsample_num)
    b, s, d = x.shape
    h = weights[0].shape[-1]
    n_scales = len(plan.scales)
    n_sub = sum(len(sub) for sub in plan.subsets)

    weight_bytes = sum(w.size * w.dtype.itemsize for w in weights)
    tb = tile_batch or min(_round_up(b, 8), 256)
    while tb > 64 and (4 * tb * s * d * 4
                       + 2 * tb * (n_scales + n_sub) * h * 4
                       + 3 * weight_bytes) > 90 * 2**20:
        tb //= 2
    if tile_batch is None and _round_up(b, 8) <= tb:
        tb = b  # single ragged tile, no explicit pads (see forward)
    b_pad = _round_up(b, tb)
    xf = x.reshape(b, s * d)
    gf = g.reshape(b, n_scales * h)
    mf = masks
    if b_pad != b:
        xf = jnp.pad(xf, ((0, b_pad - b), (0, 0)))
        gf = jnp.pad(gf, ((0, b_pad - b), (0, 0)))
        mf = jnp.pad(mf, ((0, b_pad - b), (0, 0)))

    grid = (b_pad // tb,)
    in_specs = [
        pl.BlockSpec((tb, s * d), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, n_scales * h), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, n_sub * h), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    for w in weights:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    out_specs = [pl.BlockSpec((tb, s * d), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    out_shapes = [jax.ShapeDtypeStruct((b_pad, s * d), x.dtype)]
    for w in weights:  # dW: same block every grid step (accumulated)
        out_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
    for _ in range(n_scales):
        out_specs.append(pl.BlockSpec((1, h), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((1, h), jnp.float32))

    kernel = functools.partial(_bwd_kernel, plan, d, h, n_scales)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2**20),
        interpret=interpret,
    )(xf, gf, mf, *weights)

    dx = outs[0][:b].reshape(b, s, d)
    dws = [o.astype(w.dtype) for o, w in zip(outs[1:1 + n_scales], weights)]
    dbs = [o[0].astype(w.dtype)
           for o, w in zip(outs[1 + n_scales:], weights)]
    return dx, tuple(dws), tuple(dbs)


def _fused_fwd(x, weights, biases, num_frames, subsample_num, interpret):
    out, masks = _fused_forward(x, weights, biases, num_frames,
                                subsample_num, interpret)
    return out, (x, tuple(weights), masks)


def _fused_bwd(num_frames, subsample_num, interpret, residuals, g):
    """Backward via the fused Pallas kernel (interpreted off-TPU); the
    forward's saved relu masks make it recompute-free."""
    x, weights, masks = residuals
    return _fused_backward_pallas(x, weights, masks, g, num_frames,
                                  subsample_num, interpret)


def _fused_bwd_xla(num_frames, subsample_num, residuals, g):
    """XLA backward (equivalence oracle for the Pallas backward)."""
    x, weights, biases = residuals
    plan = build_relation_plan(num_frames, subsample_num)
    b, s, d = x.shape
    xr = jax.nn.relu(x)
    relu_mask = (x > 0).astype(g.dtype)
    dx = jnp.zeros_like(x, dtype=jnp.float32)
    dws, dbs = [], []
    for scale_id, (k, subsets) in enumerate(zip(plan.scales, plan.subsets)):
        w = weights[scale_id]
        bias = biases[scale_id]
        gs = g[:, scale_id, :].astype(jnp.float32)  # [B, H]
        dw = jnp.zeros_like(w, dtype=jnp.float32)
        db = jnp.zeros_like(bias, dtype=jnp.float32)
        for subset in subsets:
            xs = xr[:, np.asarray(subset), :].reshape(b, k * d)
            z = xs.astype(jnp.float32) @ w.astype(jnp.float32) \
                + bias[None, :]
            m = (z > 0).astype(jnp.float32) * gs       # [B, H]
            dw = dw + xs.T.astype(jnp.float32) @ m
            db = db + jnp.sum(m, axis=0)
            dxs = (m @ w.T.astype(jnp.float32)).reshape(b, k, d)
            dx = dx.at[:, np.asarray(subset), :].add(dxs)
        dws.append(dw.astype(w.dtype))
        dbs.append(db.astype(bias.dtype))
    dx = dx.astype(g.dtype) * relu_mask
    return (dx.astype(x.dtype), tuple(dws), tuple(dbs))


trn_multiscale_fused.defvjp(_fused_fwd, _fused_bwd)
