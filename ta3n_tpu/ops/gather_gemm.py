"""Fused gather + first-frame-GEMM Pallas kernel.

The device-store training path gathers B*S feature rows from the
HBM-resident packed store and feeds them to the first frame-stack dense
layer (reference: per-frame torch.load at dataset.py:53-66 + the first
nn.Linear of models.py:565-603).  Round 2 profiling showed the XLA
gather pair costs 28 us/step (row-latency-bound, ~26 ns/row) and a
per-row Pallas DMA gather was REJECTED by Mosaic: single-row slices of
an (8,128)-tiled HBM memref are not DMA-able (BENCH_NOTES.md negative
result).

This kernel dodges that alignment wall with a LAYOUT change: the store
is kept in HBM as [R, D//128, 128] — one row = one tile-aligned
[D//128, 128] block, so `store.at[r]` IS a legal DMA slice.  The fused
forward then:

  * scalar-prefetches the row indices (SMEM),
  * double-buffers TB-row tiles: while tile t computes, tile t+1's
    per-row DMAs are in flight,
  * consumes the gathered [TB, 16, 128] tile IN PLACE on the MXU as 16
    subtile GEMMs against sublane-sliced weight panels
    (w[128s:128(s+1), :] — aligned VMEM slices, no relayout),
  * emits z = x @ W [TB, H] plus the gathered rows in the SAME
    [TB, 16, 128] layout as the backward residual (dW = einsum over the
    subtile axis is layout-free for XLA; the store itself needs no
    gradient — rows are input data).

Shapes: store3 [R, S16, 128], idx [N] int32, w [S16*128, H] ->
z [N, H], x_res [N, S16, 128].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gathered_gemm", "gathered_gemm_reference", "pack_store",
           "unpack_store"]


def pack_store(store: jax.Array) -> jax.Array:
    """[R, D] -> [R, D//128, 128] (one-time relayout at store upload:
    each row becomes one tile-aligned DMA-able block)."""
    r, d = store.shape
    if d % 128 != 0:
        raise ValueError(f"feature dim {d} not a multiple of 128")
    return store.reshape(r, d // 128, 128)


def unpack_store(store3: jax.Array) -> jax.Array:
    r, s, l = store3.shape
    return store3.reshape(r, s * l)


def gathered_gemm_reference(store3, idx, w):
    """XLA oracle: gather + reshape + GEMM."""
    r, s16, lanes = store3.shape
    x = store3[idx]                                   # [N, S16, 128]
    z = jnp.einsum("nsl,slh->nh", x,
                   w.reshape(s16, lanes, w.shape[-1]),
                   preferred_element_type=jnp.float32).astype(w.dtype)
    return z, x


def _kernel(n_tiles: int, tb: int, s16: int, mode: str,
            idx_ref, store_ref, w_ref, z_ref, xres_ref,
            scratch, sems):
    t = pl.program_id(0)
    h = w_ref.shape[-1]

    def issue(slot, tile):
        def body(i, _):
            row = idx_ref[tile * tb + i]
            pltpu.make_async_copy(store_ref.at[row],
                                  scratch.at[slot, i],
                                  sems.at[slot]).start()
            return 0
        jax.lax.fori_loop(0, tb, body, 0)

    def wait(slot, tile):
        def body(i, _):
            row = idx_ref[tile * tb + i]
            pltpu.make_async_copy(store_ref.at[row],
                                  scratch.at[slot, i],
                                  sems.at[slot]).wait()
            return 0
        jax.lax.fori_loop(0, tb, body, 0)

    @pl.when(t == 0)
    def _():
        issue(0, 0)

    @pl.when(t + 1 < n_tiles)
    def _():
        issue((t + 1) % 2, t + 1)

    slot = t % 2
    wait(slot, t)

    x = scratch[slot]                                  # [TB, S16, 128]
    if mode == "reshape":
        xf = x.reshape(tb, s16 * 128)
        acc = jnp.dot(xf, w_ref[:, :],
                      preferred_element_type=jnp.float32)
    else:  # "slices": consume subtiles in place, no full relayout
        acc = None
        for s in range(s16):
            xs = x[:, s, :]                            # [TB, 128]
            ws = w_ref[s * 128:(s + 1) * 128, :]       # aligned slice
            part = jnp.dot(xs, ws, preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
    z_ref[:, :] = acc.astype(z_ref.dtype)
    xres_ref[:, :, :] = x


def gathered_gemm(store3: jax.Array, idx: jax.Array, w: jax.Array,
                  tile_rows: int = 256, mode: str = "slices",
                  interpret: bool = False):
    """Fused gather+GEMM forward.  Returns (z [N, H], x_res [N, S16, 128]).

    Differentiable in ``w`` only (the gathered rows are input data);
    callers needing dW use x_res: dW = einsum('nsl,nh->slh', x_res, dz).
    """
    r, s16, lanes = store3.shape
    assert lanes == 128
    n = idx.shape[0]
    h = w.shape[-1]
    tb = min(tile_rows, max(8, n))
    n_pad = -(-n // tb) * tb
    idx_p = idx
    if n_pad != n:
        idx_p = jnp.concatenate(
            [idx, jnp.zeros(n_pad - n, idx.dtype)])
    n_tiles = n_pad // tb

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),         # store stays HBM
            pl.BlockSpec((s16 * 128, h), lambda t, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, h), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, s16, 128), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, tb, s16, 128), store3.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_kernel, n_tiles, tb, s16, mode)
    flops = 2 * n_pad * s16 * 128 * h
    z, x_res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((n_pad, h), w.dtype),
                   jax.ShapeDtypeStruct((n_pad, s16, 128), store3.dtype)),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=n_pad * s16 * 128 * 4 * 2 + w.size * 4,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2**20),
        interpret=interpret,
    )(idx_p, store3, w)
    return z[:n], x_res[:n]
