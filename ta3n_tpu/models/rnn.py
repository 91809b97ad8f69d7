"""RNN (LSTM/GRU) frame aggregation.

Parity: reference aggregate_frames 'rnn' branch (models.py:392-422):
segment-pool the S frame features into n_ts chunks with max-pooling,
run an (optionally bidirectional, multi-layer) recurrent net from a zero
initial state, and keep the last timestep's output.  Weights use kaiming
init (models.py:210-212).  The scan is `flax.linen.RNN`, which lowers to
`lax.scan` — compiler-friendly sequential control flow on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ta3n_tpu.config import ModelConfig
from ta3n_tpu.models.layers import kaiming_normal

__all__ = ["RNNAggregator"]


class RNNAggregator(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, feat_seg: jax.Array, num_segments: int) -> jax.Array:
        cfg = self.cfg
        hidden = cfg.shared_dim
        # temporal chunking (models.py:396-408): len_ts = round(S / n_ts);
        # truncate or repeat the last frame so S' = len_ts * n_ts, then
        # max-pool within each chunk.
        len_ts = round(num_segments / cfg.n_ts)
        len_ts = max(len_ts, 1)
        num_extra = len_ts * cfg.n_ts - num_segments
        x = feat_seg
        if num_extra < 0:
            x = x[:, : len_ts * cfg.n_ts, :]
        elif num_extra > 0:
            pad = jnp.repeat(x[:, -1:, :], num_extra, axis=1)
            x = jnp.concatenate([x, pad], axis=1)
        b = x.shape[0]
        x = x.reshape(b, cfg.n_ts, len_ts, -1).max(axis=2)  # [B, n_ts, H]

        per_dir = hidden // cfg.n_directions

        def make_cell(name):
            if cfg.rnn_cell == "LSTM":
                return nn.OptimizedLSTMCell(per_dir, kernel_init=kaiming_normal,
                                            recurrent_kernel_init=kaiming_normal,
                                            name=name)
            if cfg.rnn_cell == "GRU":
                return nn.GRUCell(per_dir, kernel_init=kaiming_normal,
                                  recurrent_kernel_init=kaiming_normal,
                                  name=name)
            raise ValueError(f"unknown rnn_cell {cfg.rnn_cell}")

        h = x
        for layer in range(cfg.n_rnn):
            if cfg.n_directions == 2:
                rnn_fwd = nn.RNN(make_cell(f"cell_fwd_{layer}"))
                rnn_bwd = nn.RNN(make_cell(f"cell_bwd_{layer}"))
                h = nn.Bidirectional(rnn_fwd, rnn_bwd,
                                     name=f"bidir_{layer}")(h)
            else:
                h = nn.RNN(make_cell(f"cell_{layer}"),
                           name=f"rnn_{layer}")(h)
        # last timestep output (models.py:422)
        return h[:, -1, :]
