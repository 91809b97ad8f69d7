"""RNN (LSTM/GRU) frame aggregation.

Parity: reference aggregate_frames 'rnn' branch (models.py:392-422):
segment-pool the S frame features into n_ts chunks with max-pooling,
run an (optionally bidirectional, multi-layer) recurrent net from a zero
initial state, and keep the last timestep's output.

Parameters use the TORCH LAYOUT — per (layer, direction) a fused-gate
``weight_ih_l{k} [in, G*H]`` (stored transposed), ``weight_hh_l{k}
[H, G*H]`` and TWO bias vectors ``bias_ih_l{k}``, ``bias_hh_l{k}``
(gate order i,f,g,o for LSTM / r,z,n for GRU, matching torch.nn.LSTM/
GRU).  Keeping b_ih and b_hh as separate leaves is a *training-parity*
requirement, not cosmetics: torch's optimizer updates both copies with
the same gradient, so a fused single bias would receive exactly half
the effective bias update per SGD step (and a different global clip
norm).  Weights use kaiming init (models.py:210-212); biases keep
torch's RNNBase default U(±1/sqrt(hidden)).

TPU mapping: the input projection for ALL timesteps runs as one batched
GEMM outside the scan (MXU-friendly); only the [B,H]x[H,G*H] recurrence
GEMM lives inside `lax.scan` — compiler-friendly sequential control flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ta3n_tpu.config import ModelConfig
from ta3n_tpu.models.layers import kaiming_normal

__all__ = ["RNNAggregator"]


def _torch_rnn_bias_init(hidden: int):
    """torch RNNBase.reset_parameters: U(±1/sqrt(hidden_size))."""
    bound = 1.0 / jnp.sqrt(hidden)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _lstm_scan(gi, w_hh, b_hh, reverse: bool):
    """gi: [B, T, 4H] pre-computed x@w_ih + b_ih; returns outputs [B,T,H].

    Gate order i, f, g, o (torch.nn.LSTM docs)."""
    h_dim = w_hh.shape[0]
    b = gi.shape[0]
    h0 = jnp.zeros((b, h_dim), gi.dtype)
    c0 = jnp.zeros((b, h_dim), gi.dtype)

    def step(carry, gi_t):
        h, c = carry
        gates = gi_t + h @ w_hh + b_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    _, ys = jax.lax.scan(step, (h0, c0), jnp.swapaxes(gi, 0, 1),
                         reverse=reverse)
    return jnp.swapaxes(ys, 0, 1)


def _gru_scan(gi, w_hh, b_hh, reverse: bool):
    """gi: [B, T, 3H] pre-computed x@w_ih + b_ih; returns outputs [B,T,H].

    Gate order r, z, n; n = tanh(gi_n + r * (h@w_hn + b_hn))
    (torch.nn.GRU docs)."""
    h_dim = w_hh.shape[0]
    b = gi.shape[0]
    h0 = jnp.zeros((b, h_dim), gi.dtype)

    def step(h, gi_t):
        gh = h @ w_hh + b_hh
        gi_r, gi_z, gi_n = jnp.split(gi_t, 3, axis=-1)
        gh_r, gh_z, gh_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(gi_r + gh_r)
        z = jax.nn.sigmoid(gi_z + gh_z)
        n = jnp.tanh(gi_n + r * gh_n)
        h = (1.0 - z) * n + z * h
        return h, h

    _, ys = jax.lax.scan(step, h0, jnp.swapaxes(gi, 0, 1), reverse=reverse)
    return jnp.swapaxes(ys, 0, 1)


class RNNAggregator(nn.Module):
    cfg: ModelConfig

    def _direction(self, x: jax.Array, suffix: str, per_dir: int,
                   reverse: bool) -> jax.Array:
        """One direction of one layer; params carry torch's own names
        ('weight_ih_l{k}[_reverse]', ...) with weights stored transposed
        ([in, G*H]) for the x@W GEMM."""
        n_gates = 4 if self.cfg.rnn_cell == "LSTM" else 3
        in_dim = x.shape[-1]
        w_ih = self.param(f"weight_ih_{suffix}", kaiming_normal,
                          (in_dim, n_gates * per_dir))
        w_hh = self.param(f"weight_hh_{suffix}", kaiming_normal,
                          (per_dir, n_gates * per_dir))
        bias_init = _torch_rnn_bias_init(per_dir)
        b_ih = self.param(f"bias_ih_{suffix}", bias_init,
                          (n_gates * per_dir,))
        b_hh = self.param(f"bias_hh_{suffix}", bias_init,
                          (n_gates * per_dir,))
        gi = x @ w_ih + b_ih  # ONE [B*T, in]x[in, G*H] GEMM for all steps
        scan = _lstm_scan if self.cfg.rnn_cell == "LSTM" else _gru_scan
        return scan(gi, w_hh, b_hh, reverse)

    @nn.compact
    def __call__(self, feat_seg: jax.Array, num_segments: int) -> jax.Array:
        cfg = self.cfg
        if cfg.rnn_cell not in ("LSTM", "GRU"):
            raise ValueError(f"unknown rnn_cell {cfg.rnn_cell}")
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
        h = x
        for layer in range(cfg.n_rnn):
            fwd = self._direction(h, f"l{layer}", per_dir, reverse=False)
            if cfg.n_directions == 2:
                bwd = self._direction(h, f"l{layer}_reverse", per_dir,
                                      reverse=True)
                h = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                h = fwd
        # last timestep output (models.py:422)
        return h[:, -1, :]
