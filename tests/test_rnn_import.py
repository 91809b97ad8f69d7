"""RNN (LSTM/GRU) torch-weight import: numerical parity vs torch.nn
recurrences through the RNNAggregator."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ta3n_tpu.config import ModelConfig
from ta3n_tpu.io_utils.torch_import import import_torch_state_dict
from ta3n_tpu.models.rnn import RNNAggregator

B, S, H = 3, 5, 16   # n_ts == S so chunk pooling is identity


def run_ours(cell_type, n_rnn, rnn_params, x, n_directions=1):
    cfg = ModelConfig(num_class=2, feature_dim=H, fc_dim=H,
                      train_segments=S, val_segments=S, rnn_cell=cell_type,
                      n_rnn=n_rnn, n_ts=S, n_directions=n_directions,
                      frame_aggregation="rnn",
                      baseline_type="video", use_attn="none")
    agg = RNNAggregator(cfg)
    # template init to get the full structure, then overwrite
    var = agg.init(jax.random.PRNGKey(0), jnp.asarray(x), S)
    assert jax.tree_util.tree_structure(var["params"]) == \
        jax.tree_util.tree_structure(rnn_params)
    return np.asarray(agg.apply({"params": rnn_params}, jnp.asarray(x), S))


@pytest.mark.parametrize("cell_type,n_rnn", [("LSTM", 1), ("GRU", 1),
                                             ("LSTM", 2)])
def test_rnn_import_matches_torch(cell_type, n_rnn):
    torch.manual_seed(0)
    mod = (torch.nn.LSTM if cell_type == "LSTM" else torch.nn.GRU)(
        H, H, n_rnn, batch_first=True)
    x = np.random.default_rng(0).normal(size=(B, S, H)).astype(np.float32)
    with torch.no_grad():
        out, _ = mod(torch.from_numpy(x))
    want = out[:, -1, :].numpy()

    state = {f"rnn.{k}": v for k, v in mod.state_dict().items()}
    params, _ = import_torch_state_dict(state)
    got = run_ours(cell_type, n_rnn, params["rnn"], x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_bidirectional_lstm_import_matches_torch():
    torch.manual_seed(1)
    mod = torch.nn.LSTM(H, H // 2, 1, batch_first=True, bidirectional=True)
    x = np.random.default_rng(1).normal(size=(B, S, H)).astype(np.float32)
    with torch.no_grad():
        out, _ = mod(torch.from_numpy(x))
    want = out[:, -1, :].numpy()
    state = {f"rnn.{k}": v for k, v in mod.state_dict().items()}
    params, _ = import_torch_state_dict(state)
    got = run_ours("LSTM", 1, params["rnn"], x, n_directions=2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
