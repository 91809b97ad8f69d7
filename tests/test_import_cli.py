"""import_checkpoint CLI: torch .pth.tar -> orbax dir -> eval CLI chain,
and tsn-baseline validation with val_segments != train_segments."""

import os

import numpy as np
import torch

import jax
import jax.numpy as jnp


def test_import_checkpoint_cli_roundtrip(tmp_path):
    import sys
    sys.path.insert(0, "tests")
    from test_torch_import import build_torch_state

    _, state = build_torch_state()
    ckpt = {"state_dict": {f"module.{k}": v for k, v in state.items()},
            "epoch": 7, "arch": "resnet101", "best_prec1": 77.7,
            "prec1": 75.0}
    pth = tmp_path / "model_best.pth.tar"
    torch.save(ckpt, str(pth))

    from ta3n_tpu.cli.import_checkpoint import main as import_main
    out = tmp_path / "exp"
    import_main([str(pth), str(out)])
    assert os.path.isdir(out / "checkpoint")
    assert os.path.isdir(out / "model_best")

    from ta3n_tpu.io_utils.checkpoint import load_checkpoint
    payload = load_checkpoint(str(out / "model_best"))
    assert payload["epoch"] == 7
    assert payload["best_prec1"] == 77.7
    assert "fc_feature_shared_source" in payload["params"]


def test_tsn_baseline_val_segments_differ():
    """tsn baseline: validation with more segments than training averages
    frame logits over val_segments (main.py:722-723)."""
    from ta3n_tpu.config import ModelConfig, TrainConfig
    from ta3n_tpu.models import VideoModel
    from ta3n_tpu.train import create_train_state, make_eval_step

    kw = dict(num_class=3, baseline_type="tsn",
              frame_aggregation="avgpool", use_attn="none",
              train_segments=3, val_segments=5, fc_dim=16, feature_dim=16,
              dropout_i=0.0, dropout_v=0.0)
    model = VideoModel(ModelConfig(**kw))
    st = create_train_state(model, jax.random.PRNGKey(0), 4, 4,
                            TrainConfig(batch_size=(4, 4, 4)))
    ev = make_eval_step(model)
    x = np.random.default_rng(0).normal(size=(4, 5, 16)).astype(np.float32)
    y = np.zeros(4, np.int32)
    r = ev(st.params, st.batch_stats, x, y, np.ones(4, np.float32))
    assert r["logits"].shape == (4, 3)
    # out must equal the mean of per-frame logits over the 5 val segments
    s, t = model.apply({"params": st.params}, jnp.asarray(x),
                       jnp.asarray(x), jnp.zeros(3), jnp.asarray(0.0),
                       False, False)
    np.testing.assert_allclose(np.asarray(t.out), np.asarray(r["logits"]),
                               rtol=1e-6)
