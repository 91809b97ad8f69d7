"""Reference-format checkpoint EXPORT (io_utils/torch_export.py):
round-trip through the importer must reproduce our params exactly, the
exported dict must carry the reference's dead keys for its strict
load_state_dict (test_models.py:89-90), and a torch mirror must load it.
"""

import jax
import numpy as np
import pytest

from ta3n_tpu.config import ModelConfig, TrainConfig
from ta3n_tpu.io_utils.torch_export import (export_state_dict,
                                            save_torch_checkpoint)
from ta3n_tpu.io_utils.torch_import import (import_torch_state_dict,
                                            load_torch_checkpoint)
from ta3n_tpu.models import VideoModel
from ta3n_tpu.train import create_train_state

SEG, FDIM = 3, 16


def _params(frame_aggregation="trn-m", use_attn="TransAttn",
            use_bn="none", ens_DA="none", share_params="Y",
            rnn_cell="LSTM"):
    cfg = ModelConfig(num_class=3, baseline_type="video",
                      frame_aggregation=frame_aggregation,
                      train_segments=SEG, val_segments=SEG, fc_dim=16,
                      feature_dim=FDIM, use_attn=use_attn, use_bn=use_bn,
                      ens_DA=ens_DA, share_params=share_params,
                      rnn_cell=rnn_cell, dropout_i=0.0, dropout_v=0.0)
    model = VideoModel(cfg)
    state = create_train_state(model, jax.random.PRNGKey(0), 4, 4,
                               TrainConfig(batch_size=(4, 4, 4)))
    return state.params, state.batch_stats


def _assert_tree_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = {jax.tree_util.keystr(p): v
          for p, v in jax.tree_util.tree_leaves_with_path(b)}
    assert len(la) == len(lb)
    for p, v in la:
        np.testing.assert_array_equal(np.asarray(v),
                                      np.asarray(lb[jax.tree_util.keystr(p)]),
                                      err_msg=jax.tree_util.keystr(p))


@pytest.mark.parametrize("kwargs", [
    dict(),                                        # flagship trn-m
    dict(frame_aggregation="avgpool", use_attn="none"),
    dict(frame_aggregation="trn", use_attn="general"),
    dict(use_bn="AutoDIAL"),
    dict(ens_DA="MCD"),
    dict(share_params="N"),
    dict(frame_aggregation="rnn", rnn_cell="LSTM"),
    dict(frame_aggregation="rnn", rnn_cell="GRU"),
    dict(frame_aggregation="temconv"),
])
def test_export_import_roundtrip(kwargs):
    params, stats = _params(**kwargs)
    sd = export_state_dict(params, stats)
    p2, s2 = import_torch_state_dict(sd)
    _assert_tree_equal(params, p2)
    _assert_tree_equal(stats, s2)


def test_export_contains_reference_dead_keys():
    """The reference constructs these unused Linears unconditionally
    (models.py:156-158,258-264); its strict load needs them."""
    params, stats = _params()
    sd = export_state_dict(params, stats)
    for k in ("fc_feature_source.weight", "fc_feature_source.bias",
              "fc_feature_video_source.weight",
              "fc_feature_video_source_2.weight"):
        assert k in sd, sorted(sd)
    # square layer mirrors the video-dim
    w = sd["fc_feature_video_source_2.weight"]
    assert w.shape[0] == w.shape[1]


def test_export_share_params_n_has_target_dead_keys():
    sd = export_state_dict(*_params(share_params="N"))
    assert "fc_feature_target.weight" in sd
    assert "fc_feature_video_target_2.weight" in sd


def test_save_torch_checkpoint_loads_with_torch(tmp_path):
    torch = pytest.importorskip("torch")
    params, stats = _params()
    path = str(tmp_path / "exported.pth.tar")
    save_torch_checkpoint(path, params, stats, epoch=7, best_prec1=78.3)
    p2, s2, meta = load_torch_checkpoint(path)
    _assert_tree_equal(params, p2)
    assert meta["epoch"] == 7
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    assert all(k.startswith("module.") for k in ckpt["state_dict"])


def test_export_cli_roundtrip(tmp_path):
    """exp checkpoint dir -> export CLI -> import CLI -> identical
    params (the full interop cycle both directions)."""
    from ta3n_tpu.cli.export_checkpoint import main as export_main
    from ta3n_tpu.cli.import_checkpoint import main as import_main
    from ta3n_tpu.io_utils.checkpoint import load_checkpoint, save_checkpoint
    params, stats = _params()
    save_checkpoint(str(tmp_path), {
        "epoch": 3, "arch": "resnet101", "params": params,
        "batch_stats": stats, "opt_state": {},
        "best_prec1": 55.0, "prec1": 50.0}, is_best=True)
    out = str(tmp_path / "exported.pth.tar")
    export_main([str(tmp_path / "model_best"), out])
    back_dir = str(tmp_path / "back")
    import_main([out, back_dir])
    payload = load_checkpoint(str(tmp_path / "back" / "model_best"))
    _assert_tree_equal(params, payload["params"])
    assert int(payload["epoch"]) == 3
