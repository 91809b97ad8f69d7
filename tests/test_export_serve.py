"""AOT deployment artifacts: Predictor.export / from_exported.

The exported StableHLO module must reproduce the live predictor exactly
(weights are baked in as constants, the trace is the same function), load
without model code, and carry a faithful config sidecar.  Capability
beyond the reference, whose "deployment" is torch.load of a pickled
state_dict plus re-importing models.py (test_models.py:85-90).
"""

import dataclasses
import json
import os

import jax
import numpy as np
import pytest

from ta3n_tpu.config import ModelConfig, TrainConfig
from ta3n_tpu.models import VideoModel
from ta3n_tpu.serve import Predictor
from ta3n_tpu.train import create_train_state

CFG = ModelConfig(num_class=4, baseline_type="video",
                  frame_aggregation="trn-m", train_segments=3,
                  val_segments=3, fc_dim=16, feature_dim=16,
                  use_attn="TransAttn", dropout_i=0.0, dropout_v=0.0)


@pytest.fixture(scope="module")
def live_predictor():
    state = create_train_state(VideoModel(CFG), jax.random.PRNGKey(0),
                               4, 4, TrainConfig(batch_size=(4, 4, 4)))
    return Predictor(CFG, state.params, state.batch_stats, batch_size=4,
                     top_k=3)


@pytest.fixture(scope="module")
def artifact(live_predictor, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("aot") / "artifact")
    # cpu-only keeps the test independent of TPU lowering availability;
    # the multi-platform variant is exercised separately below
    live_predictor.export(path, platforms=("cpu",))
    return path


def test_export_writes_artifact(artifact):
    assert Predictor.is_exported(artifact)
    meta = json.load(open(os.path.join(artifact, "meta.json")))
    assert meta["model_cfg"] == dataclasses.asdict(CFG)
    assert meta["input_shape"] == [4, 3, 16]
    assert not Predictor.is_exported(os.path.dirname(artifact))


def test_exported_matches_live(live_predictor, artifact):
    served = Predictor.from_exported(artifact)
    assert served.cfg == CFG
    assert served.batch_size == 4 and served.top_k == 3
    x = np.random.default_rng(0).normal(size=(7, 3, 16)).astype(np.float32)
    p_live, tp_live, ti_live = live_predictor(x)
    p_aot, tp_aot, ti_aot = served(x)
    np.testing.assert_allclose(p_aot, p_live, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(tp_aot, tp_live, rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(ti_aot, ti_live)


def test_multiplatform_export(live_predictor, tmp_path):
    """cpu+tpu lowering serializes (and still runs here on cpu)."""
    path = str(tmp_path / "multi")
    live_predictor.export(path, platforms=("cpu", "tpu"))
    served = Predictor.from_exported(path)
    x = np.random.default_rng(1).normal(size=(4, 3, 16)).astype(np.float32)
    p_live, _, _ = live_predictor(x)
    p_aot, _, _ = served(x)
    np.testing.assert_allclose(p_aot, p_live, rtol=1e-6, atol=1e-7)


def test_reexport_of_artifact_rejected(artifact):
    served = Predictor.from_exported(artifact)
    with pytest.raises(ValueError, match="re-export"):
        served.export(artifact + "_again")


def test_serve_cli_export_and_load(tmp_path):
    """cli.serve --export writes an artifact the CLI can serve from."""
    from ta3n_tpu.cli import serve as serve_cli
    from ta3n_tpu.io_utils.checkpoint import save_checkpoint

    state = create_train_state(VideoModel(CFG), jax.random.PRNGKey(0),
                               4, 4, TrainConfig(batch_size=(4, 4, 4)))
    ckpt = save_checkpoint(str(tmp_path / "exp"),
                           {"params": state.params,
                            "batch_stats": state.batch_stats})
    class_file = tmp_path / "class.txt"
    class_file.write_text("".join(f"{i} c{i}\n" for i in range(4)))
    out = str(tmp_path / "aot")
    serve_cli.main([str(class_file), ckpt, "--fc_dim", "16",
                    "--feature_dim", "16", "--test_segments", "3",
                    "--batch_size", "4", "--top_k", "3",
                    "--export", out, "--export_platforms", "cpu"])
    assert Predictor.is_exported(out)
    served = Predictor.from_exported(out)
    x = np.random.default_rng(2).normal(size=(3, 3, 16)).astype(np.float32)
    probs, tp, ti = served(x)
    assert probs.shape == (3, 4) and ti.shape == (3, 3)
    np.testing.assert_allclose(probs.sum(1), 1.0, rtol=1e-5)


def test_exported_serves_on_mesh(live_predictor, tmp_path):
    """An exported artifact with a device-multiple batch size can be
    re-served data-parallel: GSPMD partitions the inlined module."""
    from ta3n_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    path = str(tmp_path / "aot8")
    wide = Predictor(CFG, live_predictor.params,
                     live_predictor.batch_stats, batch_size=8, top_k=3)
    wide.export(path, platforms=("cpu",))
    sharded = Predictor.from_exported(path, mesh=mesh)
    x = np.random.default_rng(3).normal(size=(6, 3, 16)).astype(np.float32)
    p0, _, ti0 = wide(x)
    p1, _, ti1 = sharded(x)
    np.testing.assert_allclose(p0, p1, rtol=2e-5, atol=1e-6)
    np.testing.assert_array_equal(ti0, ti1)

    # non-divisible artifact batch -> loud error
    path2 = str(tmp_path / "aot5")
    odd = Predictor(CFG, live_predictor.params,
                    live_predictor.batch_stats, batch_size=5, top_k=3)
    odd.export(path2, platforms=("cpu",))
    with pytest.raises(ValueError, match="not divisible"):
        Predictor.from_exported(path2, mesh=mesh)
