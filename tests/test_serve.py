"""Serving: batch predictor + HTTP endpoint smoke (real socket)."""

import json
import threading
import urllib.request

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
def predictor():
    state = create_train_state(VideoModel(CFG), jax.random.PRNGKey(0),
                               4, 4, TrainConfig(batch_size=(4, 4, 4)))
    return Predictor(CFG, state.params, state.batch_stats, batch_size=4,
                     top_k=3)


def test_predictor_padding_and_shapes(predictor):
    x = np.random.default_rng(0).normal(size=(6, 3, 16)).astype(np.float32)
    probs, tp, ti = predictor(x)
    assert probs.shape == (6, 4) and tp.shape == (6, 3) and ti.shape == (6, 3)
    np.testing.assert_allclose(probs.sum(1), 1.0, rtol=1e-5)
    # padding must not change results vs a full batch
    probs2, _, _ = predictor(x[:4])
    np.testing.assert_allclose(probs[:4], probs2, rtol=1e-5)


def test_http_endpoint(predictor):
    from ta3n_tpu.serve import run_http_server

    server_thread = threading.Thread(
        target=run_http_server,
        args=(predictor, [f"c{i}" for i in range(4)], "127.0.0.1", 18571),
        daemon=True)
    server_thread.start()
    import time
    for _ in range(50):
        try:
            with urllib.request.urlopen(
                    "http://127.0.0.1:18571/healthz", timeout=1) as r:
                health = json.loads(r.read())
            break
        except OSError:
            time.sleep(0.1)
    assert health["status"] == "ok"

    x = np.random.default_rng(1).normal(size=(2, 3, 16)).tolist()
    req = urllib.request.Request(
        "http://127.0.0.1:18571/predict",
        data=json.dumps({"features": x}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=10) as r:
        out = json.loads(r.read())
    assert len(out["top_classes"]) == 2
    assert len(out["names"][0]) == 3

    # malformed request -> clean 400
    bad = urllib.request.Request(
        "http://127.0.0.1:18571/predict",
        data=json.dumps({"features": [1, 2, 3]}).encode(),
        headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(bad, timeout=10)
        assert False, "expected HTTP 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "error" in json.loads(e.read())


def test_mesh_predictor_matches_single_device(predictor):
    """--data_parallel serving: batch sharded over the 8-device CPU mesh
    must reproduce the single-device predictor bitwise-tolerance."""
    from ta3n_tpu.parallel.mesh import make_mesh

    state_params = predictor.params
    mesh = make_mesh()
    sharded = Predictor(CFG, state_params, predictor.batch_stats,
                        batch_size=5, top_k=3, mesh=mesh)
    # batch_size rounds UP to a device multiple
    assert sharded.batch_size == 8
    x = np.random.default_rng(2).normal(size=(11, 3, 16)).astype(np.float32)
    p0, tp0, ti0 = predictor(x)
    p1, tp1, ti1 = sharded(x)
    np.testing.assert_allclose(p0, p1, rtol=2e-5, atol=1e-6)
    np.testing.assert_array_equal(ti0, ti1)
