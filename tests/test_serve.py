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


def test_ensemble_predictor_from_sweep(tmp_path):
    """Predictor.from_sweep serves a sweep output dir as a deep
    ensemble: averaged softmax == mean of the solo predictors' probs."""
    from ta3n_tpu.io_utils import save_checkpoint

    states = [create_train_state(VideoModel(CFG), jax.random.PRNGKey(s),
                                 4, 4, TrainConfig(batch_size=(4, 4, 4)))
              for s in (0, 1)]
    for k, st in enumerate(states):
        save_checkpoint(str(tmp_path / f"member_{k:02d}") + "/", {
            "epoch": 1, "arch": "none", "params": st.params,
            "batch_stats": st.batch_stats, "opt_state": st.opt_state,
            "best_prec1": 0.0, "prec1": 0.0, "step": 0})
    assert Predictor.is_sweep(str(tmp_path))
    assert not Predictor.is_sweep(str(tmp_path / "member_00"))

    ens = Predictor.from_sweep(str(tmp_path), CFG, batch_size=4,
                               top_k=3)
    assert ens.n_members == 2
    x = np.random.default_rng(2).normal(size=(4, 3, 16)).astype(np.float32)
    probs, tp, ti = ens(x)
    solos = [Predictor(CFG, st.params, st.batch_stats, batch_size=4,
                       top_k=3)(x)[0] for st in states]
    np.testing.assert_allclose(probs, np.mean(solos, axis=0), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(probs.sum(1), 1.0, rtol=1e-5)

    # member subset selection
    one = Predictor.from_sweep(str(tmp_path), CFG, members=[1],
                               batch_size=4, top_k=3)
    np.testing.assert_allclose(one(x)[0], solos[1], rtol=1e-5, atol=1e-6)


def test_ensemble_predictor_export_roundtrip(tmp_path):
    """An ensemble predictor exports to StableHLO (member weights baked
    in) and serves identically from the artifact."""
    from ta3n_tpu.io_utils import save_checkpoint

    for k, s in enumerate((3, 4)):
        st = create_train_state(VideoModel(CFG), jax.random.PRNGKey(s),
                                4, 4, TrainConfig(batch_size=(4, 4, 4)))
        save_checkpoint(str(tmp_path / f"member_{k:02d}") + "/", {
            "epoch": 1, "arch": "none", "params": st.params,
            "batch_stats": st.batch_stats, "opt_state": st.opt_state,
            "best_prec1": 0.0, "prec1": 0.0, "step": 0})
    ens = Predictor.from_sweep(str(tmp_path), CFG, batch_size=4, top_k=3)
    out = ens.export(str(tmp_path / "artifact"), platforms=("cpu",))
    served = Predictor.from_exported(out)
    x = np.random.default_rng(3).normal(size=(4, 3, 16)).astype(np.float32)
    np.testing.assert_allclose(served(x)[0], ens(x)[0], rtol=1e-5,
                               atol=1e-6)


def test_ensemble_predictor_model_best(tmp_path):
    """which='model_best' serves each member's best-validation state
    (distinct from its final checkpoint)."""
    from ta3n_tpu.io_utils import save_checkpoint

    st_best = create_train_state(VideoModel(CFG), jax.random.PRNGKey(7),
                                 4, 4, TrainConfig(batch_size=(4, 4, 4)))
    st_final = create_train_state(VideoModel(CFG), jax.random.PRNGKey(8),
                                  4, 4, TrainConfig(batch_size=(4, 4, 4)))
    d = str(tmp_path / "member_00") + "/"
    save_checkpoint(d, {"epoch": 1, "arch": "none",
                        "params": st_best.params,
                        "batch_stats": st_best.batch_stats,
                        "opt_state": st_best.opt_state,
                        "best_prec1": 80.0, "prec1": 80.0, "step": 1},
                    is_best=True)  # model_best = this state
    save_checkpoint(d, {"epoch": 2, "arch": "none",
                        "params": st_final.params,
                        "batch_stats": st_final.batch_stats,
                        "opt_state": st_final.opt_state,
                        "best_prec1": 80.0, "prec1": 50.0, "step": 2},
                    is_best=False)  # checkpoint = final state

    x = np.random.default_rng(4).normal(size=(4, 3, 16)).astype(np.float32)
    p_final = Predictor.from_sweep(str(tmp_path), CFG, batch_size=4)(x)[0]
    p_best = Predictor.from_sweep(str(tmp_path), CFG, batch_size=4,
                                  which="model_best")(x)[0]
    solo_best = Predictor(CFG, st_best.params, st_best.batch_stats,
                          batch_size=4)(x)[0]
    solo_final = Predictor(CFG, st_final.params, st_final.batch_stats,
                           batch_size=4)(x)[0]
    np.testing.assert_allclose(p_best, solo_best, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(p_final, solo_final, rtol=1e-5, atol=1e-6)
    # the two sources hold genuinely different states (probs are near
    # uniform for untrained std-0.001 inits, so compare params)
    ens_best = Predictor.from_sweep(str(tmp_path), CFG, batch_size=4,
                                    which="model_best")
    ens_final = Predictor.from_sweep(str(tmp_path), CFG, batch_size=4)
    diffs = [np.abs(a - b).max() for a, b in
             zip(jax.tree_util.tree_leaves(ens_best.params),
                 jax.tree_util.tree_leaves(ens_final.params))]
    assert max(diffs) > 1e-4


def test_sweep_best_guards(tmp_path):
    """which='model_best' refuses partial/missing best sets with a
    pointed error instead of silently serving a smaller ensemble."""
    from ta3n_tpu.io_utils import save_checkpoint

    st = create_train_state(VideoModel(CFG), jax.random.PRNGKey(0),
                            4, 4, TrainConfig(batch_size=(4, 4, 4)))
    for k in range(2):  # checkpoints only, no model_best anywhere
        save_checkpoint(str(tmp_path / f"member_{k:02d}") + "/", {
            "epoch": 1, "arch": "none", "params": st.params,
            "batch_stats": st.batch_stats, "opt_state": st.opt_state,
            "best_prec1": 0.0, "prec1": 0.0, "step": 1})
    with pytest.raises(FileNotFoundError, match="model_best"):
        Predictor.from_sweep(str(tmp_path), CFG, which="model_best")
    with pytest.raises(ValueError, match="expected 'checkpoint'"):
        Predictor.from_sweep(str(tmp_path), CFG, which="latest")
