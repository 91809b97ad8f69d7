"""convert_features CLI: reference .t7-per-frame layout -> packed store
(RGB and Flow), and the serve CLI as a real subprocess."""

import json
import os
import subprocess
import sys
import time
import urllib.request

import numpy as np
import pytest
import torch

from ta3n_tpu.data import FeatureStore


def make_t7_tree(root, n_videos=3, frames=4, dim=16, flow=False):
    rows = []
    rng = np.random.default_rng(0)
    for v in range(n_videos):
        d = root / f"vid_{v:02d}"
        d.mkdir(parents=True)
        for t in range(1, frames + 1):
            if flow:
                for s in ("x", "y"):
                    torch.save(torch.from_numpy(
                        rng.normal(size=(dim,)).astype(np.float32)),
                        str(d / f"flow_{s}_{t:05d}.t7"))
            else:
                torch.save(torch.from_numpy(
                    rng.normal(size=(dim,)).astype(np.float32)),
                    str(d / f"img_{t:05d}.t7"))
        rows.append(f"{d} {frames} {v % 2}")
    (root / "list.txt").write_text("\n".join(rows) + "\n")
    return root / "list.txt"


def test_convert_rgb(tmp_path):
    from ta3n_tpu.cli.convert_features import main
    lst = make_t7_tree(tmp_path / "feat")
    main([str(lst), str(tmp_path / "store")])
    store = FeatureStore.load(str(tmp_path / "store"))
    assert store.num_videos == 3
    assert store.feature_dim == 16
    assert int(store.offsets[-1]) == 12
    # row 0 of video 0 must equal the tensor in img_00001.t7
    want = torch.load(str(tmp_path / "feat" / "vid_00" / "img_00001.t7"),
                      weights_only=True).numpy()
    got = store.gather(np.array([0]), np.array([[0]]))[0, 0]
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_convert_flow(tmp_path):
    from ta3n_tpu.cli.convert_features import main
    lst = make_t7_tree(tmp_path / "feat", flow=True)
    main([str(lst), str(tmp_path / "store"), "--modality", "Flow",
          "--flow_prefix", "flow_"])
    store = FeatureStore.load(str(tmp_path / "store"))
    assert store.num_streams == 2
    out = store.gather(np.array([0]), np.array([[0, 1]]))
    assert out.shape == (1, 4, 16)  # x/y interleaved per frame
    want_x = torch.load(str(tmp_path / "feat" / "vid_00"
                            / "flow_x_00001.t7"), weights_only=True).numpy()
    np.testing.assert_allclose(out[0, 0], want_x, rtol=1e-6)


def test_serve_cli_subprocess(tmp_path):
    """Launch the serving CLI as a real process and hit it over HTTP."""
    # build + save a checkpoint
    import jax
    from ta3n_tpu.config import ModelConfig, TrainConfig
    from ta3n_tpu.io_utils.checkpoint import save_checkpoint
    from ta3n_tpu.models import VideoModel
    from ta3n_tpu.train import create_train_state
    cfg = ModelConfig(num_class=3, baseline_type="video",
                      frame_aggregation="trn-m", train_segments=3,
                      val_segments=3, fc_dim=16, feature_dim=16,
                      use_attn="TransAttn")
    st = create_train_state(VideoModel(cfg), jax.random.PRNGKey(0), 4, 4,
                            TrainConfig(batch_size=(4, 4, 4)))
    save_checkpoint(str(tmp_path), {
        "epoch": 1, "arch": "resnet101", "params": st.params,
        "batch_stats": st.batch_stats, "opt_state": st.opt_state,
        "best_prec1": 0.0, "prec1": 0.0})
    (tmp_path / "class.txt").write_text("0 a\n1 b\n2 c\n")

    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, "-m", "ta3n_tpu.cli.serve",
         str(tmp_path / "class.txt"), str(tmp_path / "checkpoint"),
         "--feature_dim", "16", "--fc_dim", "16", "--test_segments", "3",
         "--frame_aggregation", "trn-m", "--use_attn", "TransAttn",
         "--batch_size", "4", "--top_k", "2", "--port", "18672"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    try:
        health = None
        for _ in range(120):
            try:
                with urllib.request.urlopen(
                        "http://127.0.0.1:18672/healthz", timeout=1) as r:
                    health = json.loads(r.read())
                break
            except OSError:
                if proc.poll() is not None:
                    out = proc.stdout.read().decode()
                    raise AssertionError(f"server died:\n{out}")
                time.sleep(0.5)
        assert health and health["status"] == "ok"
        feats = np.zeros((2, 3, 16), np.float32).tolist()
        req = urllib.request.Request(
            "http://127.0.0.1:18672/predict",
            data=json.dumps({"features": feats}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())
        assert len(out["top_classes"]) == 2
        assert len(out["top_classes"][0]) == 2
    finally:
        proc.terminate()
        proc.wait(timeout=10)
