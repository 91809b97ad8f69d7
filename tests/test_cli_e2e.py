"""End-to-end CLI test: synthetic store + list files -> train CLI ->
checkpoint -> eval CLI artifacts (SURVEY §4 integration strategy)."""

import json
import os

import numpy as np
import pytest

from ta3n_tpu.data.synthetic import make_domain_pair


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    src, tgt, val = make_domain_pair(num_source=24, num_target=18,
                                     num_val=12, num_class=3,
                                     feature_dim=16, shift=0.8)
    for name, store in [("src", src), ("tgt", tgt), ("val", val)]:
        d = root / name
        store.save(str(d))
        with open(d / "list.txt", "w") as f:
            for r in store.records():
                f.write(f"{r.path} {r.num_frames} {r.label}\n")
    with open(root / "class.txt", "w") as f:
        for i in range(3):
            f.write(f"{i} class_{i}\n")
    return root


@pytest.fixture(scope="module")
def trained(workspace):
    """Train once into workspace/exp; eval/resume tests depend on this
    fixture (not on test ordering) for the checkpoint."""
    from ta3n_tpu.cli.train import main
    exp = workspace / "exp"
    best = main([
        str(workspace / "class.txt"), "RGB",
        str(workspace / "src" / "list.txt"),
        str(workspace / "tgt" / "list.txt"),
        str(workspace / "val" / "list.txt"),
        "--exp_path", str(exp) + "/",
        "--baseline_type", "video", "--frame_aggregation", "trn-m",
        "--num_segments", "3", "--val_segments", "3",
        "--add_fc", "1", "--fc_dim", "16",
        "--feature_dim", "16",
        "--dropout_i", "0.3", "--dropout_v", "0.3",
        "--use_target", "uSv", "--adv_DA", "RevGrad",
        "--beta", "0.5", "0.5", "0.5",
        "--use_attn", "TransAttn",
        "--add_loss_DA", "attentive_entropy", "--gamma", "0.01",
        "--lr", "0.1", "--lr_adaptive", "dann",
        "--epochs", "2", "-b", "8", "6", "8",
        "--copy_list", "N", "Y",
        "--save_model", "-pf", "1", "-sf", "100", "-ef", "1",
        "--save_best_log", str(exp) + "/best.log",
    ])
    return best


def test_train_cli_end_to_end(workspace, trained):
    exp = workspace / "exp"
    assert trained >= 0.0
    path_exp = str(exp) + "/RGB/"
    assert os.path.isdir(path_exp + "checkpoint")
    assert os.path.isdir(path_exp + "model_best")
    assert os.path.isfile(path_exp + "train.log")
    assert os.path.isfile(path_exp + "val.log")
    assert os.path.getsize(path_exp + "train.log") > 0


def test_train_cli_device_sampler_bf16_store(workspace):
    """--device_sampler + --store_dtype bfloat16 through the real CLI."""
    from ta3n_tpu.cli.train import main
    exp = workspace / "exp_dsamp"
    best = main([
        str(workspace / "class.txt"), "RGB",
        str(workspace / "src" / "list.txt"),
        str(workspace / "tgt" / "list.txt"),
        str(workspace / "val" / "list.txt"),
        "--exp_path", str(exp) + "/",
        "--baseline_type", "video", "--frame_aggregation", "trn-m",
        "--num_segments", "3", "--val_segments", "3",
        "--add_fc", "1", "--fc_dim", "16", "--feature_dim", "16",
        "--use_target", "uSv", "--adv_DA", "RevGrad",
        "--beta", "0.5", "0.5", "0.5", "--use_attn", "TransAttn",
        "--lr", "0.1", "--epochs", "1", "-b", "8", "6", "8",
        "--device_store", "--steps_per_call", "2", "--device_sampler",
        "--store_dtype", "bfloat16",
        "-pf", "1", "-sf", "100", "-ef", "1",
        "--save_best_log", str(exp) + "/best.log",
    ])
    assert best >= 0.0
    assert os.path.getsize(str(exp) + "/RGB/train.log") > 0


def test_eval_cli(workspace, trained):
    from ta3n_tpu.cli.test_models import main
    exp = workspace / "exp"
    out = main([
        str(workspace / "class.txt"), "RGB",
        str(workspace / "val" / "list.txt"),
        str(exp) + "/RGB/model_best",
        "--test_segments", "3", "--add_fc", "1", "--fc_dim", "16",
        "--feature_dim", "16",
        "--baseline_type", "video", "--frame_aggregation", "trn-m",
        "--use_attn", "TransAttn",
        "--bS", "4", "--top", "1", "2",
        "--save_confusion", str(exp) + "/confusion",
        "--save_scores", str(exp) + "/scores",
        "--save_attention", str(exp) + "/attn",
    ])
    assert "Pred@1" in out
    scores = np.load(str(exp) + "/scores.npz")
    assert scores["scores"].shape == (12, 3)   # real scores, not empty
    assert scores["labels"].shape == (12,)
    assert os.path.isfile(str(exp) + "/attn.txt")
    # confusion artifacts (png if matplotlib, txt fallback otherwise)
    assert (os.path.isfile(str(exp) + "/confusion.png")
            or os.path.isfile(str(exp) + "/confusion.png.txt"))
    assert os.path.isfile(str(exp) + "/confusion-top[1, 2].txt")


def test_eval_cli_quantize_flag(workspace, trained):
    """--quantize int8 wires through to ModelConfig and runs.  At toy
    dims (below the 128-dim MXU threshold) every GEMM falls back to f32,
    so the output must EQUAL the unquantized run; the actual int8
    numerics are covered at MXU dims by tests/test_int8_infer.py."""
    from ta3n_tpu.cli.test_models import main
    exp = workspace / "exp"
    base = [
        str(workspace / "class.txt"), "RGB",
        str(workspace / "val" / "list.txt"),
        str(exp) + "/RGB/model_best",
        "--test_segments", "3", "--add_fc", "1", "--fc_dim", "16",
        "--feature_dim", "16",
        "--baseline_type", "video", "--frame_aggregation", "trn-m",
        "--use_attn", "TransAttn", "--bS", "4", "--top", "1",
    ]
    assert main(base + ["--quantize", "int8"]) == main(base)


def test_eval_cli_device_store(workspace, trained):
    from ta3n_tpu.cli.test_models import main
    exp = workspace / "exp"
    out = main([
        str(workspace / "class.txt"), "RGB",
        str(workspace / "val" / "list.txt"),
        str(exp) + "/RGB/model_best",
        "--test_segments", "3", "--add_fc", "1", "--fc_dim", "16",
        "--feature_dim", "16",
        "--baseline_type", "video", "--frame_aggregation", "trn-m",
        "--use_attn", "TransAttn",
        "--bS", "4", "--top", "1", "2", "--device_store",
    ])
    assert "Pred@1" in out
    # identical accuracies to the host path
    host = main([
        str(workspace / "class.txt"), "RGB",
        str(workspace / "val" / "list.txt"),
        str(exp) + "/RGB/model_best",
        "--test_segments", "3", "--add_fc", "1", "--fc_dim", "16",
        "--feature_dim", "16",
        "--baseline_type", "video", "--frame_aggregation", "trn-m",
        "--use_attn", "TransAttn",
        "--bS", "4", "--top", "1", "2",
    ])
    assert out == host


def test_resume_from_checkpoint(workspace, trained):
    from ta3n_tpu.cli.train import main
    exp = workspace / "exp"
    best = main([
        str(workspace / "class.txt"), "RGB",
        str(workspace / "src" / "list.txt"),
        str(workspace / "tgt" / "list.txt"),
        str(workspace / "val" / "list.txt"),
        "--exp_path", str(exp) + "/",
        "--baseline_type", "video", "--frame_aggregation", "trn-m",
        "--num_segments", "3", "--val_segments", "3",
        "--fc_dim", "16", "--feature_dim", "16",
        "--use_target", "uSv", "--adv_DA", "RevGrad",
        "--use_attn", "TransAttn",
        "--epochs", "3", "-b", "8", "6", "8",
        "--resume", str(exp) + "/RGB/checkpoint",
        "--save_best_log", str(exp) + "/best.log",
    ])
    assert best >= 0.0


def test_train_val_script_both_branches(workspace, tmp_path):
    """scripts/train_val.sh end-to-end: training branch -> checkpoint,
    then testing branch -> eval artifacts via cli.test_models (the
    reference script's testing path, script_train_val.sh:166-172)."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data_root = tmp_path / "data"
    os.makedirs(data_root)
    for name, dst in [("src", "source"), ("tgt", "target"), ("val", "val")]:
        os.symlink(workspace / name, data_root / dst)
    env = dict(os.environ,
               PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH",
                                                             ""),
               TA3N_DATA_ROOT=str(data_root),
               TA3N_EXP_ROOT=str(tmp_path / "exp"),
               TA3N_CLASS_FILE=str(workspace / "class.txt"),
               TA3N_TRAINING="true", TA3N_TESTING="true",
               TA3N_SEGMENTS="3", TA3N_FC_DIM="16",
               TA3N_FEATURE_DIM="16", TA3N_EPOCHS="1", TA3N_BS="8")
    proc = subprocess.run(
        ["bash", os.path.join(repo, "scripts", "train_val.sh")],
        cwd=repo, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    assert "Testing Results" in proc.stdout          # training-branch val
    assert "Pred@1" in proc.stdout                   # testing-branch eval
    # artifacts from the testing branch
    import glob
    exp_dirs = glob.glob(str(tmp_path / "exp") + "-DA-*/**/RGB",
                         recursive=True)
    assert exp_dirs, proc.stdout[-2000:]
    rgb = exp_dirs[0]
    assert glob.glob(rgb + "/scores_*.npz")
    assert glob.glob(rgb + "/confusion_*.png")
    scores = np.load(glob.glob(rgb + "/scores_*.npz")[0])
    probs = scores[scores.files[0]]
    assert probs.ndim == 2 and probs.shape[0] > 0


def test_eval_cli_streaming_store(workspace, trained):
    """--store_budget_rows: shard-streamed eval == resident device-store
    eval (same Pred@K line)."""
    from ta3n_tpu.cli.test_models import main
    exp = workspace / "exp"
    base = [
        str(workspace / "class.txt"), "RGB",
        str(workspace / "val" / "list.txt"),
        str(exp) + "/RGB/model_best",
        "--test_segments", "3", "--add_fc", "1", "--fc_dim", "16",
        "--feature_dim", "16",
        "--baseline_type", "video", "--frame_aggregation", "trn-m",
        "--use_attn", "TransAttn",
        "--bS", "4", "--top", "1", "2", "--device_store",
    ]
    resident = main(base)
    streamed = main(base + ["--store_budget_rows", "60"])
    assert "Pred@1" in streamed
    assert streamed == resident


def test_eval_cli_data_parallel(workspace, trained):
    """--data_parallel eval (mesh equivalent of the reference's
    DataParallel eval, test_models.py:108): every store path sharded over
    the 8-device mesh must reproduce the single-device Pred@K line, with
    --bS rounded up to a device multiple under the mask."""
    from ta3n_tpu.cli.test_models import main
    exp = workspace / "exp"
    base = [
        str(workspace / "class.txt"), "RGB",
        str(workspace / "val" / "list.txt"),
        str(exp) + "/RGB/model_best",
        "--test_segments", "3", "--add_fc", "1", "--fc_dim", "16",
        "--feature_dim", "16",
        "--baseline_type", "video", "--frame_aggregation", "trn-m",
        "--use_attn", "TransAttn",
        "--bS", "4", "--top", "1", "2",
    ]
    host = main(base)
    assert main(base + ["--data_parallel"]) == host
    assert main(base + ["--data_parallel", "--device_store"]) == host
    assert main(base + ["--data_parallel", "--device_store",
                        "--store_budget_rows", "60"]) == host


def test_train_cli_accum_steps(workspace):
    """--accum_steps through the real CLI: G micro-batch pairs per
    optimizer update (VERDICT r2 #5; capability absent in the
    reference)."""
    from ta3n_tpu.cli.train import main
    exp = workspace / "exp_accum"
    best = main([
        str(workspace / "class.txt"), "RGB",
        str(workspace / "src" / "list.txt"),
        str(workspace / "tgt" / "list.txt"),
        str(workspace / "val" / "list.txt"),
        "--exp_path", str(exp) + "/",
        "--baseline_type", "video", "--frame_aggregation", "trn-m",
        "--num_segments", "3", "--val_segments", "3",
        "--add_fc", "1", "--fc_dim", "16", "--feature_dim", "16",
        "--use_target", "uSv", "--adv_DA", "RevGrad",
        "--beta", "0.5", "0.5", "0.5",
        "--lr", "0.1", "--epochs", "2", "-b", "8", "6", "8",
        "--accum_steps", "2",
        "-pf", "1", "-sf", "100", "-ef", "1",
    ])
    assert best >= 0.0
    path_exp = str(exp) + "/RGB/"
    assert os.path.isfile(path_exp + "train.log")
    assert os.path.getsize(path_exp + "train.log") > 0


def test_train_cli_streaming_device_sampler(workspace):
    """--device_sampler + --store_budget_rows: the larger-than-HBM
    streaming path with shard-local on-device batch generation."""
    from ta3n_tpu.cli.train import main
    exp = workspace / "exp_stream_dsamp"
    best = main([
        str(workspace / "class.txt"), "RGB",
        str(workspace / "src" / "list.txt"),
        str(workspace / "tgt" / "list.txt"),
        str(workspace / "val" / "list.txt"),
        "--exp_path", str(exp) + "/",
        "--baseline_type", "video", "--frame_aggregation", "trn-m",
        "--num_segments", "3", "--val_segments", "3",
        "--add_fc", "1", "--fc_dim", "16", "--feature_dim", "16",
        "--use_target", "uSv", "--adv_DA", "RevGrad",
        "--beta", "0.5", "0.5", "0.5",
        "--lr", "0.1", "--epochs", "1", "-b", "8", "6", "8",
        "--device_store", "--steps_per_call", "2", "--device_sampler",
        "--store_budget_rows", "80",
        "-pf", "1", "-sf", "100", "-ef", "1",
    ])
    assert best >= 0.0


def test_train_cli_model_parallel(workspace, monkeypatch):
    """--model_parallel 2: (4 data x 2 model) mesh through the real CLI
    (TP threshold lowered so the tiny test kernels shard)."""
    import ta3n_tpu.train.step as step_mod
    monkeypatch.setattr(step_mod, "_TP_MIN_SIZE", 16)
    from ta3n_tpu.cli.train import main
    exp = workspace / "exp_tp"
    best = main([
        str(workspace / "class.txt"), "RGB",
        str(workspace / "src" / "list.txt"),
        str(workspace / "tgt" / "list.txt"),
        str(workspace / "val" / "list.txt"),
        "--exp_path", str(exp) + "/",
        "--baseline_type", "video", "--frame_aggregation", "trn-m",
        "--num_segments", "3", "--val_segments", "3",
        "--add_fc", "1", "--fc_dim", "16", "--feature_dim", "16",
        "--use_target", "uSv", "--adv_DA", "RevGrad",
        "--beta", "0.5", "0.5", "0.5",
        "--lr", "0.1", "--epochs", "1", "-b", "8", "8", "8",
        "--model_parallel", "2",
        "-pf", "1", "-sf", "100", "-ef", "1",
    ])
    assert best >= 0.0


def test_train_cli_model_parallel_device_sampler(workspace, monkeypatch):
    """Composition: --model_parallel 2 + --device_store +
    --steps_per_call + --device_sampler (TP state shardings flow through
    the sampled K-step builder)."""
    import ta3n_tpu.train.step as step_mod
    monkeypatch.setattr(step_mod, "_TP_MIN_SIZE", 16)
    from ta3n_tpu.cli.train import main
    exp = workspace / "exp_tp_dsamp"
    best = main([
        str(workspace / "class.txt"), "RGB",
        str(workspace / "src" / "list.txt"),
        str(workspace / "tgt" / "list.txt"),
        str(workspace / "val" / "list.txt"),
        "--exp_path", str(exp) + "/",
        "--baseline_type", "video", "--frame_aggregation", "trn-m",
        "--num_segments", "3", "--val_segments", "3",
        "--add_fc", "1", "--fc_dim", "16", "--feature_dim", "16",
        "--use_target", "uSv", "--adv_DA", "RevGrad",
        "--beta", "0.5", "0.5", "0.5",
        "--lr", "0.1", "--epochs", "1", "-b", "8", "8", "8",
        "--model_parallel", "2",
        "--device_store", "--steps_per_call", "2", "--device_sampler",
        "-pf", "1", "-sf", "100", "-ef", "1",
    ])
    assert best >= 0.0


def test_main_does_not_leak_prng_impl(workspace, trained):
    """main() sets jax_default_prng_impl (default rbg) process-global for
    its own run; it must restore the caller's value on return.  The leak
    is order-dependent poison: `trained` is module-scoped, so it runs
    BEFORE conftest's per-test config snapshot — without the in-main
    restore, every test after the first CLI invocation would silently
    train with rbg keys (caught as a DAN-trajectory shift in the full
    suite)."""
    import jax
    assert jax.config.jax_default_prng_impl == "threefry2x32"


def test_sweep_cli(workspace):
    """cli.sweep: a (seed x lr) grid trains as one vmapped program on
    the 8-device mesh; member checkpoints are standard checkpoints the
    eval CLI consumes, reproducing the sweep's reported top-1."""
    from ta3n_tpu.cli.sweep import main as sweep_main
    from ta3n_tpu.cli.test_models import main as eval_main
    out_dir = workspace / "sweep_out"
    out = sweep_main([
        str(workspace / "class.txt"), "RGB",
        str(workspace / "src" / "list.txt"),
        str(workspace / "tgt" / "list.txt"),
        str(workspace / "val" / "list.txt"),
        "--exp_path", str(workspace / "sweep_exp") + "/",
        "--baseline_type", "video", "--frame_aggregation", "trn-m",
        "--num_segments", "3", "--val_segments", "3",
        "--add_fc", "1", "--fc_dim", "16", "--feature_dim", "16",
        "--use_target", "uSv", "--adv_DA", "RevGrad",
        "--use_attn", "TransAttn",
        "--lr", "0.1", "--epochs", "1", "-b", "8", "6", "8",
        "--sweep_seeds", "0", "1", "--sweep_lrs", "0.1", "0.0",
        "--sweep_dir", str(out_dir), "--sweep_mesh", "4",
    ])
    rows = out["results"]
    assert len(rows) == 4  # 2 seeds x 2 lrs
    assert {(r["seed"], r["lr"]) for r in rows} == \
        {(0, 0.1), (0, 0.0), (1, 0.1), (1, 0.0)}
    assert os.path.isdir(out_dir / "member_00" / "checkpoint")
    assert os.path.isfile(out_dir / "sweep.json")

    # the eval CLI consumes a member checkpoint and reproduces its top-1
    line = eval_main([
        str(workspace / "class.txt"), "RGB",
        str(workspace / "val" / "list.txt"),
        str(out_dir / "member_00" / "checkpoint"),
        "--test_segments", "3", "--add_fc", "1", "--fc_dim", "16",
        "--feature_dim", "16",
        "--baseline_type", "video", "--frame_aggregation", "trn-m",
        "--use_attn", "TransAttn", "--bS", "8", "--top", "1",
    ])
    assert f"Pred@1 {rows[0]['top1']:.2f}%" in line
