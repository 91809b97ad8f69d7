"""Checkpoint interop with REAL reference artifacts, both directions.

Import: the reference's OWN main() (runs end-to-end in-process on
synthetic per-frame .t7 features, main.py:33-306) trains for 2 epochs
and writes a genuine checkpoint.pth.tar via save_checkpoint
(main.py:764-770).  We import that artifact and must reproduce the
reference's validate() top-1 and eval logits exactly.

Export: our train CLI produces a checkpoint on the SAME data (converted
to a packed store); cli/export_checkpoint turns it into a .pth.tar; the
ACTUAL /root/reference/test_models.py (strict load_state_dict,
test_models.py:85-90) loads and evals it, and its Pred@1 must equal our
eval CLI's on the same videos.

This replaces mirror-built state_dicts (test_import_cli/
test_torch_export keep covering the fast paths) as the end-to-end
interop check — VERDICT r3 item 2.
"""

import contextlib
import io
import os
import re
import runpy
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from ta3n_tpu.config import ModelConfig
from ta3n_tpu.io_utils.torch_import import load_torch_checkpoint
from ta3n_tpu.models import VideoModel
from ta3n_tpu.train.step import make_eval_step

from tests import ref_harness

C, S, D, FC = 5, 5, 24, 16
B_SRC, B_TGT, B_VAL = 8, 6, 6
N_SRC, N_TGT, N_VAL, FRAMES = 24, 18, 12, 8

REF_MODEL_FLAGS = [
    "--arch", "resnet101", "--num_segments", str(S),
    "--val_segments", str(S), "--add_fc", "1", "--fc_dim", str(FC),
    "--baseline_type", "video", "--frame_aggregation", "trn-m",
    "--use_target", "uSv", "--adv_DA", "RevGrad",
    "--place_adv", "Y", "Y", "Y", "--use_attn", "TransAttn",
    "--add_loss_DA", "attentive_entropy",
    "--beta", "0.75", "0.75", "0.5", "--gamma", "0.003",
    "--lr", "0.03", "--optimizer", "SGD",
    "-b", str(B_SRC), str(B_TGT), str(B_VAL), "-j", "0",
]

OUR_MODEL_CFG = ModelConfig(
    num_class=C, baseline_type="video", frame_aggregation="trn-m",
    train_segments=S, val_segments=S, fc_dim=FC, feature_dim=D,
    use_attn="TransAttn", dropout_i=0.0, dropout_v=0.0)


def _make_t7_split(root, n_videos, seed):
    """Reference feature layout: one torch-saved tensor per frame
    (dataset.py:53-66 loading contract) + a `path frames label` list."""
    rng = np.random.default_rng(seed)
    lines = []
    for v in range(n_videos):
        d = root / f"vid{v:04d}"
        d.mkdir(parents=True)
        for f in range(1, FRAMES + 1):
            torch.save(torch.from_numpy(
                rng.normal(size=(D,)).astype(np.float32)),
                str(d / f"img_{f:05d}.t7"))
        lines.append(f"{d} {FRAMES} {v % C}")
    lst = root / "list.txt"
    lst.write_text("\n".join(lines) + "\n")
    return lst


@pytest.fixture(scope="module")
def ref_run(tmp_path_factory):
    """Run the reference's ACTUAL main() end-to-end (2 epochs,
    --save_model) on synthetic .t7 data; yields the genuine
    checkpoint.pth.tar it wrote plus the parsed validate() top-1s."""
    ws = tmp_path_factory.mktemp("ref_interop")
    ref_harness.set_feature_dim(D)
    ns = ref_harness.load_reference()

    src_list = _make_t7_split(ws / "src", N_SRC, 0)
    tgt_list = _make_t7_split(ws / "tgt", N_TGT, 1)
    val_list = _make_t7_split(ws / "val", N_VAL, 2)
    class_file = ws / "class.txt"
    class_file.write_text("".join(f"{i} class{i}\n" for i in range(C)))

    argv = ["main.py", str(class_file), "RGB", str(src_list),
            str(tgt_list), str(val_list),
            "--exp_path", str(ws / "exp") + "/",
            "--dropout_i", "0.5", "--dropout_v", "0.5",
            "--epochs", "2", "--eval_freq", "1", "--save_model",
            "--save_best_log", str(ws / "best.log"),
            "-pf", "50", "-sf", "50"] + REF_MODEL_FLAGS
    old_argv, old_cwd = sys.argv, os.getcwd()
    ns.main.best_prec1 = 0
    buf = io.StringIO()
    sys.argv = argv
    os.chdir(ws)
    try:
        with contextlib.redirect_stdout(buf):
            ns.main.main()
    finally:
        sys.argv = old_argv
        os.chdir(old_cwd)
    out = buf.getvalue()
    top1s = [float(m) for m in
             re.findall(r"Testing Results: Prec@1 (\d+\.\d+)", out)]
    ckpt = ws / "exp" / "RGB" / "checkpoint.pth.tar"
    assert ckpt.exists(), out[-2000:]
    assert len(top1s) == 2
    return types.SimpleNamespace(ws=ws, ckpt=ckpt, src_list=src_list,
                                 tgt_list=tgt_list, val_list=val_list,
                                 class_file=class_file,
                                 final_val_top1=top1s[-1])


def _ref_val_batches(val_list):
    """The reference's own val pipeline (main.py:174-183): TSNDataSet in
    test mode, sequential loader — deterministic batches."""
    ns = ref_harness.load_reference()
    val_set = ns.dataset.TSNDataSet(
        "", str(val_list), num_dataload=N_VAL, num_segments=S,
        new_length=1, modality="RGB", image_tmpl="img_{:05d}.t7",
        random_shift=False, test_mode=True)
    loader = torch.utils.data.DataLoader(val_set, batch_size=B_VAL,
                                         shuffle=False, num_workers=0)
    return [(x, y) for x, y in loader]


def test_import_real_reference_checkpoint(ref_run, tmp_path):
    """A checkpoint.pth.tar actually written by main.py:764-770 imports
    cleanly (CLI included) and reproduces the reference's validate()."""
    ref_harness.set_feature_dim(D)

    # the import CLI consumes the real artifact without complaint
    from ta3n_tpu.cli.import_checkpoint import main as import_main
    import_main([str(ref_run.ckpt), str(tmp_path / "imported")])

    params, batch_stats, meta = load_torch_checkpoint(str(ref_run.ckpt))
    assert meta["epoch"] == 2
    assert meta["prec1"] == pytest.approx(ref_run.final_val_top1, abs=1e-3)

    val_batches = _ref_val_batches(ref_run.val_list)

    # reference side: ITS model, ITS load path (main.py:99-101), ITS
    # validate() — the artifact must reproduce the training run's final
    # val accuracy
    args = ref_harness.make_args(REF_MODEL_FLAGS)
    dp = ref_harness.build_ref_model(args, C)
    ck = torch.load(str(ref_run.ckpt), weights_only=False)
    dp.load_state_dict(ck["state_dict"])
    ref_top1 = ref_harness.ref_validate(args, dp, C, val_batches)
    assert ref_top1 == pytest.approx(ref_run.final_val_top1, abs=1e-3)

    # our side: same batches through the imported params
    model = VideoModel(OUR_MODEL_CFG)
    eval_step = make_eval_step(model)
    correct = n = 0.0
    for xb, yb in val_batches:
        m = eval_step(params, batch_stats, xb.numpy(),
                      yb.numpy().astype(np.int32),
                      np.ones(len(yb), np.float32))
        correct += float(m["top1"])
        n += float(m["n"])
    assert 100.0 * correct / n == pytest.approx(ref_top1, abs=1e-4)

    # logits on the first val batch vs the reference model's forward
    dp.eval()
    x, _ = val_batches[0]
    with torch.no_grad():
        ref_logits = dp(x, x, [0.0, 0.0, 0.0], 0.0, False, False)[6]
    _, out_t = model.apply({"params": params}, jnp.asarray(x.numpy()),
                           jnp.asarray(x.numpy()), jnp.zeros(3),
                           jnp.asarray(0.0), False, False)
    np.testing.assert_allclose(np.asarray(out_t.out), ref_logits.numpy(),
                               rtol=1e-4, atol=1e-5)


def _strip_ansi(s):
    return re.sub(r"\x1b\[[0-9;]*m", "", s)


def test_export_to_actual_reference_eval(ref_run, tmp_path):
    """Train with OUR CLI on the same data (converted to a packed
    store), export the checkpoint, and have the ACTUAL
    /root/reference/test_models.py evaluate it: its strict
    load_state_dict must accept the export and its Pred@1 must equal
    our eval CLI's on the same videos."""
    ref_harness.set_feature_dim(D)

    # ---- convert the .t7 splits to packed stores ----
    from ta3n_tpu.cli.convert_features import main as convert_main
    our_lists = {}
    for name, lst in (("src", ref_run.src_list), ("tgt", ref_run.tgt_list),
                      ("val", ref_run.val_list)):
        store_dir = tmp_path / name
        convert_main([str(lst), str(store_dir)])
        our_lists[name] = store_dir / "list.txt"
        our_lists[name].write_text(lst.read_text())

    # ---- our training run (same recipe, scaled) ----
    from ta3n_tpu.cli.train import main as train_main
    exp = tmp_path / "exp_ours"
    train_main([str(ref_run.class_file), "RGB", str(our_lists["src"]),
                str(our_lists["tgt"]), str(our_lists["val"]),
                "--exp_path", str(exp) + "/", "--feature_dim", str(D),
                "--dropout_i", "0.5", "--dropout_v", "0.5",
                "--epochs", "2", "--eval_freq", "1", "--save_model",
                "--save_best_log", str(tmp_path / "best.log"),
                "-pf", "50", "-sf", "50"] + REF_MODEL_FLAGS)
    ckpt_dir = exp / "RGB" / "model_best"
    assert ckpt_dir.exists()

    # ---- export to reference layout ----
    from ta3n_tpu.cli.export_checkpoint import main as export_main
    exported = tmp_path / "exported.pth.tar"
    export_main([str(ckpt_dir), str(exported)])

    # ---- the ACTUAL reference test_models.py evals the export ----
    ref_harness.patch_torch()
    argv = ["test_models.py", str(ref_run.class_file), "RGB",
            str(ref_run.val_list), str(exported),
            "--test_segments", str(S), "--add_fc", "1",
            "--fc_dim", str(FC), "--baseline_type", "video",
            "--frame_aggregation", "trn-m", "--use_attn", "TransAttn",
            "--bS", str(B_VAL), "-j", "0", "--top", "1",
            "--save_confusion", str(tmp_path / "ref_conf")]
    old_argv = sys.argv
    buf = io.StringIO()
    sys.argv = argv
    try:
        with contextlib.redirect_stdout(buf):
            runpy.run_path(os.path.join(ref_harness.REFERENCE,
                                        "test_models.py"),
                           run_name="__main__")
    finally:
        sys.argv = old_argv
    ref_out = _strip_ansi(buf.getvalue())
    m = re.search(r"Pred@1 (\d+\.\d+)%", ref_out)
    assert m, ref_out[-2000:]
    ref_top1 = float(m.group(1))

    # ---- our eval CLI on the same videos (packed store) ----
    from ta3n_tpu.cli.test_models import main as our_eval_main
    buf2 = io.StringIO()
    with contextlib.redirect_stdout(buf2):
        our_eval_main([str(ref_run.class_file), "RGB",
                       str(our_lists["val"]), str(ckpt_dir),
                       "--test_segments", str(S), "--fc_dim", str(FC),
                       "--feature_dim", str(D),
                       "--baseline_type", "video",
                       "--frame_aggregation", "trn-m",
                       "--use_attn", "TransAttn",
                       "--bS", str(B_VAL), "--top", "1"])
    m2 = re.search(r"Pred@1 (\d+\.\d+)%", buf2.getvalue())
    assert m2, buf2.getvalue()[-2000:]
    assert float(m2.group(1)) == pytest.approx(ref_top1, abs=0.005)
