"""Measure the ACTUAL reference (/root/reference/main.py, torch CPU) on
this host: synthetic per-frame .t7 features at the published flagship
config (trn-m + TransAttn + attentive entropy + RevGrad YYY, batch
128/74, 5 segments, 2048-d features, fc_dim 512) — the same step
bench.py times for our framework.

The reference is CUDA-hardwired and probes torchvision for the feature
dim, so we monkeypatch (no files under /root/reference are modified):
  * torchvision stub: models.resnet101(...)->obj with fc.in_features=2048
    (models.py:125-126 uses nothing else)
  * Tensor.cuda / Module.cuda -> no-op; torch.cuda.device_count -> 0
    (DataParallel with 0 devices calls the module directly — the exact
    CPU analogue of main.py:79)

Prints one JSON line: {"sec_per_step", "videos_per_sec", "steps", ...}.
videos/s = (128+74)/sec_per_step, matching bench.py's convention.
Results recorded in BENCH_NOTES.md ("measured baseline" row).
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import re
import sys
import tempfile
import types

REFERENCE = "/root/reference"
BS, BT, BVAL, SEG, FDIM = 128, 74, 128, 5, 2048


def make_dataset(root: str, n_videos: int, frames: int, num_class: int,
                 seed: int):
    """Per-frame img_{:05d}.t7 tensors + list file (dataset.py:53-66
    loading contract: one torch tensor per frame file)."""
    import numpy as np
    import torch
    rng = np.random.default_rng(seed)
    lines = []
    for v in range(n_videos):
        d = os.path.join(root, f"vid{v:05d}")
        os.makedirs(d, exist_ok=True)
        feats = rng.normal(size=(frames, FDIM)).astype(np.float32)
        for f in range(frames):
            torch.save(torch.from_numpy(feats[f]),
                       os.path.join(d, f"img_{f + 1:05d}.t7"))
        lines.append(f"{d} {frames} {v % num_class}")
    list_path = os.path.join(root, "list.txt")
    with open(list_path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return list_path


def patch_torch():
    import torch

    tv = types.ModuleType("torchvision")
    tvm = types.ModuleType("torchvision.models")

    class _FC:
        in_features = FDIM

    class _Probe:
        fc = _FC()

    def _factory(*a, **k):
        return _Probe()

    for name in ("resnet101", "resnet50", "resnet152", "resnet34",
                 "resnet18", "alexnet", "vgg16"):
        setattr(tvm, name, _factory)
    tv.models = tvm
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tvm

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.cuda.manual_seed_all = lambda *a, **k: None
    # gpu_count=1 keeps main.py:367's replica-divisibility modulo sane
    torch.cuda.device_count = lambda: 1
    torch.cuda.LongTensor = torch.LongTensor

    class _PassthroughDP(torch.nn.Module):
        """CPU stand-in for DataParallel (main.py:79): single 'replica'."""

        def __init__(self, module, device_ids=None, **kwargs):
            super().__init__()
            self.module = module

        def forward(self, *args, **kwargs):
            return self.module(*args, **kwargs)

    torch.nn.DataParallel = _PassthroughDP

    # torch-0.4-era shim: models.py:14 uses `torch` leaked by
    # `from torch.nn.init import *`; modern torch has __all__ there
    import torch.nn.init as _init
    if hasattr(_init, "__all__") and "torch" not in _init.__all__:
        _init.__all__ = list(_init.__all__) + ["torch"]

    # torch-0.4-era shim: main.py:820 calls .view(-1) on a
    # non-contiguous tensor (legal then, RuntimeError now)
    _orig_view = torch.Tensor.view

    def _lenient_view(self, *shape):
        try:
            return _orig_view(self, *shape)
        except RuntimeError:
            return self.reshape(*shape)

    torch.Tensor.view = _lenient_view


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_source", type=int, default=640)
    ap.add_argument("--num_target", type=int, default=370)
    ap.add_argument("--num_val", type=int, default=128)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--num_class", type=int, default=12)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--warmup_steps", type=int, default=2,
                    help="initial steps dropped from the average")
    ap.add_argument("--keep_output", action="store_true")
    args = ap.parse_args()

    ws = tempfile.mkdtemp(prefix="ref_bench_")
    print(f"workspace: {ws}", file=sys.stderr)
    src_list = make_dataset(os.path.join(ws, "src"), args.num_source,
                            args.frames, args.num_class, 0)
    tgt_list = make_dataset(os.path.join(ws, "tgt"), args.num_target,
                            args.frames, args.num_class, 1)
    val_list = make_dataset(os.path.join(ws, "val"), args.num_val,
                            args.frames, args.num_class, 2)
    class_file = os.path.join(ws, "class.txt")
    with open(class_file, "w") as fh:
        fh.write("".join(f"{i} class{i}\n" for i in range(args.num_class)))

    patch_torch()

    # published flagship config (script_train_val.sh:10-17,96-101,136-155)
    sys.argv = [
        "main.py", class_file, "RGB", src_list, tgt_list, val_list,
        "--exp_path", os.path.join(ws, "exp") + "/",
        "--baseline_type", "video", "--frame_aggregation", "trn-m",
        "--num_segments", str(SEG), "--val_segments", str(SEG),
        "--add_fc", "1", "--fc_dim", "512",
        "--arch", "resnet101", "--dropout_i", "0.5", "--dropout_v", "0.5",
        "--use_target", "uSv", "--adv_DA", "RevGrad",
        "--place_adv", "Y", "Y", "Y", "--use_attn", "TransAttn",
        "--add_loss_DA", "attentive_entropy", "--gamma", "0.003",
        "--beta", "0.75", "0.75", "0.5",
        "--lr", "0.03", "--lr_adaptive", "dann",
        "--optimizer", "SGD", "--epochs", str(args.epochs),
        "-b", str(BS), str(BT), str(BVAL), "-j", "0", "-pf", "1",
        "-sf", "1",
    ]
    sys.path.insert(0, REFERENCE)
    os.chdir(ws)

    import runpy
    buf = io.StringIO()

    class Tee(io.TextIOBase):
        def write(self, s):
            buf.write(s)
            sys.stderr.write(s)
            return len(s)

    with contextlib.redirect_stdout(Tee()):
        runpy.run_path(os.path.join(REFERENCE, "main.py"),
                       run_name="__main__")

    # parse per-step batch_time values from TRAIN lines only
    out = buf.getvalue()
    times = [float(m) for m in re.findall(
        r"Train:.*?Time (\d+\.\d+) \(", out)]
    if len(times) <= args.warmup_steps:
        raise SystemExit(f"too few measured steps: {len(times)}")
    measured = times[args.warmup_steps:]
    sec = sum(measured) / len(measured)
    result = {
        "metric": "reference_cpu_videos_per_sec",
        "sec_per_step": sec,
        "videos_per_sec": (BS + BT) / sec,
        "steps": len(measured),
        "host": "same host as bench.py (1 CPU core)",
        "config": "published flagship, batch 128/74, 5 seg, 2048-d",
    }
    print(json.dumps(result))
    if not args.keep_output:
        import shutil
        os.chdir("/")
        shutil.rmtree(ws, ignore_errors=True)


if __name__ == "__main__":
    main()
