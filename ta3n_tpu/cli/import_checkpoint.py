"""Convert a reference PyTorch checkpoint (.pth.tar) into a TA3N-TPU
checkpoint directory (orbax), so all tools (train --resume, test_models,
serve) consume it natively.

    python -m ta3n_tpu.cli.import_checkpoint ref/model_best.pth.tar out_dir
"""

from __future__ import annotations

import argparse
import os

from ta3n_tpu.io_utils.checkpoint import save_checkpoint
from ta3n_tpu.io_utils.torch_import import load_torch_checkpoint


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("weights", help="reference .pth.tar checkpoint")
    p.add_argument("out_dir", help="output experiment dir (checkpoint/ "
                                   "is created inside)")
    p.add_argument("--arch", default="resnet101")
    args = p.parse_args(argv)

    params, batch_stats, meta = load_torch_checkpoint(args.weights)
    payload = {
        "epoch": int(meta.get("epoch") or 0),
        "arch": meta.get("arch") or args.arch,
        "params": params,
        "batch_stats": batch_stats,
        "opt_state": {},
        "best_prec1": float(meta.get("best_prec1") or 0.0),
        "prec1": float(meta.get("prec1") or 0.0),
    }
    path = save_checkpoint(args.out_dir, payload, is_best=True)
    n = sum(getattr(v, "size", 0) for v in
            __import__("jax").tree_util.tree_leaves(params))
    print(f"imported {n:,} parameters (epoch {payload['epoch']}, "
          f"prec1 {payload['prec1']}) -> {path} (+ model_best)")
    return path


if __name__ == "__main__":
    main()
