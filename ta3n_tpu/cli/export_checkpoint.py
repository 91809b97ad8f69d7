"""Export a TA3N-TPU checkpoint directory as a reference-format PyTorch
.pth.tar — the inverse of cli/import_checkpoint.py, so a model trained
here can be evaluated / fine-tuned by the reference's own torch tooling
(its strict load_state_dict incl. the DataParallel 'module.' prefix,
test_models.py:89-90; checkpoint dict layout main.py:764-770).

    python -m ta3n_tpu.cli.export_checkpoint exp/RGB/model_best out.pth.tar
"""

from __future__ import annotations

import argparse

from ta3n_tpu.io_utils.checkpoint import load_checkpoint
from ta3n_tpu.io_utils.torch_export import save_torch_checkpoint


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint", help="TA3N-TPU checkpoint dir "
                                      "(e.g. exp/RGB/model_best)")
    p.add_argument("out", help="output .pth.tar path")
    p.add_argument("--arch", default="resnet101")
    p.add_argument("--no_module_prefix", action="store_true",
                   help="omit the DataParallel 'module.' key prefix")
    args = p.parse_args(argv)

    payload = load_checkpoint(args.checkpoint)
    save_torch_checkpoint(
        args.out, payload["params"], payload.get("batch_stats") or {},
        epoch=int(payload.get("epoch") or 0),
        arch=str(payload.get("arch") or args.arch),
        best_prec1=float(payload.get("best_prec1") or 0.0),
        prec1=float(payload.get("prec1") or 0.0),
        module_prefix=not args.no_module_prefix)
    import jax
    n = sum(getattr(v, "size", 0)
            for v in jax.tree_util.tree_leaves(payload["params"]))
    print(f"exported {n:,} parameters (epoch {payload.get('epoch')}) "
          f"-> {args.out}")
    return args.out


if __name__ == "__main__":
    main()
