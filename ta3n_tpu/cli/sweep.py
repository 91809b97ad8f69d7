"""Sweep entry point: the full train-CLI flag surface, but training a
(seed × lr × alpha) grid as ONE vmapped program (train/sweep.py).

The reference runs sweeps by editing `script_train_val.sh` and
rerunning per value; here:

    python -m ta3n_tpu.cli.sweep CLASS_FILE MODALITY SRC_LIST TGT_LIST \
        VAL_LIST [train flags...] \
        --sweep_seeds 0 1 2 --sweep_lrs 0.03 0.01 --sweep_alphas 1.0 \
        --sweep_dir exp/sweep/ [--sweep_mesh M]

trains every combination together (one shared data stream; per-member
schedule scalars), prints one JSON line per member with its final
top-1, and writes each member as a standard checkpoint consumable by
--resume, the eval CLI and cli.serve (exp/sweep/member_XX/checkpoint +
sweep.json manifest).  --sweep_mesh M shards the member axis M-way
over the devices; remaining devices data-parallelize within each
member (train/ensemble.py::make_ensemble_mesh).  Measured speedups:
BENCH_NOTES.md "Ensemble training".
"""

from __future__ import annotations

import itertools
import json

import numpy as np

from ta3n_tpu.cli.opts import build_parser, configs_from_args
from ta3n_tpu.data import load_class_names


def main(argv=None):
    parser = build_parser()
    parser.add_argument('--sweep_seeds', type=int, nargs='+', default=[0],
                        help='init/dropout seeds (sweep axis)')
    parser.add_argument('--sweep_lrs', type=float, nargs='+', default=None,
                        help='learning rates (sweep axis; default: --lr)')
    parser.add_argument('--sweep_alphas', type=float, nargs='+',
                        default=None,
                        help='discrepancy weights (sweep axis; default: '
                             '--alpha; the ramp value -1 is not sweepable)')
    parser.add_argument('--sweep_dir', type=str, default=None,
                        help='write member_XX/checkpoint + sweep.json '
                             'under this dir')
    parser.add_argument('--sweep_mesh', type=int, default=0,
                        help='0: single device; M>0: shard the member '
                             'axis M-way, data-parallelize each member '
                             'over the remaining devices')
    parser.add_argument('--sweep_resume', default=False,
                        action='store_true',
                        help='continue a preempted sweep from '
                             '--sweep_dir\'s member checkpoints '
                             '(loaders fast-forwarded: deterministic '
                             'setups reproduce the uninterrupted '
                             'trajectory exactly)')
    args = parser.parse_args(argv)

    import jax as _jax
    prev_prng_impl = _jax.config.jax_default_prng_impl
    _jax.config.update("jax_default_prng_impl", args.prng_impl)
    try:
        return _run(args)
    finally:
        _jax.config.update("jax_default_prng_impl", prev_prng_impl)


def _run(args):
    import jax

    from ta3n_tpu.train.ensemble import make_ensemble_mesh
    from ta3n_tpu.train.loop import build_loaders, class_weights_from_list
    from ta3n_tpu.train.sweep import run_sweep

    lrs = args.sweep_lrs if args.sweep_lrs is not None else [args.lr]
    alphas = (args.sweep_alphas if args.sweep_alphas is not None
              else [args.alpha])
    if any(a < 0 for a in alphas):
        raise SystemExit("--sweep_alphas entries must be >= 0 (the "
                         "epoch-ramp sentinel -1 is a solo-run feature)")
    members = list(itertools.product(args.sweep_seeds, lrs, alphas))

    num_class = len(load_class_names(args.class_file))
    model_cfg, da_cfg, train_cfg = configs_from_args(args, num_class)
    source_loader, target_loader, val_loader, n_src, n_tgt = build_loaders(
        args, model_cfg, train_cfg)
    class_weights = class_weights_from_list(
        args.train_source_list, num_class,
        args.weighted_class_loss == 'Y')
    domain_weights = (np.array([1.0 / n_src, 1.0 / n_tgt], np.float32)
                      if args.weighted_class_loss_DA == 'Y' else None)

    mesh = (make_ensemble_mesh(args.sweep_mesh)
            if args.sweep_mesh > 0 else None)
    out = run_sweep(model_cfg, da_cfg, train_cfg, source_loader,
                    target_loader, val_loader, members,
                    dann_lr_decay=args.lr_adaptive == 'dann', mesh=mesh,
                    class_weights=class_weights,
                    domain_weights=domain_weights,
                    save_dir=args.sweep_dir, arch=args.arch,
                    eval_freq=args.eval_freq, resume=args.sweep_resume,
                    store_dtype=(args.store_dtype
                                 if args.store_dtype != 'float32'
                                 else None))
    for row in out["results"]:
        print(json.dumps(row), flush=True)
    print(json.dumps({"members": len(members),
                      "epochs": train_cfg.epochs,
                      "train_wall_s": out["train_wall_s"],
                      "ensemble_top1": out["ensemble_top1"],
                      "devices": len(jax.devices())}), flush=True)
    return out


if __name__ == '__main__':
    main()
