"""Training entry point — the reference `main.py` CLI, TPU-native.

Usage parity:
    python -m ta3n_tpu.cli.train CLASS_FILE MODALITY SRC_LIST TGT_LIST \
        VAL_LIST [flags...]
(plus --store_source/--store_target/--store_val pointing at packed
FeatureStore dirs; see ta3n_tpu/cli/convert_features.py for producing them
from the reference's .t7 layout).
"""

from __future__ import annotations

import os
import time

import numpy as np

from ta3n_tpu.cli.opts import build_parser, configs_from_args
from ta3n_tpu.data import load_class_names
from ta3n_tpu.io_utils import LogFiles
from ta3n_tpu.train.loop import (Trainer, build_loaders,
                                 class_weights_from_list)


def main(argv=None):
    args = build_parser().parse_args(argv)

    # persistent XLA compilation cache — the TPU analogue of
    # cudnn.benchmark autotune caching (main.py:108)
    if args.compilation_cache:
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          args.compilation_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # dropout RNG implementation (must be set before any PRNGKey is made;
    # rbg measured +10% step throughput on TPU — BENCH_NOTES.md).  The
    # flag is process-global jax config, so restore it on return: tests
    # and applications call main() in-process, and leaking rbg into the
    # caller silently changes every later PRNG stream (found as an
    # order-dependent DAN-trajectory shift in the full suite).
    import jax as _jax
    prev_prng_impl = _jax.config.jax_default_prng_impl
    _jax.config.update("jax_default_prng_impl", args.prng_impl)
    try:
        return _run(args)
    finally:
        _jax.config.update("jax_default_prng_impl", prev_prng_impl)


def _run(args):
    print('Baseline:', args.baseline_type)
    print('Frame aggregation method:', args.frame_aggregation)
    print('target data usage:', args.use_target)
    if args.use_target == 'none':
        print('no Domain Adaptation')

    class_names = load_class_names(args.class_file)
    num_class = len(class_names)
    model_cfg, da_cfg, train_cfg = configs_from_args(args, num_class)

    path_exp = args.exp_path + args.modality + '/'
    os.makedirs(path_exp, exist_ok=True)

    source_loader, target_loader, val_loader, n_src, n_tgt = build_loaders(
        args, model_cfg, train_cfg)

    class_weights = class_weights_from_list(
        args.train_source_list, num_class,
        args.weighted_class_loss == 'Y')
    domain_weights = (np.array([1.0 / n_src, 1.0 / n_tgt], np.float32)
                      if args.weighted_class_loss_DA == 'Y' else None)

    logs = LogFiles(path_exp, resume=bool(args.resume),
                    best_log=args.save_best_log) if not args.evaluate \
        else None

    trainer = Trainer(model_cfg, da_cfg, train_cfg, source_loader,
                      target_loader, val_loader, path_exp=path_exp,
                      class_weights=class_weights,
                      domain_weights=domain_weights, log_files=logs,
                      print_freq=args.print_freq, show_freq=args.show_freq,
                      eval_freq=args.eval_freq, save_model=args.save_model,
                      save_attention=args.save_attention,
                      tensorboard_dir=(path_exp + 'tensorboard'
                                       if args.tensorboard else None),
                      profile_dir=args.profile_dir,
                      num_devices=args.num_devices,
                      device_store=args.device_store,
                      steps_per_call=args.steps_per_call,
                      store_budget_rows=args.store_budget_rows or None,
                      store_dtype=args.store_dtype,
                      device_sampler=args.device_sampler,
                      accum_steps=args.accum_steps,
                      model_parallel=args.model_parallel,
                      nan_guard=not args.no_nan_guard,
                      seed=args.seed,
                      prefetch_depth=max(1, args.workers))

    if args.resume:
        if os.path.isdir(args.resume):
            start = trainer.resume(args.resume, args.resume_hp)
            print(f"=> loaded checkpoint '{args.resume}' "
                  f"(epoch {start - 1})")
        else:
            print(f"=> no checkpoint found at '{args.resume}'")

    if args.evaluate:
        print('evaluation only......')
        prec1 = trainer.validate(0)
        print('%.3f' % prec1)
        return prec1

    print('start training......')
    start_train = time.time()
    best = trainer.fit()
    total = time.time() - start_train
    print('total training time:', total)
    if logs:
        logs.write_total_time(total)
        logs.close()
    return best


if __name__ == '__main__':
    main()
