"""Full published UCF->HMDB_full recipe on synthetic data at real scale.

Runs the exact flagship configuration (script_train_val.sh:10-17,78-101,
136-155: trn-m, TransAttn, attentive entropy, RevGrad Y/Y/Y, SGD 3e-2 with
DANN lr decay, batch 128/74/128, 30 epochs) end-to-end through the Trainer
on class-conditional synthetic features shaped like the real datasets
(12 classes, 2048-d, 1438 source / 840 target / 404 val).  Validates the
recipe's stability and DA behaviour without the real feature stores.

Usage: PYTHONPATH=. python scripts/flagship_dryrun.py [--epochs 30]
"""

import argparse
import tempfile
import time

from ta3n_tpu.config import DAConfig, ModelConfig, TrainConfig
from ta3n_tpu.data import TSNLoader
from ta3n_tpu.data.synthetic import make_synthetic_store
from ta3n_tpu.train.loop import Trainer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--feature_dim", type=int, default=2048)
    ap.add_argument("--shift", type=float, default=1.2)
    # dataset-scale knobs; defaults = UCF->HMDB_full.  Kinetics->Gameplay
    # scale (SURVEY §6: 30 classes, 49,998 videos, 4096-d C3D features):
    #   --num_class 30 --feature_dim 4096 --videos 35000 15000 2998 \
    #   --max_frames 16 --device_store --store_dtype bfloat16
    ap.add_argument("--num_class", type=int, default=12)
    ap.add_argument("--videos", type=int, nargs=3,
                    default=[1438, 840, 404],
                    help="[source, target, val] video counts")
    ap.add_argument("--min_frames", type=int, default=8)
    ap.add_argument("--max_frames", type=int, default=40)
    ap.add_argument("--device_store", action="store_true",
                    help="HBM-resident feature stores, on-device gather")
    ap.add_argument("--steps_per_call", type=int, default=1)
    ap.add_argument("--device_sampler", action="store_true",
                    help="index pipeline on device (no host sampling)")
    ap.add_argument("--store_dtype", default=None,
                    choices=[None, "float32", "bfloat16", "int8"],
                    help="HBM store dtype (device_store only)")
    ap.add_argument("--compilation_cache", type=str, default=None,
                    help="persistent XLA compile cache dir (isolates "
                         "steady-state wall clock from compile time)")
    args = ap.parse_args()
    if args.compilation_cache:
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          args.compilation_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)

    fr = dict(min_frames=args.min_frames, max_frames=args.max_frames)
    src = make_synthetic_store(args.videos[0], args.num_class,
                               args.feature_dim, shift=0.0, seed=0,
                               prefix="src", **fr)
    tgt = make_synthetic_store(args.videos[1], args.num_class,
                               args.feature_dim, shift=args.shift, seed=1,
                               prefix="tgt", **fr)
    val = make_synthetic_store(args.videos[2], args.num_class,
                               args.feature_dim, shift=args.shift, seed=2,
                               prefix="val", **fr)

    cfg = ModelConfig(num_class=args.num_class, baseline_type="video",
                      frame_aggregation="trn-m", train_segments=5,
                      val_segments=5, add_fc=1, fc_dim=512,
                      feature_dim=args.feature_dim, dropout_i=0.5,
                      dropout_v=0.5, use_attn="TransAttn")
    da = DAConfig(use_target="uSv", adv_DA="RevGrad",
                  add_loss_DA="attentive_entropy",
                  place_adv=("Y", "Y", "Y"), place_dis=("N", "Y", "N"))
    tc = TrainConfig(optimizer="SGD", lr=3e-2, lr_adaptive="dann",
                     epochs=args.epochs, batch_size=(128, 74, 128),
                     beta=(0.75, 0.75, 0.5), gamma=0.003,
                     copy_list=("N", "N"))

    ls = TSNLoader(src, batch_size=128, num_segments=5, mode="test", seed=1)
    lt = TSNLoader(tgt, batch_size=74, num_segments=5, mode="test", seed=2)
    lv = TSNLoader(val, batch_size=128, num_segments=5, mode="test",
                   shuffle=False)
    exp = tempfile.mkdtemp(prefix="flagship_")
    trainer = Trainer(cfg, da, tc, ls, lt, lv, path_exp=exp + "/",
                      print_freq=10, show_freq=10, eval_freq=5,
                      save_model=True, use_mesh=False,
                      device_store=args.device_store,
                      steps_per_call=args.steps_per_call,
                      device_sampler=args.device_sampler,
                      store_dtype=args.store_dtype)
    t0 = time.time()
    best = trainer.fit()
    dt = time.time() - t0
    print(f"\nflagship dryrun: best target top-1 {best:.2f}% "
          f"after {args.epochs} epochs in {dt:.1f}s "
          f"({args.epochs * len(ls) / dt:.2f} steps/s incl. host pipeline)")
    print(f"artifacts: {exp}")


if __name__ == "__main__":
    main()
