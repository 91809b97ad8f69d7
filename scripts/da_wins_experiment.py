"""Tune/demonstrate the rotation-shift benchmark where adversarial DA
measurably beats source-only training (VERDICT r1 #4).

Runs the FULL pipeline (Trainer, published-style schedules) twice per
seed — source-only vs full TA3N (trn-m + TransAttn + RevGrad YYY +
attentive entropy) — on make_rotated_domain_pair and prints both target
top-1 accuracies.  Usage:

  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python scripts/da_wins_experiment.py --angle 45 --epochs 30 --seeds 0 1 2
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from ta3n_tpu.config import DAConfig, ModelConfig, TrainConfig
from ta3n_tpu.data import TSNLoader
from ta3n_tpu.data.synthetic import make_rotated_domain_pair
from ta3n_tpu.train.loop import Trainer

SEG, FDIM = 5, 16


def run_one(seed: int, use_da: bool, args) -> float:
    fdim = getattr(args, "feature_dim", FDIM)
    src, tgt, val = make_rotated_domain_pair(
        num_source=args.videos, num_target=args.videos, num_val=args.videos,
        num_class=args.num_class, feature_dim=fdim, angle_deg=args.angle,
        centroid_scale=args.centroid_scale, seed=seed,
        task_seed=0 if args.fix_task else seed)
    cfg = ModelConfig(num_class=args.num_class, baseline_type="video",
                      frame_aggregation="trn-m", train_segments=SEG,
                      val_segments=SEG, fc_dim=args.fc_dim,
                      feature_dim=fdim, use_attn="TransAttn",
                      dropout_i=args.dropout, dropout_v=args.dropout,
                      compute_dtype=args.compute_dtype,
                      use_bn=("AdaBN" if use_da
                              and args.da_variant == "adabn" else "none"),
                      ens_DA=("MCD" if use_da
                              and args.da_variant == "mcd" else "none"))
    if use_da:
        if args.da_variant == "full":
            da = DAConfig(use_target="uSv", adv_DA="RevGrad",
                          add_loss_DA=("none"
                                       if tuple(args.place_adv)
                                       == ("N", "N", "N")
                                       else "attentive_entropy"),
                          place_adv=tuple(args.place_adv))
        elif args.da_variant == "dan":
            da = DAConfig(use_target="uSv", dis_DA="DAN",
                          place_dis=("N", "Y", "N"))
        elif args.da_variant == "jan":
            da = DAConfig(use_target="uSv", dis_DA="JAN",
                          place_dis=("N", "Y", "N"))
        elif args.da_variant == "coral":
            da = DAConfig(use_target="uSv", dis_DA="CORAL",
                          place_dis=("N", "Y", "N"))
        elif args.da_variant == "mcd":
            da = DAConfig(use_target="uSv", ens_DA="MCD")
        elif args.da_variant == "adabn":  # AdaBN via ModelConfig.use_bn
            da = DAConfig(use_target="uSv", adv_DA="RevGrad",
                          place_adv=("Y", "Y", "Y"))
        elif args.da_variant == "sv":  # semi-supervised: target labels
            # join the classification loss (main.py:442-444)
            da = DAConfig(use_target="Sv", adv_DA="RevGrad",
                          place_adv=("Y", "Y", "Y"))
        else:
            raise ValueError(args.da_variant)
    else:
        da = DAConfig(use_target="none")
    bs, bt, bv = getattr(args, "batch", None) or (16, 16, 16)
    tc = TrainConfig(lr=args.lr, epochs=args.epochs,
                     batch_size=(bs, bt, bv),
                     alpha=args.alpha,
                     beta=tuple(args.beta), gamma=args.gamma, mu=args.mu,
                     lr_adaptive="dann" if args.dann_lr else "none")
    ls = TSNLoader(src, batch_size=bs, num_segments=SEG, mode="test",
                   seed=seed + 1)
    lt = TSNLoader(tgt, batch_size=bt, num_segments=SEG, mode="test",
                   seed=seed + 2)
    lv = TSNLoader(val, batch_size=bv, num_segments=SEG, mode="test",
                   shuffle=False)
    tr = Trainer(cfg, da, tc, ls, lt, lv, use_mesh=args.mesh,
                 eval_freq=max(args.epochs // 5, 1), print_freq=10 ** 9,
                 show_freq=10 ** 9, seed=seed,
                 device_store=getattr(args, "device_store", False),
                 steps_per_call=getattr(args, "steps_per_call", 1),
                 device_sampler=getattr(args, "device_sampler", False))
    return tr.fit()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--angle", type=float, default=45.0)
    ap.add_argument("--centroid_scale", type=float, default=2.0)
    ap.add_argument("--videos", type=int, default=64)
    ap.add_argument("--num_class", type=int, default=4)
    ap.add_argument("--fc_dim", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--lr", type=float, default=0.03)
    ap.add_argument("--alpha", type=float, default=1.0,
                    help="discrepancy-loss weight (reference default 1; "
                         "-1 selects the sigmoid ramp, main.py:231)")
    ap.add_argument("--gamma", type=float, default=0.003)
    ap.add_argument("--mu", type=float, default=0.0,
                    help="MCD reverse-GRL strength (reference default 0; "
                         "MCD needs > 0 to act)")
    ap.add_argument("--dropout", type=float, default=0.2)
    ap.add_argument("--fix_task", action="store_true",
                    help="same task geometry for every seed")
    ap.add_argument("--beta", type=float, nargs=3,
                    default=[0.75, 0.75, 0.5])
    ap.add_argument("--place_adv", type=str, nargs=3,
                    default=["Y", "Y", "Y"],
                    help="adversarial placement ablation for the 'full' "
                         "variant: [relation, video, frame] like the "
                         "reference's --place_adv (opts.py:67-68); "
                         "N N N = no adversarial loss (attentive entropy "
                         "is dropped too since the attention weights are "
                         "untrained then)")
    ap.add_argument("--dann_lr", action="store_true")
    ap.add_argument("--compute_dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="accuracy A/B for the bf16 compute path "
                         "(ROADMAP #5)")
    ap.add_argument("--da_variant", default="full",
                    choices=["full", "dan", "jan", "coral", "mcd",
                             "adabn", "sv"],
                    help="which DA mechanism the 'full_ta3n' arm uses "
                         "(VERDICT r1 #4: variants must not regress "
                         "vs source-only)")
    ap.add_argument("--mesh", action="store_true")
    ap.add_argument("--feature_dim", type=int, default=FDIM,
                    help="published widths: 2048 (ResNet-101 features) "
                         "with --fc_dim 512 (VERDICT r3 #6)")
    ap.add_argument("--batch", type=int, nargs=3, default=None,
                    metavar=("BS", "BT", "BV"),
                    help="source/target/val batch sizes (published: "
                         "128 74 128)")
    ap.add_argument("--device_store", action="store_true",
                    help="HBM-resident stores + on-device gather (the "
                         "production TPU mode)")
    ap.add_argument("--steps_per_call", type=int, default=1)
    ap.add_argument("--device_sampler", action="store_true")
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--source_cache", type=str, default=None,
                    help="JSON file caching source-only accuracies per "
                         "(seed, benchmark, lr) so hyper-parameter sweeps "
                         "of the DA arm don't retrain the baseline")
    args = ap.parse_args()

    cache = {}
    if args.source_cache:
        import os
        if os.path.exists(args.source_cache):
            with open(args.source_cache) as f:
                cache = json.load(f)

    def cached_source_only(seed):
        # key over EVERY flag that changes the source-only arm
        key = (f"s{seed}_a{args.angle}_v{args.videos}_e{args.epochs}"
               f"_lr{args.lr}_c{args.centroid_scale}_d{args.dropout}"
               f"_fc{args.fc_dim}_nc{args.num_class}_g{args.gamma}"
               f"_dl{int(args.dann_lr)}_m{int(args.mesh)}"
               f"_ft{int(args.fix_task)}_ct{args.compute_dtype}"
               f"_fd{args.feature_dim}_b{args.batch}")
        if key not in cache:
            cache[key] = run_one(seed, False, args)
            if args.source_cache:
                with open(args.source_cache, "w") as f:
                    json.dump(cache, f)
        return cache[key]

    rows = []
    for seed in args.seeds:
        src_only = cached_source_only(seed)
        full_da = run_one(seed, True, args)
        rows.append({"seed": seed, "source_only": src_only,
                     "full_ta3n": full_da, "gain": full_da - src_only})
        print(json.dumps(rows[-1]))
    gains = [r["gain"] for r in rows]
    print(json.dumps({"min_gain": min(gains),
                      "mean_gain": float(np.mean(gains)),
                      "angle": args.angle, "epochs": args.epochs,
                      "variant": args.da_variant, "alpha": args.alpha,
                      "lr": args.lr, "place_adv": list(args.place_adv),
                      "compute_dtype": args.compute_dtype}))


if __name__ == "__main__":
    main()
