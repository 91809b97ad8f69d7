"""Sweep driver over the vmapped ensemble (train/ensemble.py): every
(seed, lr, alpha) combination trains as one member of ONE jitted
program on the rotation-shift DA benchmark — the sweep the reference
(and our own da_wins_experiment.py) runs as sequential processes.

Protocol matches da_wins_experiment.py's full/dan arms: published-style
schedules (fixed beta by default, optional DANN lr decay), one shared
data stream for every member (classic seed-variance protocol: only
init/dropout seeds and hyper-parameters differ), device-store gather
with epoch-sized K-step dispatches, final top-1 on the val split per
member via the vmapped eval step.

Usage (CPU mesh):
  PYTHONPATH=.:/root/.axon_site PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python scripts/ensemble_sweep.py --angle 60 --centroid_scale 4 \
    --videos 128 --epochs 120 --da_variant dan --seeds 0 1 2 \
    --lrs 0.03 --alphas 0.05 0.2 1.0 --mesh
"""

from __future__ import annotations

import argparse
import itertools
import json

import jax

from ta3n_tpu.config import DAConfig, ModelConfig, TrainConfig
from ta3n_tpu.data import TSNLoader
from ta3n_tpu.data.synthetic import make_rotated_domain_pair
from ta3n_tpu.train.ensemble import make_ensemble_mesh
from ta3n_tpu.train.sweep import run_sweep

SEG, FDIM = 5, 16


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--angle", type=float, default=60.0)
    ap.add_argument("--centroid_scale", type=float, default=4.0)
    ap.add_argument("--videos", type=int, default=128)
    ap.add_argument("--num_class", type=int, default=4)
    ap.add_argument("--fc_dim", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=120)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--dropout", type=float, default=0.2)
    ap.add_argument("--data_seed", type=int, default=0,
                    help="dataset geometry seed (shared by all members)")
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2],
                    help="init/dropout seeds (sweep axis)")
    ap.add_argument("--lrs", type=float, nargs="+", default=[0.03],
                    help="learning rates (sweep axis)")
    ap.add_argument("--alphas", type=float, nargs="+", default=[1.0],
                    help="discrepancy weights (sweep axis; full variant "
                         "ignores alpha)")
    ap.add_argument("--gamma", type=float, default=0.003)
    ap.add_argument("--beta", type=float, nargs=3,
                    default=[0.75, 0.75, 0.5])
    ap.add_argument("--dann_lr", action="store_true")
    ap.add_argument("--da_variant", default="full",
                    choices=["full", "dan", "jan", "coral", "source_only"])
    ap.add_argument("--mesh", action="store_true",
                    help="shard the member axis over all devices")
    ap.add_argument("--save_dir", type=str, default=None,
                    help="write each member as a solo-shaped checkpoint "
                         "under DIR/member_XX/ (+ sweep.json manifest) — "
                         "consumable by --resume, the eval CLI and "
                         "cli.serve like any training checkpoint")
    ap.add_argument("--eval_freq", type=int, default=0,
                    help=">0: validate every E epochs and track each "
                         "member's best (model_best checkpoints with "
                         "--save_dir); 0: final-only validation")
    args = ap.parse_args()

    src, tgt, val = make_rotated_domain_pair(
        num_source=args.videos, num_target=args.videos,
        num_val=args.videos, num_class=args.num_class, feature_dim=FDIM,
        angle_deg=args.angle, centroid_scale=args.centroid_scale,
        seed=args.data_seed, task_seed=args.data_seed)

    cfg = ModelConfig(num_class=args.num_class, baseline_type="video",
                      frame_aggregation="trn-m", train_segments=SEG,
                      val_segments=SEG, fc_dim=args.fc_dim,
                      feature_dim=FDIM, use_attn="TransAttn",
                      dropout_i=args.dropout, dropout_v=args.dropout)
    if args.da_variant == "full":
        da = DAConfig(use_target="uSv", adv_DA="RevGrad",
                      add_loss_DA="attentive_entropy",
                      place_adv=("Y", "Y", "Y"))
    elif args.da_variant == "source_only":
        da = DAConfig(use_target="none")
    else:
        da = DAConfig(use_target="uSv",
                      dis_DA=args.da_variant.upper(),
                      place_dis=("N", "Y", "N"))

    members = list(itertools.product(args.seeds, args.lrs, args.alphas))
    n = len(members)
    tc = TrainConfig(lr=args.lrs[0], epochs=args.epochs,
                     batch_size=(args.batch, args.batch, args.batch),
                     beta=tuple(args.beta), gamma=args.gamma)

    mesh = make_ensemble_mesh(len(jax.devices())) if args.mesh else None
    ls = TSNLoader(src, batch_size=args.batch, num_segments=SEG,
                   mode="random", seed=args.data_seed + 1)
    lt = TSNLoader(tgt, batch_size=args.batch, num_segments=SEG,
                   mode="random", seed=args.data_seed + 2)
    lv = TSNLoader(val, batch_size=args.batch, num_segments=SEG,
                   mode="test", shuffle=False)

    out = run_sweep(cfg, da, tc, ls, lt, lv, members,
                    dann_lr_decay=args.dann_lr, mesh=mesh,
                    save_dir=args.save_dir, eval_freq=args.eval_freq)
    for row in out["results"]:
        print(json.dumps(row), flush=True)
    print(json.dumps({"members": n, "epochs": args.epochs,
                      "train_wall_s": out["train_wall_s"],
                      "ensemble_top1": out["ensemble_top1"],
                      "da_variant": args.da_variant,
                      "note": f"{n} runs trained as one vmapped program "
                              f"({'mesh-sharded' if args.mesh else '1 dev'})"
                      }), flush=True)


if __name__ == "__main__":
    main()
