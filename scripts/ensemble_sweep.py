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
import time

import jax
import numpy as np

from ta3n_tpu.config import DAConfig, ModelConfig, TrainConfig
from ta3n_tpu.data import TSNLoader
from ta3n_tpu.data.synthetic import make_rotated_domain_pair
from ta3n_tpu.parallel import make_mesh
from ta3n_tpu.train import StepScalars
from ta3n_tpu.train.ensemble import (create_ensemble_state, ensemble_keys,
                                     make_ensemble_eval_step,
                                     make_ensemble_multi_step,
                                     stack_scalars)
from ta3n_tpu.train.schedules import dann_lr, effective_beta, progress

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
    from ta3n_tpu.models import VideoModel
    model = VideoModel(cfg)
    tc = TrainConfig(lr=args.lrs[0], epochs=args.epochs,
                     batch_size=(args.batch, args.batch, args.batch))

    mesh = make_mesh() if args.mesh else None
    if mesh is not None and n % len(jax.devices()) != 0:
        # member axis must divide the mesh; pad with throwaway members
        pad = -n % len(jax.devices())
        members += members[:1] * pad
        print(f"# padded {n} members to {len(members)} "
              f"(mesh size {len(jax.devices())})")

    seeds = [m[0] for m in members]
    state = create_ensemble_state(model, seeds, args.batch, args.batch, tc)
    keys = ensemble_keys(seeds)
    multi = make_ensemble_multi_step(model, da, tc, mesh=mesh)
    ls = TSNLoader(src, batch_size=args.batch, num_segments=SEG,
                   mode="random", seed=args.data_seed + 1)
    lt = TSNLoader(tgt, batch_size=args.batch, num_segments=SEG,
                   mode="random", seed=args.data_seed + 2)
    spe = min(len(ls), len(lt))
    total_steps = spe * args.epochs
    store_s = jax.device_put(np.ascontiguousarray(src.features))
    store_t = jax.device_put(np.ascontiguousarray(tgt.features))

    t0 = time.time()
    gstep = 0
    for epoch in range(1, args.epochs + 1):
        # one dispatch per epoch: stack spe steps of shared index batches
        # + per-member schedule scalars [spe, N]
        bs_s = list(itertools.islice(ls.index_epoch(), spe))
        bs_t = list(itertools.islice(lt.index_epoch(), spe))
        idx_s = np.stack([b.abs_indices for b in bs_s])
        ys = np.stack([b.labels for b in bs_s])
        ms = np.stack([b.mask for b in bs_s])
        idx_t = np.stack([b.abs_indices for b in bs_t])
        yt = np.stack([b.labels for b in bs_t])
        mt = np.stack([b.mask for b in bs_t])
        # all-numpy scalar stacking: stack_scalars stacks on the host, so
        # the [spe, N] schedule block ships with the ONE dispatch below
        # (no per-step device round-trips)
        sc_steps = []
        for i in range(spe):
            p = progress(gstep + i, 0, total_steps)
            beta = np.float32(effective_beta(args.beta, p))
            per_member = [StepScalars(
                beta, np.float32(0.0), np.float32(alpha),
                np.float32(args.gamma),
                np.float32(dann_lr(lr, p) if args.dann_lr else lr))
                for (_, lr, alpha) in members]
            sc_steps.append(stack_scalars(per_member))
        sc = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *sc_steps)
        state, metrics = multi(state, store_s, idx_s, ys, ms, store_t,
                               idx_t, yt, mt, sc, keys)
        gstep += spe
    train_s = time.time() - t0

    # vmapped validation: every member scores the val split in one
    # dispatch per batch
    ev = make_ensemble_eval_step(model, gather_on_device=True, mesh=mesh)
    lv = TSNLoader(val, batch_size=args.batch, num_segments=SEG,
                   mode="test", shuffle=False)
    store_v = jax.device_put(np.ascontiguousarray(val.features))
    hits = np.zeros(len(members))
    count = np.zeros(len(members))
    for b in lv.index_epoch():
        m = ev(state.params, state.batch_stats, store_v,
               b.abs_indices, b.labels, b.mask)
        hits += np.asarray(m["top1"])
        count += np.asarray(m["n"])
    top1 = 100.0 * hits / np.maximum(count, 1)

    for k, (seed, lr, alpha) in enumerate(members[:n]):
        print(json.dumps({"seed": seed, "lr": lr, "alpha": alpha,
                          "top1": round(float(top1[k]), 2)}), flush=True)

    if args.save_dir:
        import os

        from ta3n_tpu.io_utils import save_checkpoint
        from ta3n_tpu.train.ensemble import extract_member

        manifest = []
        for k, (seed, lr, alpha) in enumerate(members[:n]):
            member = extract_member(state, k)
            d = os.path.join(args.save_dir, f"member_{k:02d}")
            save_checkpoint(d + "/", {
                "epoch": args.epochs, "arch": "none",
                "params": member.params,
                "batch_stats": member.batch_stats,
                "opt_state": member.opt_state,
                "best_prec1": float(top1[k]), "prec1": float(top1[k]),
                "step": int(member.step),
            }, is_best=False)
            manifest.append({"member": k, "seed": seed, "lr": lr,
                             "alpha": alpha,
                             "top1": round(float(top1[k]), 2),
                             "checkpoint": d + "/checkpoint"})
        with open(os.path.join(args.save_dir, "sweep.json"), "w") as f:
            json.dump(manifest, f, indent=1)
        print(f"# saved {n} member checkpoints -> {args.save_dir}",
              flush=True)
    print(json.dumps({"members": n, "epochs": args.epochs,
                      "train_wall_s": round(train_s, 1),
                      "da_variant": args.da_variant,
                      "note": f"{n} runs trained as one vmapped program "
                              f"({'mesh-sharded' if args.mesh else '1 dev'})"
                      }), flush=True)


if __name__ == "__main__":
    main()
