"""Profile the vmapped ensemble multi-step and bucket device time.

Companion to scripts/profile_step.py (reuses its xplane parsing and op
buckets) for the ensemble path: explains where the N-member flagship
step spends device time — e.g. why N=8 members at the published batch
cost near-linear (BENCH_NOTES.md "Ensemble training").

Usage (TPU):
  PYTHONPATH=.:/root/.axon_site:scripts python scripts/profile_ensemble.py \
      --n 8 --k 8 --calls 3
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys
import tempfile

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from profile_step import bucket  # noqa: E402  (shared op buckets)

BS, BT, SEG, FDIM, NCLASS = 128, 74, 5, 2048, 12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8, help="ensemble members")
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--calls", type=int, default=3)
    ap.add_argument("--bs", type=int, default=BS)
    ap.add_argument("--bt", type=int, default=BT)
    ap.add_argument("--fc", type=int, default=512)
    ap.add_argument("--fdim", type=int, default=FDIM)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()
    jax.config.update("jax_default_prng_impl", "rbg")

    from ta3n_tpu.config import DAConfig, ModelConfig, TrainConfig
    from ta3n_tpu.models import VideoModel
    from ta3n_tpu.train import StepScalars
    from ta3n_tpu.train.ensemble import (create_ensemble_state,
                                         ensemble_keys,
                                         make_ensemble_multi_step,
                                         stack_scalars)

    n, k = args.n, args.k
    cfg = ModelConfig(num_class=NCLASS, baseline_type="video",
                      frame_aggregation="trn-m", train_segments=SEG,
                      val_segments=SEG, fc_dim=args.fc,
                      feature_dim=args.fdim, use_attn="TransAttn",
                      dropout_i=0.5, dropout_v=0.5)
    da = DAConfig(use_target="uSv", adv_DA="RevGrad",
                  add_loss_DA="attentive_entropy",
                  place_adv=("Y", "Y", "Y"))
    tc = TrainConfig(optimizer="SGD", lr=0.03,
                     batch_size=(args.bs, args.bt, args.bs))
    model = VideoModel(cfg)

    g = np.random.default_rng(0)
    store_s = jax.device_put(
        g.normal(size=(20000, args.fdim)).astype(np.float32))
    store_t = jax.device_put(
        g.normal(size=(12000, args.fdim)).astype(np.float32))
    idx_s = g.integers(0, 20000, size=(k, n, args.bs, SEG)).astype(np.int32)
    idx_t = g.integers(0, 12000, size=(k, n, args.bt, SEG)).astype(np.int32)
    ys = g.integers(0, NCLASS, size=(k, n, args.bs)).astype(np.int32)
    yt = g.integers(0, NCLASS, size=(k, n, args.bt)).astype(np.int32)
    ms = np.ones((k, n, args.bs), np.float32)
    mt = np.ones((k, n, args.bt), np.float32)
    one = StepScalars(np.float32([0.75, 0.75, 0.5]), np.float32(0.0),
                      np.float32(0.0), np.float32(0.003),
                      np.float32(0.03))
    sc_n = stack_scalars([one] * n)
    sc = jax.tree_util.tree_map(
        lambda x: np.broadcast_to(np.asarray(x), (k,) + x.shape).copy(),
        sc_n)
    keys = ensemble_keys(range(n))
    state = create_ensemble_state(model, range(n), args.bs, args.bt, tc)
    multi = make_ensemble_multi_step(model, da, tc, per_member_data=True)

    for _ in range(2):
        state, m = multi(state, store_s, idx_s, ys, ms, store_t, idx_t,
                         yt, mt, sc, keys)
    float(m["loss"][k - 1, n - 1])

    tdir = tempfile.mkdtemp(prefix="ta3n_ens_prof_")
    jax.profiler.start_trace(tdir)
    for _ in range(args.calls):
        state, m = multi(state, store_s, idx_s, ys, ms, store_t, idx_t,
                         yt, mt, sc, keys)
    float(m["loss"][k - 1, n - 1])
    jax.profiler.stop_trace()

    paths = glob.glob(os.path.join(tdir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane under {tdir}"
    data = jax.profiler.ProfileData.from_serialized_xspace(
        open(paths[0], "rb").read())
    per_op = collections.Counter()
    occurrences = collections.Counter()
    full_text = {}
    for plane in data.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev.name.split(" = ")[0]
                if name.startswith("%while"):
                    continue
                per_op[name] += ev.duration_ns / 1e3
                occurrences[name] += 1
                full_text.setdefault(name, ev.name)

    total = sum(per_op.values())
    nsteps = args.calls * k
    print(f"\nN={n} members: {len(per_op)} distinct ops, device total "
          f"{total:.0f} us over {nsteps} ensemble-steps = "
          f"{total / nsteps:.1f} us/ensemble-step "
          f"({total / nsteps / n:.1f} us/member-step)\n")
    print(f"{'us/step':>9}  {'%':>5}  {'count':>6}  op")
    for name, us in per_op.most_common(args.top):
        print(f"{us / nsteps:9.2f}  {100 * us / total:5.1f}  "
              f"{occurrences[name]:6d}  {full_text[name][:110]}")
    by_bucket = collections.Counter()
    for name, us in per_op.items():
        by_bucket[bucket(name)] += us
    print("\nbuckets (us/ensemble-step):")
    for b, us in by_bucket.most_common():
        print(f"  {b:16s} {us / nsteps:8.2f}  ({100 * us / total:.1f}%)")
    print(f"\ntrace dir: {tdir}")


if __name__ == "__main__":
    main()
