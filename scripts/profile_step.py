"""Profile the flagship production-mode train step and bucket device time.

Runs the device-store K-steps-per-dispatch multi-step under a
jax.profiler trace, then parses the xplane with jax.profiler.ProfileData
and prints per-op device-time totals (top ops + bucket summary), so
fusion work targets the real hot spots instead of guesses.

Usage (TPU):
  PYTHONPATH=.:/root/.axon_site python scripts/profile_step.py --calls 3
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

BS, BT, SEG, FDIM, NCLASS = 128, 74, 5, 2048, 12


def build_step(k: int, compute_dtype: str, store_dtype: str = "float32",
               unroll: int = 1, combined: bool = False,
               bs: int = BS, bt: int = BT):
    from ta3n_tpu.config import DAConfig, ModelConfig, TrainConfig
    from ta3n_tpu.models import VideoModel
    from ta3n_tpu.train import StepScalars, create_train_state
    from ta3n_tpu.train.step import make_multi_train_step

    cfg = ModelConfig(num_class=NCLASS, baseline_type="video",
                      frame_aggregation="trn-m", train_segments=SEG,
                      val_segments=SEG, fc_dim=512, feature_dim=FDIM,
                      use_attn="TransAttn", dropout_i=0.5, dropout_v=0.5,
                      compute_dtype=compute_dtype)
    da = DAConfig(use_target="uSv", adv_DA="RevGrad",
                  add_loss_DA="attentive_entropy",
                  place_adv=("Y", "Y", "Y"))
    tc = TrainConfig(optimizer="SGD", lr=0.03, batch_size=(bs, bt, bs))
    model = VideoModel(cfg)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, rng, bs, bt, tc)
    step = make_multi_train_step(
        model, da, tc, unroll=unroll,
        combined_store_rows=20000 if combined else None)

    g = np.random.default_rng(0)
    if np.dtype(store_dtype) == np.int8:
        from ta3n_tpu.data.quantized import quantize_rows

        def put_store(rows):
            q, s = quantize_rows(rows)
            return (jax.device_put(jnp.asarray(q)),
                    jax.device_put(jnp.asarray(s)))
        store_s = put_store(
            g.normal(size=(20000, FDIM)).astype(np.float32))
        store_t = put_store(
            g.normal(size=(12000, FDIM)).astype(np.float32))
    else:
        sdt = jnp.dtype(store_dtype)
        store_s = jax.device_put(jnp.asarray(
            g.normal(size=(20000, FDIM)).astype(np.float32), dtype=sdt))
        store_t = jax.device_put(jnp.asarray(
            g.normal(size=(12000, FDIM)).astype(np.float32), dtype=sdt))
    idx_s = g.integers(0, 20000, size=(k, bs, SEG)).astype(np.int32)
    ys = g.integers(0, NCLASS, size=(k, bs)).astype(np.int32)
    ms = np.ones((k, bs), np.float32)
    idx_t = g.integers(0, 12000, size=(k, bt, SEG)).astype(np.int32)
    yt = g.integers(0, NCLASS, size=(k, bt)).astype(np.int32)
    mt = np.ones((k, bt), np.float32)
    if combined:
        store = jnp.concatenate([store_s, store_t], axis=0)
        args = (store, idx_s, ys, ms, idx_t, yt, mt)
    else:
        args = (store_s, idx_s, ys, ms, store_t, idx_t, yt, mt)
    sc = StepScalars(np.tile(np.float32([0.75, 0.75, 0.5]), (k, 1)),
                     np.zeros(k, np.float32), np.zeros(k, np.float32),
                     np.full(k, 0.003, np.float32),
                     np.full(k, 0.03, np.float32))
    return state, step, args, sc, rng


BUCKETS = [
    ("pallas_trn", re.compile(r"trn|_fwd_kernel|_bwd_kernel", re.I)),
    ("matmul", re.compile(r"^(dot|.*\bdot\b)|convert_matmul", re.I)),
    ("fusion", re.compile(r"^(loop_)?fusion")),
    ("copy/transpose", re.compile(r"copy|transpose|bitcast", re.I)),
    ("rng", re.compile(r"rng|threefry|multiply_select", re.I)),
    ("gather/scatter", re.compile(r"gather|scatter|dynamic", re.I)),
    ("reduce", re.compile(r"reduce|all_reduce", re.I)),
]


def bucket(name: str) -> str:
    for b, pat in BUCKETS:
        if pat.search(name):
            return b
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--calls", type=int, default=3)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--prng_impl", default="rbg",
                    help="match bench.py's default (rbg)")
    ap.add_argument("--store_dtype", default="float32")
    ap.add_argument("--unroll", type=int, default=1)
    ap.add_argument("--combined", action="store_true",
                    help="combined-store fast path (one packed store, "
                         "one flat gather)")
    ap.add_argument("--bs", type=int, default=128,
                    help="source batch (batch-scaling profiles)")
    ap.add_argument("--bt", type=int, default=74)
    args = ap.parse_args()
    jax.config.update("jax_default_prng_impl", args.prng_impl)

    state, step, sargs, sc, rng = build_step(args.k, args.dtype,
                                             args.store_dtype,
                                             args.unroll, args.combined,
                                             args.bs, args.bt)

    # compile + warm
    for _ in range(2):
        state, m = step(state, *sargs, sc, rng)
    float(m["loss"][args.k - 1])

    tdir = tempfile.mkdtemp(prefix="ta3n_prof_")
    jax.profiler.start_trace(tdir)
    for _ in range(args.calls):
        state, m = step(state, *sargs, sc, rng)
    float(m["loss"][args.k - 1])  # force real execution inside the trace
    jax.profiler.stop_trace()

    paths = glob.glob(os.path.join(tdir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane under {tdir}"
    data = jax.profiler.ProfileData.from_serialized_xspace(
        open(paths[0], "rb").read())

    # Only the synchronous 'XLA Ops' line: 'Async XLA Ops' (DMA prefetch)
    # overlaps compute and the enclosing scan %while double-counts its body.
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
    nsteps = args.calls * args.k
    print(f"\ntrace: {len(per_op)} distinct ops, device total "
          f"{total:.0f} us over {nsteps} steps = {total / nsteps:.1f} "
          f"us/step\n")
    print(f"{'us/step':>9}  {'%':>5}  {'count':>6}  op")
    for name, us in per_op.most_common(args.top):
        print(f"{us / nsteps:9.2f}  {100 * us / total:5.1f}  "
              f"{occurrences[name]:6d}  {full_text[name][:110]}")

    by_bucket = collections.Counter()
    for name, us in per_op.items():
        by_bucket[bucket(name)] += us
    print("\nbuckets (us/step):")
    for b, us in by_bucket.most_common():
        print(f"  {b:16s} {us / nsteps:8.2f}  ({100 * us / total:.1f}%)")
    print(f"\ntrace dir: {tdir}")


if __name__ == "__main__":
    main()
