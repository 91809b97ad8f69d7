"""Ensemble-training throughput A/B on the TPU: N members in one
vmapped program vs N sequential runs.

The flagship step is op-count-bound (~270 us over ~800 ops,
BENCH_NOTES.md "Speed-of-light accounting"): its GEMMs are far below
MXU saturation, so vmapping a member axis onto every GEMM should cost
far less than N sequential runs.  This measures it honestly at the
published UCF->HMDB_full config (trn-m, TransAttn, attentive entropy,
RevGrad x3, batch 128/74, 5 segments, 2048-d) on the device-store path
with PER-MEMBER index batches (true sweep semantics: every member
trains on its own stream).

Timing: bench.py methodology — K steps per dispatch, execution forced
by fetching the last step's loss (block_until_ready lies on this
runtime), one measured roundtrip subtracted, best of WINDOWS.

Usage:  python scripts/bench_ensemble.py            # N sweep from env
        TA3N_ENS_N="1 8" python scripts/bench_ensemble.py
"""

import json
import os
import time

import jax
import numpy as np

jax.config.update("jax_default_prng_impl", "rbg")

BS = int(os.environ.get("TA3N_BENCH_BS", 128))
BT = int(os.environ.get("TA3N_BENCH_BT", 74))
SEG = int(os.environ.get("TA3N_BENCH_SEG", 5))
FDIM = int(os.environ.get("TA3N_BENCH_FDIM", 2048))
NCLASS = int(os.environ.get("TA3N_BENCH_NCLASS", 12))
FC = int(os.environ.get("TA3N_BENCH_FC", 512))
K = int(os.environ.get("TA3N_BENCH_K", 16))
N_LIST = [int(n) for n in os.environ.get("TA3N_ENS_N", "1 2 4 8").split()]
WARMUP, CALLS, WINDOWS = 2, 10, 3
STORE_S_ROWS, STORE_T_ROWS = 20000, 12000


from ta3n_tpu.timing import measure_roundtrip  # noqa: E402 — shared warm-roundtrip helper


def main():
    from ta3n_tpu.config import DAConfig, ModelConfig, TrainConfig
    from ta3n_tpu.train import StepScalars
    from ta3n_tpu.models import VideoModel
    from ta3n_tpu.train.ensemble import (create_ensemble_state,
                                         ensemble_keys,
                                         make_ensemble_multi_step,
                                         stack_scalars)

    cfg = ModelConfig(num_class=NCLASS, baseline_type="video",
                      frame_aggregation="trn-m", train_segments=SEG,
                      val_segments=SEG, fc_dim=FC, feature_dim=FDIM,
                      use_attn="TransAttn", dropout_i=0.5, dropout_v=0.5)
    da = DAConfig(use_target="uSv", adv_DA="RevGrad",
                  add_loss_DA="attentive_entropy",
                  place_adv=("Y", "Y", "Y"))
    tc = TrainConfig(optimizer="SGD", lr=0.03, epochs=30,
                     batch_size=(BS, BT, BS))
    model = VideoModel(cfg)

    g = np.random.default_rng(0)
    store_s = jax.device_put(
        g.normal(size=(STORE_S_ROWS, FDIM)).astype(np.float32))
    store_t = jax.device_put(
        g.normal(size=(STORE_T_ROWS, FDIM)).astype(np.float32))
    rt = measure_roundtrip()
    results = {}

    for n in N_LIST:
        idx_s = g.integers(0, STORE_S_ROWS,
                           size=(K, n, BS, SEG)).astype(np.int32)
        idx_t = g.integers(0, STORE_T_ROWS,
                           size=(K, n, BT, SEG)).astype(np.int32)
        ys = g.integers(0, NCLASS, size=(K, n, BS)).astype(np.int32)
        yt = g.integers(0, NCLASS, size=(K, n, BT)).astype(np.int32)
        ms = np.ones((K, n, BS), np.float32)
        mt = np.ones((K, n, BT), np.float32)
        one = StepScalars(np.float32([0.75, 0.75, 0.5]),
                          np.float32(0.0), np.float32(0.0),
                          np.float32(0.003), np.float32(0.03))
        sc_n = stack_scalars([one] * n)
        sc = jax.tree_util.tree_map(
            lambda x: np.broadcast_to(np.asarray(x), (K,) + x.shape).copy(),
            sc_n)
        keys = ensemble_keys(range(n))
        state = create_ensemble_state(model, range(n), BS, BT, tc)
        multi = make_ensemble_multi_step(model, da, tc,
                                         per_member_data=True)
        t_c0 = time.perf_counter()
        for _ in range(WARMUP):
            state, m = multi(state, store_s, idx_s, ys, ms, store_t,
                             idx_t, yt, mt, sc, keys)
        float(m["loss"][K - 1, n - 1])
        compile_s = time.perf_counter() - t_c0

        best = float("inf")
        for _ in range(WINDOWS):
            t0 = time.perf_counter()
            for _ in range(CALLS):
                state, m = multi(state, store_s, idx_s, ys, ms, store_t,
                                 idx_t, yt, mt, sc, keys)
            float(m["loss"][K - 1, n - 1])
            best = min(best, time.perf_counter() - t0)
        per_call_step = (best - rt) / (CALLS * K)  # one step of ALL members
        agg_vps = n * (BS + BT) / per_call_step
        results[n] = dict(per_ensemble_step_us=per_call_step * 1e6,
                          aggregate_videos_per_sec=agg_vps,
                          compile_plus_warmup_s=compile_s)
        print(json.dumps({"n_members": n,
                          "per_ensemble_step_us":
                              round(per_call_step * 1e6, 1),
                          "aggregate_videos_per_sec": round(agg_vps, 1),
                          "compile_plus_warmup_s": round(compile_s, 1)}),
              flush=True)

    if 1 in results:
        base = results[1]["aggregate_videos_per_sec"]
        for n in N_LIST:
            if n == 1:
                continue
            r = results[n]["aggregate_videos_per_sec"] / base
            print(json.dumps({"n_members": n,
                              "throughput_vs_sequential": round(r, 2),
                              "note": f"{n} members cost "
                                      f"{n / r:.2f}x one run (ideal "
                                      f"sequential cost: {n}x)"}),
                  flush=True)


if __name__ == "__main__":
    main()
