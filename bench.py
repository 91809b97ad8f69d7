"""Throughput benchmark: full-TA3N train-step videos/sec/chip.

Measures the flagship configuration (UCF->HMDB_full published recipe:
trn-m aggregation, TransAttn, attentive entropy, RevGrad at all three
levels, batch 128 source / 74 target, 5 segments, 2048-d ResNet-101
features, fc_dim 512 — script_train_val.sh:10-17,96-101,136-155) in the
production execution mode: HBM-resident feature store with on-device
gather and K=8 optimizer steps per dispatch (lax.scan).  Every step is a
complete forward (both streams) + all DA losses + backward + clip +
weight decay + momentum + update; mode equivalence with plain stepping is
covered by tests/test_multi_step.py and tests/test_device_store.py.

Timing methodology: on this tunneled runtime `block_until_ready` returns
at enqueue-acknowledgement, NOT at execution completion (measured: a
chained-8192^3-matmul "rate" of 50 PFLOP/s).  Real execution is therefore
forced by fetching a scalar that depends on the final step's loss, and
one measured host<->device roundtrip is subtracted.  Cross-checked
against a known-FLOPs matmul chain (190-220 TFLOP/s bf16 — plausible for
v5e).  Prints ONE JSON line.

Baseline: the reference publishes NO throughput numbers (BASELINE.md).
``vs_baseline`` is therefore the MEASURED ratio: the actual reference
(torch CPU, scripts/measure_reference_baseline.py) runs at 427.6
videos/s on this host at the same flagship config (0.472 s/step,
13-step avg); the denominator is emitted alongside (``baseline_vps``)
so every JSON line is self-describing — the field's meaning changed in
round 4 (it was a V100 estimate through round 3), and records must not
rely on out-of-band context.  The older speculative V100 projection now
lives ONLY in BENCH_NOTES.md ("V100 estimate"), not in this output.

Regression tripwire (VERDICT r4 #5): at the default knobs on real TPU
the measured videos/s must stay above 0.7x the recorded session record
(BENCH history 529k -> 632k -> 667k -> 666k is stable well within that);
below the floor the process exits non-zero so the driver flags it.
Off-default knob sweeps and CPU runs skip the check;
TA3N_BENCH_MIN_VPS overrides the floor (0 disables).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# rbg: hardware RngBitGenerator instead of threefry for dropout masks —
# the profiled threefry fusion was ~16 us/step of the 327 us step;
# measured +10% end-to-end (608.4k vs 551.7k videos/s). Same flag the
# train CLI exposes as --prng_impl (default rbg).
jax.config.update("jax_default_prng_impl", "rbg")

# MEASURED same-host reference rate: /root/reference/main.py (torch CPU,
# era-compat shims only) at the published flagship config — 427.6
# videos/s, 13-step average (scripts/measure_reference_baseline.py,
# BENCH_NOTES.md).  This real number is the `vs_baseline` denominator,
# emitted as `baseline_vps` so each record is self-describing.
REFERENCE_MEASURED_CPU_VPS = 427.6

# TPU session record at the default knobs (BENCH_r03/r04: 667.2k/665.7k
# videos/s); the tripwire floor is 0.7x — BENCH history varies < +-10%
# between rounds, the tunnel's intra-session jitter is ~+-20%, and a
# halving (the failure mode this guards) is far below 0.7x.
SESSION_RECORD_VPS = 665_736.0
TRIPWIRE_FRACTION = 0.7

import os

# batch/dtype knobs for off-recipe sweeps (defaults = published config)
BS = int(os.environ.get("TA3N_BENCH_BS", 128))
BT = int(os.environ.get("TA3N_BENCH_BT", 74))
COMPUTE_DTYPE = os.environ.get("TA3N_BENCH_DTYPE", "float32")
# shape knobs for the other published recipes (defaults = UCF->HMDB_full;
# Kinetics->Gameplay: FDIM=4096 C3D features, NCLASS=30 — SURVEY §6)
SEG = int(os.environ.get("TA3N_BENCH_SEG", 5))
FDIM = int(os.environ.get("TA3N_BENCH_FDIM", 2048))
NCLASS = int(os.environ.get("TA3N_BENCH_NCLASS", 12))
# K=16 re-measured best in round 2 (3-run means: K=16 554k vs K=8 485k
# videos/s; r1 sweep had K=8 ahead — the tunnel's dispatch cost drifts
# between sessions, so this stays an env knob)
# K=64 re-measured best after the r2 kernel work (625.4k / 630.3k
# videos/s vs K=16's 614k session record; K=32 591k) — the sweep lives
# in BENCH_NOTES.md, the env knob covers tunnel drift
K = int(os.environ.get("TA3N_BENCH_K", 64))  # optimizer steps/dispatch
# scan unroll factor: >1 lets XLA fuse across step boundaries (r3 sweep
# in BENCH_NOTES.md)
UNROLL = int(os.environ.get("TA3N_BENCH_UNROLL", 1))
# HBM store dtype: float32 (default; exact reference rows) or bfloat16
# (--store_dtype production option: halves residency + gather bytes)
STORE_DTYPE = os.environ.get("TA3N_BENCH_STORE_DTYPE", "float32")
# TA3N_BENCH_SAMPLER=device: generate index batches ON DEVICE
# (data/device_sampler.py) — only schedule scalars cross the host
# boundary per call.  Default ("host") pre-stacks index batches like the
# host loader does.
SAMPLER = os.environ.get("TA3N_BENCH_SAMPLER", "host")
WARMUP, CALLS, WINDOWS = 3, 20, 3
STORE_S_ROWS, STORE_T_ROWS = 20000, 12000

# the tripwire only compares like with like: the recorded session record
# was measured at exactly these knobs on real TPU
DEFAULT_KNOBS = (BS == 128 and BT == 74 and SEG == 5 and FDIM == 2048
                 and NCLASS == 12 and K == 64 and UNROLL == 1
                 and COMPUTE_DTYPE == "float32"
                 and STORE_DTYPE == "float32" and SAMPLER == "host")


def tripwire_floor(default_knobs: bool, platform: str) -> float:
    """Minimum acceptable videos/s, or 0 when the check doesn't apply
    (off-default knob sweep, CPU run).  TA3N_BENCH_MIN_VPS overrides."""
    env = os.environ.get("TA3N_BENCH_MIN_VPS")
    if env is not None:
        return float(env)
    if default_knobs and platform == "tpu":
        return TRIPWIRE_FRACTION * SESSION_RECORD_VPS
    return 0.0


def emit_and_check(vps: float, floor: float) -> int:
    """Print the one-line JSON record; non-zero when vps is below the
    regression floor (the driver surfaces the exit code)."""
    record = {
        "metric": "train_videos_per_sec_per_chip",
        "value": round(vps, 1),
        "unit": "videos/s",
        "vs_baseline": round(vps / REFERENCE_MEASURED_CPU_VPS, 1),
        "baseline_vps": REFERENCE_MEASURED_CPU_VPS,
    }
    if floor > 0:
        record["tripwire_floor_vps"] = round(floor, 1)
    print(json.dumps(record))
    if floor > 0 and vps < floor:
        import sys
        why = (f"TA3N_BENCH_MIN_VPS override"
               if os.environ.get("TA3N_BENCH_MIN_VPS")
               else f"{TRIPWIRE_FRACTION}x the session record "
                    f"{SESSION_RECORD_VPS:.0f}")
        print(f"PERF REGRESSION: {vps:.0f} videos/s is below the "
              f"tripwire floor {floor:.0f} ({why}) — see BENCH_NOTES.md",
              file=sys.stderr)
        return 1
    return 0


from ta3n_tpu.timing import measure_roundtrip  # noqa: E402 — shared warm-roundtrip helper


def main():
    from ta3n_tpu.config import DAConfig, ModelConfig, TrainConfig
    from ta3n_tpu.models import VideoModel
    from ta3n_tpu.train import StepScalars, create_train_state
    from ta3n_tpu.train.step import make_multi_train_step

    cfg = ModelConfig(num_class=NCLASS, baseline_type="video",
                      frame_aggregation="trn-m", train_segments=SEG,
                      val_segments=SEG, fc_dim=512, feature_dim=FDIM,
                      use_attn="TransAttn", dropout_i=0.5, dropout_v=0.5,
                      compute_dtype=COMPUTE_DTYPE)
    da = DAConfig(use_target="uSv", adv_DA="RevGrad",
                  add_loss_DA="attentive_entropy",
                  place_adv=("Y", "Y", "Y"))
    tc = TrainConfig(optimizer="SGD", lr=0.03, epochs=30,
                     batch_size=(BS, BT, BS))

    model = VideoModel(cfg)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, rng, BS, BT, tc)

    if SAMPLER == "device":
        # device-side index pipeline at published dataset scale
        # (UCF->HMDB: 1438 source / 840 target videos)
        from ta3n_tpu.data import TSNLoader
        from ta3n_tpu.data.device_sampler import DeviceSampler
        from ta3n_tpu.data.synthetic import make_synthetic_store
        from ta3n_tpu.train.step import make_sampled_multi_step
        src = make_synthetic_store(1438, NCLASS, FDIM, seed=0)
        tgt = make_synthetic_store(840, NCLASS, FDIM, seed=1)
        ls = TSNLoader(src, batch_size=BS, num_segments=SEG, mode="random",
                       seed=1)
        lt = TSNLoader(tgt, batch_size=BT, num_segments=SEG, mode="random",
                       seed=2)
        ss = DeviceSampler(ls, seed=101)
        st_ = DeviceSampler(lt, seed=202)
        spe = min(len(ls), len(lt))
        ss.steps_per_epoch = st_.steps_per_epoch = spe
        step_fn = make_sampled_multi_step(model, da, tc, ss, st_)
        sdt = jnp.dtype(STORE_DTYPE)
        dev_s = jax.device_put(jnp.asarray(src.features, dtype=sdt))
        dev_t = jax.device_put(jnp.asarray(tgt.features, dtype=sdt))
        sc = StepScalars(np.tile(np.float32([0.75, 0.75, 0.5]), (K, 1)),
                         np.zeros(K, np.float32), np.zeros(K, np.float32),
                         np.full(K, 0.003, np.float32),
                         np.full(K, 0.03, np.float32))
        rt = measure_roundtrip()
        for _ in range(WARMUP):
            state, m = step_fn(state, dev_s, dev_t, sc, rng)
        float(m["loss"][K - 1])
        best = float("inf")
        for _ in range(WINDOWS):
            t0 = time.perf_counter()
            for _ in range(CALLS):
                state, m = step_fn(state, dev_s, dev_t, sc, rng)
            float(m["loss"][K - 1])
            best = min(best, time.perf_counter() - t0)
        per_step = (best - rt) / (CALLS * K)
        vps = (BS + BT) / per_step
        return emit_and_check(
            vps, tripwire_floor(DEFAULT_KNOBS,
                                jax.devices()[0].platform))

    step = make_multi_train_step(model, da, tc, unroll=UNROLL)

    g = np.random.default_rng(0)
    sdt = jnp.dtype(STORE_DTYPE)
    store_s = jax.device_put(jnp.asarray(
        g.normal(size=(STORE_S_ROWS, FDIM)).astype(np.float32), dtype=sdt))
    store_t = jax.device_put(jnp.asarray(
        g.normal(size=(STORE_T_ROWS, FDIM)).astype(np.float32), dtype=sdt))
    idx_s = g.integers(0, STORE_S_ROWS, size=(K, BS, SEG)).astype(np.int32)
    idx_t = g.integers(0, STORE_T_ROWS, size=(K, BT, SEG)).astype(np.int32)
    ys = g.integers(0, NCLASS, size=(K, BS)).astype(np.int32)
    yt = g.integers(0, NCLASS, size=(K, BT)).astype(np.int32)
    ms = np.ones((K, BS), np.float32)
    mt = np.ones((K, BT), np.float32)
    sc = StepScalars(np.tile(np.float32([0.75, 0.75, 0.5]), (K, 1)),
                     np.zeros(K, np.float32), np.zeros(K, np.float32),
                     np.full(K, 0.003, np.float32),
                     np.full(K, 0.03, np.float32))

    rt = measure_roundtrip()

    for i in range(WARMUP):
        state, m = step(state, store_s, idx_s, ys, ms, store_t, idx_t, yt,
                        mt, sc, rng)
    float(m["loss"][K - 1])  # force execution of the warmup chain

    best = float("inf")
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for i in range(CALLS):
            state, m = step(state, store_s, idx_s, ys, ms, store_t, idx_t,
                            yt, mt, sc, rng)
        # fetching the last step's loss forces the whole dependent chain
        float(m["loss"][K - 1])
        best = min(best, time.perf_counter() - t0)

    steps = CALLS * K
    per_step = (best - rt) / steps
    vps = (BS + BT) / per_step
    return emit_and_check(
        vps, tripwire_floor(DEFAULT_KNOBS, jax.devices()[0].platform))


if __name__ == "__main__":
    import sys
    sys.exit(main())
