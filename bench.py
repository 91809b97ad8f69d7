"""Throughput benchmark: full-TA3N train-step videos/sec/chip.

Measures the flagship configuration (UCF->HMDB_full published recipe:
trn-m aggregation, TransAttn, attentive entropy, RevGrad at all three
levels, batch 128 source / 74 target, 5 segments, 2048-d ResNet-101
features, fc_dim 512 — script_train_val.sh:10-17,96-101,136-155) and
prints ONE JSON line.

Baseline: the reference publishes NO throughput numbers (BASELINE.md).
``vs_baseline`` is computed against REFERENCE_V100_VPS, an estimate of the
PyTorch-0.4 reference on a V100 derived from its per-step structure
(two-stream forward of ~40 small GEMMs + backward, DataParallel
scatter/gather and per-loss .item() syncs each batch, main.py:348-628:
~40 ms/step at batch 202 -> ~5000 videos/s).  The driver's north star is
>=10x this estimate.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_V100_VPS = 5000.0

BS, BT, SEG, FDIM, NCLASS = 128, 74, 5, 2048, 12
WARMUP, ITERS, WINDOWS = 10, 60, 3


def main():
    from ta3n_tpu.config import DAConfig, ModelConfig, TrainConfig
    from ta3n_tpu.models import VideoModel
    from ta3n_tpu.train import (StepScalars, create_train_state,
                                make_train_step)

    cfg = ModelConfig(num_class=NCLASS, baseline_type="video",
                      frame_aggregation="trn-m", train_segments=SEG,
                      val_segments=SEG, fc_dim=512, feature_dim=FDIM,
                      use_attn="TransAttn", dropout_i=0.5, dropout_v=0.5)
    da = DAConfig(use_target="uSv", adv_DA="RevGrad",
                  add_loss_DA="attentive_entropy",
                  place_adv=("Y", "Y", "Y"))
    tc = TrainConfig(optimizer="SGD", lr=0.03, epochs=30,
                     batch_size=(BS, BT, BS))

    model = VideoModel(cfg)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, rng, BS, BT, tc)
    step = make_train_step(model, da, tc)

    gen = np.random.default_rng(0)
    dev = jax.devices()[0]
    xs = jax.device_put(gen.normal(size=(BS, SEG, FDIM)).astype(np.float32),
                        dev)
    xt = jax.device_put(gen.normal(size=(BT, SEG, FDIM)).astype(np.float32),
                        dev)
    ys = jax.device_put(gen.integers(0, NCLASS, size=BS).astype(np.int32),
                        dev)
    yt = jax.device_put(gen.integers(0, NCLASS, size=BT).astype(np.int32),
                        dev)
    ms = jax.device_put(np.ones(BS, np.float32), dev)
    mt = jax.device_put(np.ones(BT, np.float32), dev)
    sc = StepScalars(jnp.array([0.75, 0.75, 0.5]), jnp.asarray(0.0),
                     jnp.asarray(0.0), jnp.asarray(0.003),
                     jnp.asarray(0.03))

    for i in range(WARMUP):
        state, m = step(state, xs, ys, ms, xt, yt, mt, sc,
                        jax.random.fold_in(rng, i))
    jax.block_until_ready(m["loss"])

    # best of WINDOWS timing windows: the step is dispatch-latency bound on
    # a tunneled single chip, so take the least-interfered window
    best = float("inf")
    k = WARMUP
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for i in range(ITERS):
            state, m = step(state, xs, ys, ms, xt, yt, mt, sc,
                            jax.random.fold_in(rng, k))
            k += 1
        jax.block_until_ready(m["loss"])
        best = min(best, time.perf_counter() - t0)

    videos_per_step = BS + BT
    vps = videos_per_step * ITERS / best
    print(json.dumps({
        "metric": "train_videos_per_sec_per_chip",
        "value": round(vps, 1),
        "unit": "videos/s",
        "vs_baseline": round(vps / REFERENCE_V100_VPS, 2),
    }))


if __name__ == "__main__":
    main()
