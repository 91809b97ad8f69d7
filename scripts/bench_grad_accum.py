"""Gradient-accumulation throughput datapoint (VERDICT r2 next-#5):
effective batch >= 4x the published one via --accum_steps semantics.

Measures make_grad_accum_step with G=4 micro-batch pairs of the
published 128/74 shape -> ONE update of effective batch 512+296 = 808
videos, device-resident micro-batches (the host-feed H2D cost is a
function of this tunnel, not the step), honest chained timing.

Run ALONE on the TPU:
  PYTHONPATH=.:/root/.axon_site python scripts/bench_grad_accum.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_prng_impl", "rbg")

BS, BT, SEG, FDIM, NCLASS = 128, 74, 5, 2048, 12
G = 4          # micro-batches per update: effective batch 512 + 296
CALLS = 30


def main():
    from ta3n_tpu.config import DAConfig, ModelConfig, TrainConfig
    from ta3n_tpu.models import VideoModel
    from ta3n_tpu.train import StepScalars, create_train_state
    from ta3n_tpu.train.step import make_grad_accum_step

    cfg = ModelConfig(num_class=NCLASS, baseline_type="video",
                      frame_aggregation="trn-m", train_segments=SEG,
                      val_segments=SEG, fc_dim=512, feature_dim=FDIM,
                      use_attn="TransAttn", dropout_i=0.5, dropout_v=0.5)
    da = DAConfig(use_target="uSv", adv_DA="RevGrad",
                  add_loss_DA="attentive_entropy",
                  place_adv=("Y", "Y", "Y"))
    tc = TrainConfig(optimizer="SGD", lr=0.03,
                     batch_size=(BS, BT, BS))
    model = VideoModel(cfg)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, rng, BS, BT, tc)
    step = make_grad_accum_step(model, da, tc, accum_steps=G)

    g = np.random.default_rng(0)
    xs = jax.device_put(jnp.asarray(
        g.normal(size=(G, BS, SEG, FDIM)).astype(np.float32)))
    xt = jax.device_put(jnp.asarray(
        g.normal(size=(G, BT, SEG, FDIM)).astype(np.float32)))
    ys = jnp.asarray(g.integers(0, NCLASS, size=(G, BS)).astype(np.int32))
    yt = jnp.asarray(g.integers(0, NCLASS, size=(G, BT)).astype(np.int32))
    ms = jnp.ones((G, BS), jnp.float32)
    mt = jnp.ones((G, BT), jnp.float32)
    sc = StepScalars(np.float32([0.75, 0.75, 0.5]), np.float32(0),
                     np.float32(0), np.float32(0.003), np.float32(0.03))

    tiny = jnp.zeros(()) + 1.0
    float(tiny)
    t0 = time.perf_counter()
    for _ in range(5):
        float(tiny + 1.0)
    rt = (time.perf_counter() - t0) / 5

    for _ in range(3):
        state, m = step(state, xs, ys, ms, xt, yt, mt, sc, rng)
    float(m["loss"][G - 1])

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(CALLS):
            state, m = step(state, xs, ys, ms, xt, yt, mt, sc, rng)
        float(m["loss"][G - 1])
        best = min(best, time.perf_counter() - t0 - rt)
    per_update = best / CALLS
    videos = G * (BS + BT)
    print(json.dumps({
        "metric": "grad_accum_videos_per_sec_per_chip",
        "effective_batch": [G * BS, G * BT],
        "sec_per_update": round(per_update, 6),
        "value": round(videos / per_update, 1),
        "unit": "videos/s",
    }))


if __name__ == "__main__":
    main()
