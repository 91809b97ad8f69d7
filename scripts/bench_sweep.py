"""Throughput sweep: dtype x batch x variant, on the default backend.

WARNING: this scratch sweep times with block_until_ready, which on the
tunneled axon runtime returns at enqueue-ack — numbers here are DISPATCH
rates, not sustained compute.  For honest methodology (value forcing +
roundtrip subtraction) see bench.py and BENCH_NOTES.md.

Usage: PYTHONPATH=.:/root/.axon_site python scripts/bench_sweep.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from ta3n_tpu.config import DAConfig, ModelConfig, TrainConfig
from ta3n_tpu.models import VideoModel
from ta3n_tpu.train import StepScalars, create_train_state, make_train_step

SEG, FDIM, NCLASS = 5, 2048, 12


def bench(bs, bt, compute_dtype, iters=30, warmup=5, use_pallas="auto"):
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
    step = make_train_step(model, da, tc)
    g = np.random.default_rng(0)
    dev = jax.devices()[0]
    put = lambda a: jax.device_put(a, dev)
    xs = put(g.normal(size=(bs, SEG, FDIM)).astype(np.float32))
    xt = put(g.normal(size=(bt, SEG, FDIM)).astype(np.float32))
    ys = put(g.integers(0, NCLASS, size=bs).astype(np.int32))
    yt = put(g.integers(0, NCLASS, size=bt).astype(np.int32))
    ms, mt = put(np.ones(bs, np.float32)), put(np.ones(bt, np.float32))
    sc = StepScalars(jnp.array([0.75, 0.75, 0.5]), jnp.asarray(0.0),
                     jnp.asarray(0.0), jnp.asarray(0.003),
                     jnp.asarray(0.03))
    for i in range(warmup):
        state, m = step(state, xs, ys, ms, xt, yt, mt, sc,
                        jax.random.fold_in(rng, i))
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, xs, ys, ms, xt, yt, mt, sc,
                        jax.random.fold_in(rng, warmup + i))
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0
    vps = (bs + bt) * iters / dt
    print(f"bs={bs} bt={bt} dtype={compute_dtype}: "
          f"{dt / iters * 1e3:.3f} ms/step, {vps:,.0f} videos/s")
    return vps


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    bench(128, 74, "float32")
    bench(128, 74, "bfloat16")
    bench(256, 148, "float32")
    bench(256, 148, "bfloat16")
    bench(512, 296, "bfloat16")
    bench(1024, 592, "bfloat16")
