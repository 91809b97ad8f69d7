"""DAN (MMD) train-step cost at PUBLISHED widths on the TPU (ADVICE r4).

The subtract-then-square L2 in losses.gaussian_kernel builds a broadcast
[n, n, d] difference; its cost claim ("XLA fuses it") is load-bearing,
so this measures instead of assuming:

  * compiled memory analysis (temp/argument/output bytes) of the DAN
    step vs the flagship RevGrad step at the published recipe
    (2048-d features, fc 512, batch 128/74, place_dis Y Y N), and
  * the adversarial worst case the advice computed by hand: 512-row
    chunks against the 2560-d FLAT frame-level features
    (place_dis Y Y Y at batch 512) — ~2.7 GB per chunk IF the broadcast
    materializes, ~nothing if XLA fuses it into the row-sum reduction;
  * xplane-parsed device time per step for both configs (wall clocks
    through the tunnel measure only dispatch — CLAUDE.md).

Run ALONE on the TPU:
  PYTHONPATH=.:/root/.axon_site python scripts/profile_dan_step.py
"""

from __future__ import annotations

import collections
import glob
import json
import os
import sys
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ta3n_tpu.config import DAConfig, ModelConfig, TrainConfig
from ta3n_tpu.models import VideoModel
from ta3n_tpu.train import StepScalars, create_train_state
from ta3n_tpu.train.step import make_train_step

SEG, FDIM, FC, C = 5, 2048, 512, 12
CALLS = 10


def build(bs, bt, da):
    cfg = ModelConfig(num_class=C, baseline_type="video",
                      frame_aggregation="trn-m", train_segments=SEG,
                      val_segments=SEG, fc_dim=FC, feature_dim=FDIM,
                      use_attn="TransAttn", dropout_i=0.5, dropout_v=0.5)
    tc = TrainConfig(optimizer="SGD", lr=0.03, epochs=30,
                     batch_size=(bs, bt, bs))
    model = VideoModel(cfg)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, rng, bs, bt, tc)
    step = make_train_step(model, da, tc)
    g = np.random.default_rng(0)
    xs = g.normal(size=(bs, SEG, FDIM)).astype(np.float32)
    xt = g.normal(size=(bt, SEG, FDIM)).astype(np.float32)
    ys = g.integers(0, C, size=bs).astype(np.int32)
    yt = g.integers(0, C, size=bt).astype(np.int32)
    sc = StepScalars(np.float32([0.75, 0.75, 0.5]), np.float32(0),
                     np.float32(1.0), np.float32(0.003), np.float32(0.03))
    args = (state, xs, ys, np.ones(bs, np.float32), xt, yt,
            np.ones(bt, np.float32), sc, rng)
    return step, args


def memory_analysis(step, args):
    lowered = jax.jit(step.raw, donate_argnums=(0,)).lower(*args)
    m = lowered.compile().memory_analysis()
    return {k: round(getattr(m, k) / 2 ** 20, 1)
            for k in ("temp_size_in_bytes", "argument_size_in_bytes",
                      "output_size_in_bytes")}


def device_time(step, args):
    state = args[0]
    for _ in range(3):
        state, m = step(state, *args[1:])
    _ = float(m["loss"])
    tdir = tempfile.mkdtemp(prefix="dan_prof_")
    jax.profiler.start_trace(tdir)
    for _ in range(CALLS):
        state, m = step(state, *args[1:])
    _ = float(m["loss"])
    jax.profiler.stop_trace()
    paths = glob.glob(os.path.join(tdir, "**", "*.xplane.pb"),
                      recursive=True)
    data = jax.profiler.ProfileData.from_serialized_xspace(
        open(paths[0], "rb").read())
    per_op = collections.Counter()
    for plane in data.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                per_op[ev.name.split(" = ")[0]] += ev.duration_ns / 1e3
    return round(sum(per_op.values()) / CALLS, 1)


def main():
    out = {}
    # published recipe, flagship adversarial step (comparison anchor)
    step, args = build(128, 74, DAConfig(
        use_target="uSv", adv_DA="RevGrad",
        add_loss_DA="attentive_entropy", place_adv=("Y", "Y", "Y")))
    out["flagship_128_74"] = {"mem_mb": memory_analysis(step, args),
                              "device_us_per_step": device_time(step,
                                                                args)}

    # published recipe, DAN at the default placement
    step, args = build(128, 74, DAConfig(use_target="uSv", dis_DA="DAN",
                                         place_dis=("Y", "Y", "N")))
    out["dan_128_74_YYN"] = {"mem_mb": memory_analysis(step, args),
                             "device_us_per_step": device_time(step,
                                                               args)}

    # adversarial worst case from ADVICE r4: full 512-row chunks against
    # the FLAT frame-level features (S*fc = 2560-d) — the [512,512,2560]
    # broadcast would be ~2.6 GB f32 per chunk if materialized
    step, args = build(512, 512, DAConfig(use_target="uSv", dis_DA="DAN",
                                          place_dis=("Y", "Y", "Y")))
    out["dan_512_512_YYY_frame2560"] = {
        "mem_mb": memory_analysis(step, args),
        "device_us_per_step": device_time(step, args)}

    print(json.dumps(out))


if __name__ == "__main__":
    main()
