"""A/B: f32 vs int8 (W8A8) quantized inference throughput on the TPU.

Flagship inference config (2048-d ResNet-101 features, fc_dim 512,
trn-m, TransAttn, 5 segments — the published UCF->HMDB recipe's eval
shape).  `ModelConfig.quantize='int8'` runs every MXU-sized GEMM as an
int8 x int8 -> int32 dot (per-output-channel weight scales, per-row
activation scales, logits heads f32) — see models/layers.py.

Timing methodology (CLAUDE.md): per-call wall timing through the tunnel
measures dispatch only, so ITERS forwards are chained INSIDE one jit via
lax.scan, with a carry that consumes the FULL prob tensor of every
iteration and feeds a perturbation back into the next input (XLA cannot
slice the work away or run iterations concurrently).  Execution is
forced by fetching the final scalar; one measured roundtrip is
subtracted.  Weight quantization is loop-invariant, so XLA hoists/folds
it — only the dynamic activation quant is per-iteration, exactly like a
production predict call with baked weights.

Usage: PYTHONPATH=.:/root/.axon_site python scripts/bench_int8_infer.py
Prints one JSON line per (mode, batch).
"""

from __future__ import annotations

import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

SEG, FDIM, NCLASS, FC = 5, 2048, 12, 512
WARMUP, WINDOWS = 2, 3
BATCHES = (64, 512)


def iters_for(bs: int) -> int:
    # the chain must dwarf the ~10 ms roundtrip jitter (CLAUDE.md):
    # scale iterations so the chain is >= ~50 ms at any batch size
    return max(400, 2048 * 64 // bs)


from ta3n_tpu.timing import measure_roundtrip  # noqa: E402 — shared warm-roundtrip helper


def main():
    from ta3n_tpu.config import ModelConfig
    from ta3n_tpu.models import VideoModel

    base = ModelConfig(num_class=NCLASS, baseline_type="video",
                       frame_aggregation="trn-m", train_segments=SEG,
                       val_segments=SEG, fc_dim=FC, feature_dim=FDIM,
                       dropout_i=0.0, dropout_v=0.0, use_attn="TransAttn")
    m0 = VideoModel(base)
    x0 = jnp.zeros((4, SEG, FDIM), jnp.float32)
    v = m0.init(jax.random.PRNGKey(0), x0, x0, jnp.zeros(3),
                jnp.asarray(0.0), False, False)
    # trained-magnitude weights (init is 0.001-scale)
    params = jax.device_put(jax.tree_util.tree_map(
        lambda a: np.asarray(a) * 50.0 if a.ndim >= 2 else np.asarray(a),
        v["params"]))

    rt = measure_roundtrip()
    results = {}
    for mode in ("none", "int8"):
        cfg = dataclasses.replace(base, quantize=mode)
        model = VideoModel(cfg)

        for bs in BATCHES:
            iters = iters_for(bs)
            x = jax.device_put(np.random.default_rng(0).normal(
                size=(bs, SEG, FDIM)).astype(np.float32))

            @jax.jit
            def chain(p, x):
                def probs(xi):
                    s, _ = model.apply({"params": p}, xi, xi, jnp.zeros(3),
                                       jnp.asarray(0.0), False, False)
                    return jax.nn.softmax(s.out, axis=-1)

                def body(carry, _):
                    # full-tensor consumption + feedback dependence
                    pr = probs(x * (1.0 + carry * 1e-12))
                    return jnp.sum(pr), None

                out, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                      length=iters)
                return out

            for _ in range(WARMUP):
                r = chain(params, x)
            float(r)
            best = float("inf")
            for _ in range(WINDOWS):
                t0 = time.perf_counter()
                float(chain(params, x))
                best = min(best, time.perf_counter() - t0)
            per_iter = (best - rt) / iters
            vps = bs / per_iter
            results[(mode, bs)] = vps
            print(json.dumps({
                "metric": "infer_videos_per_sec_per_chip",
                "quantize": mode, "batch": bs,
                "per_forward_us": round(per_iter * 1e6, 1),
                "value": round(vps, 1), "unit": "videos/s",
            }), flush=True)

    for bs in BATCHES:
        print(json.dumps({
            "metric": "int8_speedup", "batch": bs,
            "value": round(results[("int8", bs)] / results[("none", bs)],
                           3)}), flush=True)


if __name__ == "__main__":
    main()
