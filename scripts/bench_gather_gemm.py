"""A/B the fused gather+GEMM Pallas kernel vs the XLA gather+einsum at
the published flagship shapes (store 20000x2048 f32, N=640 source rows,
H=512).  Honest timing: chained dependency + scalar fetch, one measured
roundtrip subtracted (BENCH_NOTES methodology).

Run ALONE on the TPU:  PYTHONPATH=.:/root/.axon_site python
scripts/bench_gather_gemm.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from ta3n_tpu.ops.gather_gemm import (gathered_gemm, gathered_gemm_reference,
                                      pack_store)

R, D, H = 20000, 2048, 512
N = 640          # source stream: B=128 x S=5
ITERS = 1000   # chain must dwarf the +-10 ms tunnel roundtrip jitter


def roundtrip():
    tiny = jnp.zeros(()) + 1.0
    float(tiny)
    t0 = time.perf_counter()
    for _ in range(5):
        float(tiny + 1.0)
    return (time.perf_counter() - t0) / 5


def timed(fn, store3, idx, w, label):
    # chain ITERS calls INSIDE one jit (per-dispatch tunnel latency is
    # ~1.4 ms — it would dominate a per-call loop); each iteration's w
    # depends on the previous z AND x so neither the gather nor the GEMM
    # can be elided or overlapped
    @jax.jit
    def chained(w0):
        def body(wc, _):
            z, x = fn(store3, idx, wc)
            # full-tensor sums: every output element feeds the carry, so
            # XLA cannot slice the gather/GEMM down to one element
            dep = (jnp.sum(z) + jnp.sum(x)) * 1e-30
            return wc + dep, dep
        wn, zs = jax.lax.scan(body, w0, None, length=ITERS)
        return zs[-1] + wn[0, 0]

    out = chained(w)
    _ = float(out)
    rt = roundtrip()
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        _ = float(chained(w))
        best = min(best, time.perf_counter() - t0 - rt)
    per = best / ITERS * 1e6
    print(f"{label:40s} {per:9.1f} us/call", flush=True)
    return per


def main():
    print("devices:", jax.devices())
    g = np.random.default_rng(0)
    store = jnp.asarray(g.normal(size=(R, D)).astype(np.float32))
    store3 = jax.device_put(pack_store(store))
    idx = jnp.asarray(g.integers(0, R, size=N).astype(np.int32))
    w = jnp.asarray(g.normal(scale=0.05, size=(D, H)).astype(np.float32))

    ref = jax.jit(gathered_gemm_reference)
    z0, _ = ref(store3, idx, w)

    results = {}
    results["xla gather+einsum"] = timed(ref, store3, idx, w,
                                         "XLA gather + einsum")
    for mode in ("slices", "reshape"):
        for tb in (128, 256):
            fn = jax.jit(lambda s, i, ww, m=mode, t=tb: gathered_gemm(
                s, i, ww, tile_rows=t, mode=m))
            z1, _ = fn(store3, idx, w)
            err = float(jnp.max(jnp.abs(z1 - z0)))
            scale = float(jnp.max(jnp.abs(z0)))
            assert err < 1e-3 * max(scale, 1.0), (err, scale)
            results[f"pallas {mode} tb={tb}"] = timed(
                fn, store3, idx, w, f"Pallas fused {mode} tb={tb}")
    print({k: round(v, 1) for k, v in results.items()})


if __name__ == "__main__":
    main()
