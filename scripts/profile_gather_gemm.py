"""Device-time A/B of the fused gather+GEMM Pallas kernel vs the XLA
gather+einsum, via xplane parsing (immune to the tunnel's ~1.4 ms
per-dispatch latency that drowns wall-clock comparisons).

Run ALONE on the TPU:
  PYTHONPATH=.:/root/.axon_site python scripts/profile_gather_gemm.py
"""

from __future__ import annotations

import collections
import glob
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from ta3n_tpu.ops.gather_gemm import (gathered_gemm, gathered_gemm_reference,
                                      pack_store)

R, D, H = 20000, 2048, 512
N = 640
CALLS = 10


def device_time_us(fn, *args) -> dict:
    out = fn(*args)
    # force REAL completion of the warmup: block_until_ready returns at
    # enqueue-ack on this runtime (CLAUDE.md) and would let warmup ops
    # bleed into the trace
    _ = float(jnp.sum(out[0]))
    tdir = tempfile.mkdtemp(prefix="gg_prof_")
    jax.profiler.start_trace(tdir)
    for _ in range(CALLS):
        out = fn(*args)
    _ = float(jnp.sum(out[0]))  # force execution inside the trace
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
                name = ev.name.split(" = ")[0]
                if name.startswith("%while"):
                    continue
                per_op[name] += ev.duration_ns / 1e3
    total = sum(per_op.values()) / CALLS
    top = {k: round(v / CALLS, 1)
           for k, v in per_op.most_common(6)}
    return {"total_us_per_call": round(total, 1), "top_ops": top}


def main():
    print("devices:", jax.devices(), flush=True)
    g = np.random.default_rng(0)
    store = jnp.asarray(g.normal(size=(R, D)).astype(np.float32))
    store3 = jax.device_put(pack_store(store))
    idx = jnp.asarray(g.integers(0, R, size=N).astype(np.int32))
    w = jnp.asarray(g.normal(scale=0.05, size=(D, H)).astype(np.float32))

    ref = jax.jit(gathered_gemm_reference)
    print("ref:", device_time_us(ref, store3, idx, w), flush=True)
    for mode in ("reshape", "slices"):
        for tb in (128, 256):
            fn = jax.jit(lambda s, i, ww, m=mode, t=tb: gathered_gemm(
                s, i, ww, tile_rows=t, mode=m))
            z1, _ = fn(store3, idx, w)
            z0, _ = ref(store3, idx, w)
            err = float(jnp.max(jnp.abs(z1 - z0)))
            print(f"pallas {mode} tb={tb} (max_err {err:.2e}):",
                  device_time_us(fn, store3, idx, w), flush=True)


if __name__ == "__main__":
    main()
