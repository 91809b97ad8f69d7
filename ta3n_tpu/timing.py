"""Wall-clock timing helpers for this runtime's async-dispatch quirks.

On the tunneled axon TPU runtime, ``jax.block_until_ready`` returns at
enqueue-acknowledgement — NOT execution completion — so any honest
timing must force execution by fetching a value (``float()``/
``device_get``) and subtract one host<->device roundtrip (~39 ms here).
bench.py / scripts/bench_*.py all use this helper; methodology and
measured numbers live in BENCH_NOTES.md ("Timing methodology").
"""

from __future__ import annotations

import time

import jax.numpy as jnp


def measure_roundtrip(n: int = 5) -> float:
    """Mean seconds for one enqueue + blocking scalar fetch.

    Warms BOTH programs first (the `+ 1.0` one included): a cold remote
    compile costs 20-290 s on this runtime (CLAUDE.md) and would corrupt
    the subtracted roundtrip and every number derived from it.
    """
    tiny = jnp.zeros(()) + 1.0
    float(tiny)
    float(tiny + 1.0)
    t0 = time.perf_counter()
    for _ in range(n):
        float(tiny + 1.0)
    return (time.perf_counter() - t0) / n
