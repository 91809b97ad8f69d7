"""Int8 row-quantized feature stores (``--store_dtype int8``).

4x HBM residency vs float32 (2x vs ``--store_dtype bfloat16``): each
frame-feature row is stored as int8 plus ONE float32 scale (symmetric
per-row quantization, scale = max|row| / 127).  The reference keeps
every feature as a float32 ``.t7`` file on disk and never considers
residency (dataset.py:53-66); quantized residency is a TPU-native
capacity capability — the larger-than-HBM streaming reach of
``--store_budget_rows`` grows 4x at the same byte budget, and the
per-step gather moves 4x fewer HBM bytes.

A quantized store travels through the jitted steps as a ``(q, scale)``
pytree pair; ``train/step.py::device_gather`` dequantizes the gathered
rows to float32 on device (a cast + broadcast multiply that XLA fuses
into the gather consumer).  Quantization is per-row, so it commutes
with shard slicing and zero-padding — the streaming path
(data/streaming.py) quantizes each padded shard independently and
stays bitwise-equal to the resident quantized store.

Error bound: |x - dequant(quant(x))| <= scale/2 = max|row| / 254 per
row (round-to-nearest), i.e. ~0.4% of the row's dynamic range.
"""

from __future__ import annotations

import numpy as np

__all__ = ["QINT8_MAX", "quantize_rows", "dequantize_rows",
           "is_quantized"]

QINT8_MAX = 127.0


def quantize_rows(arr: np.ndarray):
    """Per-row symmetric int8 quantization.

    arr: [rows, D] or [rows, streams, D] float array.
    Returns (q int8 same-shape, scale float32 [rows]); all-zero rows
    (e.g. shard padding) get scale 1 so they dequantize to exact zeros.
    """
    arr = np.ascontiguousarray(arr, dtype=np.float32)
    amax = np.abs(arr.reshape(arr.shape[0], -1)).max(axis=1)
    scale = np.where(amax > 0, amax / QINT8_MAX, 1.0).astype(np.float32)
    s = scale.reshape((-1,) + (1,) * (arr.ndim - 1))
    q = np.rint(arr / s).astype(np.int8)  # |arr/s| <= 127 by construction
    return q, scale


def dequantize_rows(q: np.ndarray, scale: np.ndarray) -> np.ndarray:
    """Host-side inverse of quantize_rows — the exact op order the
    device dequant in device_gather uses (cast then multiply), so host
    and device dequantized values agree bitwise."""
    s = np.asarray(scale, np.float32).reshape(
        (-1,) + (1,) * (q.ndim - 1))
    return q.astype(np.float32) * s


def is_quantized(store) -> bool:
    """True when a device-store argument is a (q, scale) pair."""
    return isinstance(store, (tuple, list))
