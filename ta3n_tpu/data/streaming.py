"""Larger-than-HBM feature-store streaming.

The reference's one-file-per-frame loading (dataset.py:53-66) trivially
scales to any dataset size because nothing is resident; the packed
HBM-resident store (feature_store.py) is ~400x faster per step but caps
the dataset at device memory.  This module removes the cap:

* ``ShardPlan`` partitions a store's videos into CONTIGUOUS row shards
  of <= budget_rows.  Every shard is padded to exactly budget_rows so
  all shards share ONE compiled train step (static shapes).
* ``TSNLoader.shard_index_epoch(plan)`` (loader.py) yields
  (shard_id, IndexBatch) with shard-LOCAL row indices, shards in order,
  videos shuffled within their shard — the standard big-data shuffle
  window (global shuffle would touch every shard every batch).
* ``ShardStream`` keeps the current shard resident and uploads the next
  one asynchronously (jax.device_put dispatches without blocking), so
  the host->HBM copy of shard k+1 overlaps the compute of shard k.

Peak device residency is 2 * budget_rows * feature_dim * bytes/elem
(current + prefetched shard; 4 bytes f32, 2 bf16, ~1 int8 via
data/quantized.py); pick budget accordingly.

Equivalence contract (tested in tests/test_streaming_store.py): training
on the shard-local batch sequence through ShardStream produces BITWISE
the same parameters as the fully-resident store consuming the same
batches with global indices — the streaming machinery changes where
bytes live, never the math.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

__all__ = ["ShardPlan", "ShardStream"]


class ShardPlan:
    """Greedy contiguous partition of a packed store's rows.

    offsets: [num_videos + 1] int64 row offsets (FeatureStore.offsets).
    budget_rows: max rows resident per shard; shards are padded to
    exactly this many rows so the jitted step compiles once.
    """

    def __init__(self, offsets: np.ndarray, budget_rows: int):
        offsets = np.asarray(offsets, dtype=np.int64)
        total = int(offsets[-1])
        self.budget_rows = int(min(budget_rows, total))
        n = offsets.shape[0] - 1
        video_lo, video_hi, row_lo, row_hi = [], [], [], []
        v = 0
        while v < n:
            start = int(offsets[v])
            hi = v
            while hi < n and int(offsets[hi + 1]) - start <= self.budget_rows:
                hi += 1
            if hi == v:
                raise ValueError(
                    f"video {v} alone has {int(offsets[v + 1]) - start} rows"
                    f" > budget_rows={self.budget_rows}; raise the budget")
            video_lo.append(v)
            video_hi.append(hi)
            row_lo.append(start)
            row_hi.append(int(offsets[hi]))
            v = hi
        self.video_lo = np.asarray(video_lo, dtype=np.int64)
        self.video_hi = np.asarray(video_hi, dtype=np.int64)
        self.row_lo = np.asarray(row_lo, dtype=np.int64)
        self.row_hi = np.asarray(row_hi, dtype=np.int64)
        # video index -> shard id
        counts = self.video_hi - self.video_lo
        self._vid2shard = np.repeat(
            np.arange(len(counts), dtype=np.int32), counts)

    @property
    def num_shards(self) -> int:
        return len(self.row_lo)

    def shard_of(self, video_idx: np.ndarray) -> np.ndarray:
        return self._vid2shard[np.asarray(video_idx)]

    def shard_array(self, features: np.ndarray, sid: int) -> np.ndarray:
        """Shard rows padded to [budget_rows, ...] (one host copy)."""
        lo, hi = int(self.row_lo[sid]), int(self.row_hi[sid])
        buf = np.zeros((self.budget_rows,) + features.shape[1:],
                       dtype=features.dtype)
        buf[:hi - lo] = features[lo:hi]
        return buf


class ShardStream:
    """Double-buffered host->HBM shard uploader.

    get(sid) returns the device array for shard sid (uploading it if it
    is not the prefetched one) and immediately starts the async upload
    of shard sid+1.  Shards must be requested in non-decreasing order
    for the prefetch to hit (the loader guarantees this).
    """

    def __init__(self, features: np.ndarray, plan: ShardPlan,
                 sharding=None, dtype=None, prefetch: bool = True,
                 scales: Optional[np.ndarray] = None):
        self.features = features
        self.plan = plan
        self.sharding = sharding
        self.dtype = dtype  # None: keep the store dtype (resident parity)
        self.scales = scales  # disk-quantized store: per-row f32 scales
        self.prefetch = prefetch
        self._current: Optional[tuple] = None
        self._next: dict = {}

    def _put(self, sid: int):
        import jax
        arr = self.plan.shard_array(self.features, sid)
        if self.scales is not None:
            # already-quantized rows: shard the scale vector alongside
            # (padding scales are 0 -> padded rows dequantize to zeros)
            return jax.device_put(
                (arr, self.plan.shard_array(self.scales, sid)),
                self.sharding)
        if self.dtype is not None and np.dtype(self.dtype) == np.int8:
            # per-row quantization commutes with shard slicing/padding,
            # so per-shard quantized uploads stay bitwise-equal to a
            # resident quantized store (data/quantized.py)
            from ta3n_tpu.data.quantized import quantize_rows
            return jax.device_put(quantize_rows(arr), self.sharding)
        if self.dtype is not None and arr.dtype != self.dtype:
            arr = arr.astype(self.dtype)
        return jax.device_put(arr, self.sharding)

    def get(self, sid: int):
        if self._current is not None and self._current[0] == sid:
            return self._current[1]
        buf = self._next.pop(sid, None)
        if buf is None:
            buf = self._put(sid)
        self._current = (sid, buf)
        self._next.clear()  # drop stale prefetches (frees the buffer)
        nxt = sid + 1
        if self.prefetch and nxt < self.plan.num_shards:
            self._next[nxt] = self._put(nxt)  # async under jax dispatch
        return buf
