"""Packed frame-feature store.

TPU-native replacement for the reference's one-``.t7``-file-per-frame
layout (dataset.py:53-66, written by video2feature.py:206-217): all frame
features of a split live in ONE contiguous array plus an offsets vector,
so a batch gather is a single vectorised fancy-index (or, from disk, a
single memmap read) instead of B*S*new_length ``torch.load`` calls.

Layout on disk (directory):
    features.npy   [total_frames, D] (float32/float16) — memmap-able
    offsets.npy    [num_videos + 1] int64, frame row ranges per video
    meta.json      {"paths": [...], "labels": [...], "feature_dim": D,
                    "num_streams": 1|2}
Flow modality stores x/y stream features interleaved per frame:
    features.npy   [total_frames, 2, D]

Quantized stores (``store.quantize()`` / converter ``--dtype int8``)
additionally hold ``scales.npy`` [total_frames] float32 and keep
``features.npy`` as int8 (data/quantized.py): 4x smaller on disk and
in host RAM, 4x fewer host->HBM upload bytes; host gathers dequantize
transparently, device paths upload the (q, scale) pair and dequantize
inside the gather (train/step.py::device_gather).
"""

from __future__ import annotations

import json
import os
from typing import List, Sequence

import numpy as np

from ta3n_tpu.data.manifest import VideoRecord

__all__ = ["FeatureStore"]


class FeatureStore:
    def __init__(self, features: np.ndarray, offsets: np.ndarray,
                 paths: Sequence[str], labels: Sequence[int],
                 scales: np.ndarray = None):
        assert offsets.shape[0] == len(paths) + 1
        self.features = features
        self.offsets = np.asarray(offsets, dtype=np.int64)
        self.paths = list(paths)
        self.labels = np.asarray(labels, dtype=np.int64)
        self.scales = scales  # [total_frames] f32 iff int8-quantized
        self._path_index = {p: i for i, p in enumerate(self.paths)}

    # ---- properties ----
    @property
    def num_videos(self) -> int:
        return len(self.paths)

    @property
    def feature_dim(self) -> int:
        return self.features.shape[-1]

    @property
    def num_streams(self) -> int:
        return self.features.shape[1] if self.features.ndim == 3 else 1

    @property
    def quantized(self) -> bool:
        return self.scales is not None

    def quantize(self) -> "FeatureStore":
        """Int8-quantized copy (per-row symmetric, data/quantized.py):
        4x smaller rows; gathers dequantize transparently."""
        if self.quantized:
            return self
        from ta3n_tpu.data.quantized import quantize_rows
        q, s = quantize_rows(np.asarray(self.features))
        return FeatureStore(q, self.offsets, self.paths, self.labels,
                            scales=s)

    def num_frames(self, video_idx: np.ndarray) -> np.ndarray:
        video_idx = np.asarray(video_idx)
        return self.offsets[video_idx + 1] - self.offsets[video_idx]

    def records(self) -> List[VideoRecord]:
        nf = self.offsets[1:] - self.offsets[:-1]
        return [VideoRecord(p, int(n), int(l))
                for p, n, l in zip(self.paths, nf, self.labels)]

    def index_of(self, path: str) -> int:
        return self._path_index[path]

    # ---- gather ----
    use_native_gather = True   # class-level switch (native lib optional)

    def gather(self, video_idx: np.ndarray, frame_idx: np.ndarray,
               dtype=np.float32) -> np.ndarray:
        """Gather [B, T(, streams), D] features.

        video_idx: [B]; frame_idx: [B, T] 0-based within-video indices.
        Flow stores return [B, T*streams, D] with x/y interleaved per frame
        (parity with dataset.py:62-66 extending [x, y] per step).
        Uses the native threaded row-gather (native/feature_gather.cc)
        when the library is built, numpy fancy indexing otherwise.
        """
        video_idx = np.asarray(video_idx)
        frame_idx = np.asarray(frame_idx)
        rows = None
        if self.use_native_gather:
            from ta3n_tpu.data.native_gather import native_gather
            rows = native_gather(self.features, self.offsets, video_idx,
                                 frame_idx)  # row memcpy, dtype-agnostic
        if rows is None:
            abs_idx = self.offsets[video_idx][:, None] + frame_idx
            rows = self.features[abs_idx]
        if self.quantized:
            # same cast-then-multiply order as the on-device dequant
            # (device_gather) and dequantize_rows — bitwise-identical
            abs_idx = self.offsets[video_idx][:, None] + frame_idx
            s = np.asarray(self.scales[abs_idx], np.float32)
            rows = rows.astype(np.float32) * s.reshape(
                s.shape + (1,) * (rows.ndim - 2))
        out = np.asarray(rows, dtype=dtype)
        if out.ndim == 4:  # [B, T, streams, D] -> [B, T*streams, D]
            b, t, s, d = out.shape
            out = out.reshape(b, t * s, d)
        return out

    # ---- persistence ----
    def save(self, directory: str) -> None:
        os.makedirs(directory, exist_ok=True)
        np.save(os.path.join(directory, "features.npy"), self.features)
        np.save(os.path.join(directory, "offsets.npy"), self.offsets)
        if self.quantized:
            np.save(os.path.join(directory, "scales.npy"), self.scales)
        meta = {
            "paths": self.paths,
            "labels": self.labels.tolist(),
            "feature_dim": int(self.feature_dim),
            "num_streams": int(self.num_streams),
        }
        if self.quantized:
            meta["store_dtype"] = "int8"
        with open(os.path.join(directory, "meta.json"), "w") as f:
            json.dump(meta, f)

    @classmethod
    def load(cls, directory: str, mmap: bool = True) -> "FeatureStore":
        features = np.load(os.path.join(directory, "features.npy"),
                           mmap_mode="r" if mmap else None)
        offsets = np.load(os.path.join(directory, "offsets.npy"))
        scales_path = os.path.join(directory, "scales.npy")
        scales = (np.load(scales_path) if os.path.exists(scales_path)
                  else None)
        with open(os.path.join(directory, "meta.json")) as f:
            meta = json.load(f)
        return cls(features, offsets, meta["paths"], meta["labels"],
                   scales=scales)

    # ---- construction ----
    @classmethod
    def from_arrays(cls, per_video_features: Sequence[np.ndarray],
                    paths: Sequence[str], labels: Sequence[int]
                    ) -> "FeatureStore":
        counts = [f.shape[0] for f in per_video_features]
        offsets = np.zeros(len(counts) + 1, dtype=np.int64)
        offsets[1:] = np.cumsum(counts)
        features = np.concatenate(per_video_features, axis=0)
        return cls(features, offsets, paths, labels)

    def subset(self, indices: Sequence[int]) -> "FeatureStore":
        feats = [self.features[self.offsets[i]:self.offsets[i + 1]]
                 for i in indices]
        sub = FeatureStore.from_arrays(
            feats, [self.paths[i] for i in indices],
            [int(self.labels[i]) for i in indices])
        if self.quantized:
            sub.scales = np.concatenate(
                [self.scales[self.offsets[i]:self.offsets[i + 1]]
                 for i in indices])
        return sub
