"""Synthetic two-domain feature data for tests and benchmarks.

Generates class-conditional Gaussian frame features with a controllable
domain shift — the integration-test analogue of the UCF/HMDB feature
stores (SURVEY §4: tiny synthetic store, assert loss decreases / DA
improves target accuracy).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ta3n_tpu.data.feature_store import FeatureStore

__all__ = ["make_synthetic_store", "make_domain_pair",
           "make_rotated_domain_pair"]


def make_synthetic_store(num_videos: int, num_class: int, feature_dim: int,
                         min_frames: int = 8, max_frames: int = 40,
                         shift: float = 0.0, seed: int = 0,
                         prefix: str = "vid") -> FeatureStore:
    rng = np.random.default_rng(seed)
    # class centroids shared across domains; `shift` moves the whole domain
    centroids = np.random.default_rng(12345).normal(
        0.0, 1.0, size=(num_class, feature_dim))
    shift_vec = np.random.default_rng(54321).normal(
        0.0, 1.0, size=(feature_dim,)) * shift

    feats, paths, labels = [], [], []
    for i in range(num_videos):
        label = int(rng.integers(0, num_class))
        n = int(rng.integers(min_frames, max_frames + 1))
        base = centroids[label] + shift_vec
        f = base[None, :] + rng.normal(0.0, 1.0, size=(n, feature_dim))
        feats.append(f.astype(np.float32))
        paths.append(f"{prefix}_{i:05d}")
        labels.append(label)
    return FeatureStore.from_arrays(feats, paths, labels)


def _rotation_matrix(dim: int, angle_deg: float, seed: int) -> np.ndarray:
    """Orthogonal rotation by angle_deg in dim//2 random planes: Givens
    blocks conjugated by a random orthogonal basis (QR of a Gaussian)."""
    theta = np.deg2rad(angle_deg)
    g = np.eye(dim)
    c, s = np.cos(theta), np.sin(theta)
    for i in range(0, dim - 1, 2):
        g[i, i], g[i, i + 1] = c, -s
        g[i + 1, i], g[i + 1, i + 1] = s, c
    q, _ = np.linalg.qr(np.random.default_rng(seed).normal(
        size=(dim, dim)))
    return (q @ g @ q.T).astype(np.float64)


def make_rotated_domain_pair(num_source: int = 64, num_target: int = 64,
                             num_val: int = 64, num_class: int = 4,
                             feature_dim: int = 16,
                             angle_deg: float = 45.0,
                             centroid_scale: float = 2.0,
                             min_frames: int = 8, max_frames: int = 24,
                             seed: int = 0, task_seed: int = 0
                             ) -> Tuple[FeatureStore, FeatureStore,
                                        FeatureStore]:
    """Covariate shift where source-only training provably fails: the
    TARGET domain is the source generative process rotated by
    ``angle_deg`` in feature_dim//2 random orthogonal planes.  Unlike
    the translation shift of make_domain_pair (which a video-level
    classifier shrugs off — ROADMAP r1 note), a rotation moves every
    class centroid relative to the others, so source decision boundaries
    misclassify target videos; a moderate angle keeps each rotated
    centroid closest to its own original, so adversarial alignment
    (DANN/TA3N) can recover the correct correspondence.  This is the
    in-environment stand-in for the reference's published DA gains
    (BASELINE.md accuracy tables; /root/reference/main.py:437-562).

    ``task_seed`` fixes the task GEOMETRY (centroids + rotation plane);
    ``seed`` varies only the sampled videos/noise — so multi-seed runs
    measure training variance on one fixed benchmark task."""
    cen_rng = np.random.default_rng(9999 + task_seed)
    centroids = cen_rng.normal(0.0, 1.0, size=(num_class, feature_dim))
    centroids *= centroid_scale / np.linalg.norm(
        centroids, axis=1, keepdims=True).mean()
    rot = _rotation_matrix(feature_dim, angle_deg, seed=777 + task_seed)

    def build(n, rotate, sd, prefix):
        rng = np.random.default_rng(sd)
        feats, paths, labels = [], [], []
        for i in range(n):
            label = i % num_class  # balanced classes
            nf = int(rng.integers(min_frames, max_frames + 1))
            f = centroids[label][None, :] + rng.normal(
                0.0, 1.0, size=(nf, feature_dim))
            if rotate:
                f = f @ rot.T
            feats.append(f.astype(np.float32))
            paths.append(f"{prefix}_{i:05d}")
            labels.append(label)
        return FeatureStore.from_arrays(feats, paths, labels)

    src = build(num_source, False, seed + 11, "src")
    tgt = build(num_target, True, seed + 22, "tgt")
    val = build(num_val, True, seed + 33, "val")
    return src, tgt, val


def make_domain_pair(num_source: int = 64, num_target: int = 48,
                     num_val: int = 32, num_class: int = 4,
                     feature_dim: int = 64, shift: float = 1.5,
                     seed: int = 0
                     ) -> Tuple[FeatureStore, FeatureStore, FeatureStore]:
    src = make_synthetic_store(num_source, num_class, feature_dim,
                               shift=0.0, seed=seed, prefix="src")
    tgt = make_synthetic_store(num_target, num_class, feature_dim,
                               shift=shift, seed=seed + 1, prefix="tgt")
    val = make_synthetic_store(num_val, num_class, feature_dim,
                               shift=shift, seed=seed + 2, prefix="val")
    return src, tgt, val
