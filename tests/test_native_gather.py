"""Native C++ gather: equivalence with numpy fancy indexing + bounds."""

import numpy as np
import pytest

from ta3n_tpu.data.feature_store import FeatureStore
from ta3n_tpu.data.native_gather import (build_native, load_native,
                                         native_available, native_gather)


@pytest.fixture(scope="module", autouse=True)
def ensure_built():
    load_native(build_if_missing=True)
    if not native_available():
        pytest.skip("native library not built and g++ unavailable")


def make_store(streams=1):
    rng = np.random.default_rng(0)
    feats = []
    for i in range(7):
        n = int(rng.integers(4, 12))
        shape = (n, streams, 16) if streams > 1 else (n, 16)
        feats.append(rng.normal(size=shape).astype(np.float32))
    return FeatureStore.from_arrays(feats, [f"v{i}" for i in range(7)],
                                    list(range(7)))


def test_native_matches_numpy():
    store = make_store()
    rng = np.random.default_rng(1)
    vids = rng.integers(0, 7, size=5)
    nf = store.num_frames(vids)
    frames = (rng.random((5, 4)) * nf[:, None]).astype(np.int64)
    got = native_gather(store.features, store.offsets, vids, frames)
    want = store.features[store.offsets[vids][:, None] + frames]
    np.testing.assert_array_equal(got, want)


def test_native_matches_numpy_multistream():
    store = make_store(streams=2)
    vids = np.array([0, 3])
    frames = np.array([[0, 1], [2, 0]])
    got = native_gather(store.features, store.offsets, vids, frames)
    want = store.features[store.offsets[vids][:, None] + frames]
    np.testing.assert_array_equal(got, want)
    assert got.shape == (2, 2, 2, 16)


def test_store_uses_native_and_matches_fallback():
    store = make_store()
    vids = np.array([1, 2, 6])
    frames = np.array([[0, 1, 2], [1, 1, 1], [3, 0, 2]])
    store.use_native_gather = True
    a = store.gather(vids, frames)
    store.use_native_gather = False
    b = store.gather(vids, frames)
    np.testing.assert_array_equal(a, b)


def test_native_bounds_check():
    store = make_store()
    vids = np.array([0])
    frames = np.array([[10_000]])
    with pytest.raises(IndexError):
        native_gather(store.features, store.offsets, vids, frames)


def test_native_rejects_noncontiguous():
    store = make_store()
    # a transposed (non-contiguous) view must fall back, not crash
    assert native_gather(store.features.T, store.offsets,
                         np.array([0]), np.array([[0]])) is None
