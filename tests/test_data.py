"""Manifest / feature-store / loader tests."""

import numpy as np
import pytest

from ta3n_tpu.data import (FeatureStore, TSNLoader, VideoRecord,
                           epoch_balance_counts, parse_list_file, repeat_to)
from ta3n_tpu.data.synthetic import make_synthetic_store


def test_repeat_to_matches_reference_semantics():
    # dataset.py:69-74: list * (n//len) + list[:n%len]
    recs = [VideoRecord(f"v{i}", 10, 0) for i in range(3)]
    out = repeat_to(recs, 8)
    assert [r.path for r in out] == ["v0", "v1", "v2"] * 2 + ["v0", "v1"]
    assert len(repeat_to(recs, 2)) == 2
    assert len(repeat_to(recs, 3)) == 3


def test_epoch_balance_counts_script_numbers():
    # main.py:144-153 with script_train_val.sh numbers (1438/840, 128/74)
    ns, nt = epoch_balance_counts(1438, 840, 128, 74, ("N", "Y"))
    assert ns == 1438
    # num_max_iter = max(1438/128, 840/74) = 11.35; round(11.35*74) = 840
    assert nt == round(max(1438 / 128, 840 / 74) * 74)
    ns2, nt2 = epoch_balance_counts(1438, 840, 128, 74, ("Y", "Y"))
    assert ns2 == round(max(1438 / 128, 840 / 74) * 128)


def test_parse_list_file(tmp_path):
    p = tmp_path / "list.txt"
    p.write_text("a/b 25 3\nc/d 7 0\n")
    recs = parse_list_file(str(p))
    assert recs[0] == VideoRecord("a/b", 25, 3)
    assert recs[1].label == 0


def test_feature_store_roundtrip(tmp_path):
    store = make_synthetic_store(6, 3, 16, seed=0)
    store.save(str(tmp_path / "store"))
    loaded = FeatureStore.load(str(tmp_path / "store"))
    assert loaded.num_videos == 6
    assert loaded.feature_dim == 16
    np.testing.assert_array_equal(loaded.offsets, store.offsets)
    g1 = store.gather(np.array([0, 2]), np.array([[0, 1], [3, 3]]))
    g2 = loaded.gather(np.array([0, 2]), np.array([[0, 1], [3, 3]]))
    np.testing.assert_allclose(g1, g2)
    assert g1.shape == (2, 2, 16)


def test_feature_store_flow_interleave():
    feats = [np.arange(5 * 2 * 3, dtype=np.float32).reshape(5, 2, 3)]
    store = FeatureStore(feats[0], np.array([0, 5]), ["v"], [0])
    out = store.gather(np.array([0]), np.array([[1, 3]]))
    # frame 1 -> rows (x=feats[1,0], y=feats[1,1]) then frame 3
    assert out.shape == (1, 4, 3)
    np.testing.assert_allclose(out[0, 0], feats[0][1, 0])
    np.testing.assert_allclose(out[0, 1], feats[0][1, 1])
    np.testing.assert_allclose(out[0, 2], feats[0][3, 0])


def test_loader_shapes_and_mask():
    store = make_synthetic_store(10, 2, 8, seed=1)
    loader = TSNLoader(store, batch_size=4, num_segments=3, mode="test",
                       shuffle=False)
    batches = list(loader.epoch())
    assert len(batches) == 3  # ceil(10/4)
    assert batches[0].features.shape == (4, 3, 8)
    np.testing.assert_array_equal(batches[0].mask, np.ones(4))
    np.testing.assert_array_equal(batches[2].mask, [1, 1, 0, 0])


def test_loader_repeat_num_dataload():
    store = make_synthetic_store(4, 2, 8, seed=2)
    loader = TSNLoader(store, num_dataload=10, batch_size=5, mode="test")
    assert loader.num_videos == 10
    assert len(loader) == 2


def test_loader_shuffle_determinism():
    store = make_synthetic_store(8, 2, 8, seed=3)
    l1 = TSNLoader(store, batch_size=4, mode="test", seed=7)
    l2 = TSNLoader(store, batch_size=4, mode="test", seed=7)
    b1 = next(iter(l1.epoch()))
    b2 = next(iter(l2.epoch()))
    np.testing.assert_array_equal(b1.labels, b2.labels)
    np.testing.assert_allclose(b1.features, b2.features)
