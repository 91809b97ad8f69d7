"""FAST PROXIES: TSN sampler checks against scalar re-derivations of the
reference formulas (dataset.py:76-116).

The authoritative oracle is tests/test_ref_dataset_oracle.py, which
drives the reference's OWN TSNDataSet (indices, get() stack on real .t7
fixtures, repeat-to, Diff new_length, crash-repro for its short-video
defects); these mirror-based tests stay for quick iteration only."""

import numpy as np

from ta3n_tpu.data.samplers import (expand_new_length, sample_indices_random,
                                    sample_indices_test, sample_indices_val)


def ref_val_indices(num_frames, num_segments, new_length):
    # dataset.py:92-101, shifted to 0-based
    num_min = num_segments + new_length - 1
    num_select = num_frames - new_length + 1
    if num_frames >= num_min:
        tick = float(num_select) / float(num_segments)
        return np.array([int(tick / 2.0 + tick * float(x))
                         for x in range(num_segments)])
    return np.zeros((num_segments,), dtype=np.int64)


def ref_test_indices(num_frames, num_segments, new_length):
    # dataset.py:103-116, shifted to 0-based
    num_min = num_segments + new_length - 1
    num_select = num_frames - new_length + 1
    if num_frames >= num_min:
        tick = float(num_select) / float(num_segments)
        return np.array([int(tick / 2.0 + tick * float(x))
                         for x in range(num_segments)])
    id_select = np.array([x for x in range(num_select)])
    id_expand = (np.ones(num_segments - num_select, dtype=int)
                 * id_select[id_select[0] - 1])
    return np.append(id_select, id_expand)


def test_val_indices_match_reference():
    for n in [3, 5, 6, 9, 25, 100, 7]:
        for s, nl in [(5, 1), (5, 5), (3, 1), (25, 1)]:
            got = sample_indices_val(np.array([n]), s, nl)[0]
            want = ref_val_indices(n, s, nl)
            np.testing.assert_array_equal(got, want, err_msg=f"n={n},s={s},nl={nl}")


def test_test_indices_match_reference():
    for n in [3, 4, 5, 6, 9, 25, 100]:
        for s, nl in [(5, 1), (3, 1), (25, 1)]:
            got = sample_indices_test(np.array([n]), s, nl)[0]
            want = ref_test_indices(n, s, nl)
            np.testing.assert_array_equal(got, want, err_msg=f"n={n},s={s},nl={nl}")


def test_random_indices_in_valid_chunks():
    rng = np.random.default_rng(0)
    n = np.array([50, 7, 5, 3])
    s, nl = 5, 1
    idx = sample_indices_random(n, s, nl, rng)
    assert idx.shape == (4, 5)
    # long video: offsets within [i*avg, (i+1)*avg)
    avg = (50 - nl + 1) // s
    for i in range(s):
        assert avg * i <= idx[0, i] < avg * (i + 1)
    # medium video (avg==1): valid frame range
    assert np.all(idx[1] >= 0) and np.all(idx[1] < 7)
    # n == segments: avg = (5-1+1)//5 = 1 > 0 -> chunked
    assert np.all(idx[2] == np.arange(5))
    # too short: zeros
    np.testing.assert_array_equal(idx[3], np.zeros(5))


def test_random_indices_sorted_when_medium():
    rng = np.random.default_rng(1)
    idx = sample_indices_random(np.array([7]), 5, 1, rng)[0]
    assert np.all(np.diff(idx) >= 0)  # dataset.py:87 sorts


def test_expand_new_length_clamps_at_end():
    # dataset.py:134-139: p advances only while p < num_frames
    idx = np.array([[0, 3]])
    out = expand_new_length(idx, np.array([5]), 3)
    np.testing.assert_array_equal(out, [[0, 1, 2, 3, 4, 4]])


def test_expand_new_length_identity():
    idx = np.array([[1, 2, 3]])
    np.testing.assert_array_equal(expand_new_length(idx, np.array([9]), 1),
                                  idx)
