"""Prefetch iterators: ordering, completeness, laziness, device placement,
and sampler goldens at new_length > 1."""

import time

import numpy as np

from ta3n_tpu.data.loader import Batch, device_prefetch, prefetch
from ta3n_tpu.data.samplers import sample_indices_test, sample_indices_val


def test_prefetch_preserves_order_and_items():
    items = list(range(50))
    out = list(prefetch(iter(items), depth=3))
    assert out == items


def test_prefetch_overlaps_production():
    timeline = []

    def slow_gen():
        for i in range(5):
            time.sleep(0.02)
            timeline.append(("produced", i))
            yield i

    it = prefetch(slow_gen(), depth=2)
    time.sleep(0.08)  # producer runs ahead while consumer sleeps
    first = next(it)
    assert first == 0
    produced = [e for e in timeline if e[0] == "produced"]
    assert len(produced) >= 2  # at least depth items were pre-produced


def test_device_prefetch_roundtrip():
    batches = [Batch(np.full((2, 3), i, np.float32),
                     np.full(2, i, np.int32), np.ones(2, np.float32))
               for i in range(7)]
    out = list(device_prefetch(iter(batches), sharding=None, depth=2))
    assert len(out) == 7
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b.features),
                                      batches[i].features)
        assert hasattr(b.features, "devices")  # on device


def ref_central(num_frames, num_segments, new_length):
    num_select = num_frames - new_length + 1
    tick = float(num_select) / float(num_segments)
    return np.array([int(tick / 2.0 + tick * float(x))
                     for x in range(num_segments)])


def test_samplers_new_length_grid():
    # dataset.py:92-116 with new_length in {5, 6} (Flow / RGBDiff)
    for nl in (5, 6):
        for n in (12, 25, 40, 100):
            for s in (3, 5):
                if n < s + nl - 1:
                    continue
                want = ref_central(n, s, nl)
                got_v = sample_indices_val(np.array([n]), s, nl)[0]
                got_t = sample_indices_test(np.array([n]), s, nl)[0]
                np.testing.assert_array_equal(got_v, want)
                np.testing.assert_array_equal(got_t, want)


def test_abandoned_prefetch_stops_producer_thread():
    """zip-shortest abandons the longer loader's prefetch mid-epoch; the
    producer thread must exit instead of blocking forever (review
    finding: one leaked thread + buffered batches per epoch)."""
    import time
    from ta3n_tpu.data.loader import prefetch

    def infinite():
        i = 0
        while True:
            yield i
            i += 1

    p = prefetch(infinite(), depth=2)
    assert next(p) == 0
    thread = p._thread
    p.close()
    thread.join(timeout=5.0)
    assert not thread.is_alive()

    # abandonment via garbage collection also stops it
    p2 = prefetch(infinite(), depth=2)
    t2 = p2._thread
    next(p2)
    del p2
    import gc
    gc.collect()
    t2.join(timeout=5.0)
    assert not t2.is_alive()
