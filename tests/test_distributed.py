"""Multi-host helpers (single-process semantics; pod runs are ROADMAP #2)."""

import jax
import pytest

from ta3n_tpu.parallel.distributed import host_batch_slice, is_primary_host


def test_host_batch_slice_single_process():
    assert jax.process_count() == 1
    assert host_batch_slice(128) == (0, 128)
    assert is_primary_host()


def test_host_batch_slice_divisibility():
    with pytest.raises(ValueError):
        # anything not divisible by process_count(=1) is impossible, so
        # force the error with a mocked count
        import ta3n_tpu.parallel.distributed as d
        orig = jax.process_count
        jax.process_count = lambda: 3
        try:
            d.host_batch_slice(128)
        finally:
            jax.process_count = orig


def test_host_batch_slice_mocked_multiprocess():
    import ta3n_tpu.parallel.distributed as d
    orig_count, orig_idx = jax.process_count, jax.process_index
    try:
        jax.process_count = lambda: 4
        jax.process_index = lambda: 2
        assert d.host_batch_slice(128) == (64, 96)
    finally:
        jax.process_count, jax.process_index = orig_count, orig_idx
