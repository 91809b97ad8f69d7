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


def test_two_process_distributed_matches_single_process():
    """REAL multi-host integration (VERDICT r2 next-#2): two local
    processes with 4 virtual CPU devices each form a global 8-device
    mesh via jax.distributed.initialize, run the flagship device-store
    multi-step with per-host host_batch_slice feeding, and must match
    the single-process 8-device oracle parameter-for-parameter
    (scripts/multihost_integration.py; result JSON also committed as
    MULTIHOST_r03.json)."""
    import json
    import os
    import subprocess
    import sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable,
         os.path.join(repo, "scripts", "multihost_integration.py")],
        capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-2000:]
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    assert result["ok"]
    assert result["max_param_dev_vs_single_process"] < 1e-5
    assert result["max_param_dev_between_processes"] < 1e-6


def test_multihost_preemption_resume_bitwise():
    """Multi-host preemption/resume composition (VERDICT r3 #5): a
    2-process Trainer job (device-store, K-step scan, device-sampled) is
    SIGTERMed on every host after epoch 2 — real signals, like a pod
    preemption — the primary host's emergency path writes the shared
    checkpoint (train/loop.py _sigterm_as_interrupt + fit's crash
    handler), both hosts relaunch with --resume_hp semantics, and the
    finished job's parameters must be BITWISE an uninterrupted
    2-process run's (scripts/multihost_integration.py --section
    preemption; result JSON also committed as MULTIHOST_r04.json)."""
    import json
    import os
    import subprocess
    import sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable,
         os.path.join(repo, "scripts", "multihost_integration.py"),
         "--section", "preemption"],
        capture_output=True, text=True, timeout=1500)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-2000:]
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    assert result["ok"]
    assert result["max_param_dev_resumed_vs_straight"] == 0.0
    assert result["max_param_dev_between_processes"] == 0.0
    assert result["emergency_checkpoint_written"]
