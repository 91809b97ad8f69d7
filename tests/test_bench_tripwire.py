"""bench.py perf-regression tripwire (VERDICT r4 #5) and the
self-describing JSON record (ADVICE r4: baseline_vps denominator in-band,
speculative V100 estimate demoted out of the headline output)."""

import json

import pytest

import jax

# bench.py flips the process-global PRNG impl to rbg at import (a
# deliberate benchmark setting); importing it at collection time would
# leak that into every later test's dropout streams (the conftest
# autouse snapshot runs AFTER collection — the exact leak CLAUDE.md
# warns about, observed as a test_bf16_training accuracy flake).
_impl = jax.config.jax_default_prng_impl
import bench  # noqa: E402

jax.config.update("jax_default_prng_impl", _impl)


def test_floor_applies_only_on_tpu_at_default_knobs(monkeypatch):
    monkeypatch.delenv("TA3N_BENCH_MIN_VPS", raising=False)
    floor = bench.tripwire_floor(True, "tpu")
    assert floor == pytest.approx(bench.TRIPWIRE_FRACTION
                                  * bench.SESSION_RECORD_VPS)
    assert bench.tripwire_floor(True, "cpu") == 0.0
    assert bench.tripwire_floor(False, "tpu") == 0.0


def test_floor_env_override(monkeypatch):
    monkeypatch.setenv("TA3N_BENCH_MIN_VPS", "123.5")
    assert bench.tripwire_floor(False, "cpu") == 123.5
    monkeypatch.setenv("TA3N_BENCH_MIN_VPS", "0")
    assert bench.tripwire_floor(True, "tpu") == 0.0


def test_deliberate_slowdown_trips(capsys):
    """A K=1-style halving (or worse) must exit non-zero; a normal run
    (within the recorded envelope) must not."""
    floor = bench.tripwire_floor(True, "tpu")
    assert bench.emit_and_check(0.4 * bench.SESSION_RECORD_VPS, floor) == 1
    err = capsys.readouterr().err
    assert "PERF REGRESSION" in err

    assert bench.emit_and_check(0.95 * bench.SESSION_RECORD_VPS, floor) == 0
    assert bench.emit_and_check(123456.0, 0.0) == 0  # check disabled


def test_record_is_one_selfdescribing_json_line(capsys):
    bench.emit_and_check(600000.0, bench.tripwire_floor(True, "tpu"))
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    rec = json.loads(out[0])
    assert rec["metric"] == "train_videos_per_sec_per_chip"
    assert rec["baseline_vps"] == bench.REFERENCE_MEASURED_CPU_VPS
    assert rec["vs_baseline"] == pytest.approx(
        600000.0 / bench.REFERENCE_MEASURED_CPU_VPS, rel=1e-3)
    assert "vs_v100_estimate" not in rec       # demoted to BENCH_NOTES.md
    assert rec["tripwire_floor_vps"] > 0


def test_default_knobs_arm_the_tripwire():
    """The driver runs bench.py with no TA3N_BENCH_* env, which must
    count as default knobs — otherwise the floor silently never applies
    (the test env sets none of them either)."""
    import os
    assert not any(k.startswith("TA3N_BENCH_") for k in os.environ)
    assert bench.DEFAULT_KNOBS is True
