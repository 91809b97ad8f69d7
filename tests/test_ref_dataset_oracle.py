"""Data-layer oracle: the reference's OWN TSNDataSet executing in-process
(tests/ref_harness.py) vs our manifest / samplers / FeatureStore / loader.

Round-4's sampler tests (test_samplers.py) re-derived the reference
formulas by hand; here the ground truth is /root/reference/dataset.py
itself: real ``.t7`` fixture files (torch.save), the reference's own
``_sample_indices`` / ``_get_val_indices`` / ``_get_test_indices``
(dataset.py:76-116), its ``get()`` load stack with the end clamp
(dataset.py:128-144), its repeat-to ``_parse_list`` (dataset.py:69-74)
and the Diff new_length+1 rule (dataset.py:48-49) — fuzzed over
(num_frames 1..40) x (segments 3/5/25) x (new_length 1/5/6) and both
modalities.  Feature values encode (video, frame, stream), so any index
arithmetic error surfaces as a value mismatch, not just a shape one.

The training sampler is random: to pin it value-for-value, the module's
``randint`` (dataset.py:6) is monkeypatched to a deterministic function
of (modulus, position) and our sampler runs with a fake Generator that
computes the same function — both sides then must produce identical
indices through their different (per-video loop vs vectorised) shapes.
"""

import os

import numpy as np
import pytest
import torch

from ta3n_tpu.cli.convert_features import convert
from ta3n_tpu.data.loader import TSNLoader
from ta3n_tpu.data.manifest import parse_list_file, repeat_to
from ta3n_tpu.data.samplers import (expand_new_length,
                                    sample_indices_random,
                                    sample_indices_test,
                                    sample_indices_val)

from tests import ref_harness

D = 4                                     # feature dim of the fixtures
FR_GRID = list(range(1, 41))              # num_frames fuzz range
SEG_GRID = [3, 5, 25]
LEN_GRID = [1, 5, 6]


def _feature(v: int, f: int, stream: int = 0) -> np.ndarray:
    """Unique per (video, 1-based frame, stream) so gathers are checkable."""
    return np.asarray([v, f, v * 1000 + f, stream * 10000 + f],
                      dtype=np.float32)


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    """Reference-layout .t7-per-frame feature dirs + list file, both
    modalities, over a spread of video lengths."""
    root = tmp_path_factory.mktemp("ref_t7")
    num_frames = [1, 2, 3, 5, 7, 12, 25]
    lines = []
    for v, n in enumerate(num_frames):
        d = root / f"video_{v}"
        d.mkdir()
        for f in range(1, n + 1):
            torch.save(torch.from_numpy(_feature(v, f, 0)),
                       str(d / f"img_{f:05d}.t7"))
            torch.save(torch.from_numpy(_feature(v, f, 1)),
                       str(d / f"img_x_{f:05d}.t7"))
            torch.save(torch.from_numpy(_feature(v, f, 2)),
                       str(d / f"img_y_{f:05d}.t7"))
        lines.append(f"{d} {n} {v % 3}")
    list_file = root / "list.txt"
    list_file.write_text("\n".join(lines) + "\n")
    return str(list_file), num_frames


def _ref_dataset(list_file, num_dataload, segments, new_length,
                 modality="RGB", tmpl="img_{:05d}.t7", **kw):
    ns = ref_harness.load_reference()
    return ns.dataset.TSNDataSet("", list_file, num_dataload=num_dataload,
                                 num_segments=segments,
                                 new_length=new_length, modality=modality,
                                 image_tmpl=tmpl, **kw)


def _record(n: int):
    ns = ref_harness.load_reference()
    return ns.dataset.VideoRecord(["p", str(n), "0"])


# ---------------------------------------------------------------- indices

@pytest.mark.parametrize("segments", SEG_GRID)
@pytest.mark.parametrize("new_length", LEN_GRID)
def test_val_indices_match_reference(fixtures, segments, new_length):
    """_get_val_indices (dataset.py:92-101): centre-of-segment, zeros when
    too short; ours is 0-based (the reference's +1 is file naming)."""
    list_file, _ = fixtures
    ds = _ref_dataset(list_file, 7, segments, new_length)
    ours = sample_indices_val(np.asarray(FR_GRID), segments,
                              ds.new_length)
    for i, n in enumerate(FR_GRID):
        ref = ds._get_val_indices(_record(n)).astype(np.int64)
        np.testing.assert_array_equal(
            ours[i] + 1, ref, err_msg=f"val indices n={n} S={segments} "
                                      f"L={ds.new_length}")


@pytest.mark.parametrize("segments", SEG_GRID)
@pytest.mark.parametrize("new_length", LEN_GRID)
def test_test_indices_match_reference(fixtures, segments, new_length):
    """_get_test_indices (dataset.py:103-116) incl. the short-video
    duplication branch (id_expand repeats id_select[-1]).  Videos with
    num_frames < new_length crash the reference itself (empty id_select,
    see test_test_sampler_crashes_reference_...) and are excluded."""
    list_file, _ = fixtures
    ds = _ref_dataset(list_file, 7, segments, new_length, test_mode=True)
    grid = [n for n in FR_GRID if n - ds.new_length + 1 >= 1]
    ours = sample_indices_test(np.asarray(grid), segments, ds.new_length)
    for i, n in enumerate(grid):
        ref = ds._get_test_indices(_record(n)).astype(np.int64)
        np.testing.assert_array_equal(
            ours[i] + 1, ref, err_msg=f"test indices n={n} S={segments} "
                                      f"L={ds.new_length}")


def test_test_sampler_crashes_reference_on_videos_shorter_than_new_length(
        fixtures):
    """Reference defect (documented divergence): num_frames < new_length
    makes num_select <= 0, so id_select is EMPTY and
    ``id_select[id_select[0]-1]`` raises IndexError (dataset.py:110-113)
    — e.g. any Flow/Diff (L=5/6) video under 5 frames kills the test
    loader.  Ours clamps to frame 0 and keeps such videos loadable."""
    list_file, _ = fixtures
    ds = _ref_dataset(list_file, 7, 3, 5, test_mode=True)
    with pytest.raises(IndexError):
        ds._get_test_indices(_record(3))
    ours = sample_indices_test(np.asarray([3]), 3, 5)
    assert (ours == 0).all()


def _pinned_randint(hi, size=None):
    """Deterministic stand-in for numpy randint: a pure function of
    (modulus, position) so the reference's per-video draws and our
    batched draws see identical values regardless of call order."""
    hi = int(hi)
    j = np.arange(size if size is not None else 1, dtype=np.int64)
    return (j * 10007 + hi * 40503) % hi


class _PinnedGenerator:
    """Our samplers' Generator API over the same (modulus, position)
    function; hi arrives as a [B, 1] column broadcast to (B, S)."""

    def integers(self, lo, hi, size):
        assert lo == 0
        hi_b = np.broadcast_to(np.asarray(hi, np.int64), size)
        j = np.broadcast_to(np.arange(size[1], dtype=np.int64)[None, :],
                            size)
        return (j * 10007 + hi_b * 40503) % hi_b


@pytest.mark.parametrize("segments", SEG_GRID)
@pytest.mark.parametrize("new_length", [1, 5])
def test_random_indices_match_reference_pinned(fixtures, monkeypatch,
                                               segments, new_length):
    """_sample_indices (dataset.py:76-90): all three branches (random
    offset per chunk / sorted randint / zeros), value-for-value under the
    pinned randint.  num_frames where the reference itself crashes
    (randint of a non-positive bound, see
    test_random_sampler_crashes_reference_on_short_diff_videos) are
    excluded from the value comparison."""
    list_file, _ = fixtures
    ds = _ref_dataset(list_file, 7, segments, new_length)
    ns = ref_harness.load_reference()
    monkeypatch.setattr(ns.dataset, "randint", _pinned_randint)

    L = ds.new_length
    valid = [n for n in FR_GRID
             if (n - L + 1) // segments > 0 or n <= segments
             or n - L + 1 > 0]
    ours = sample_indices_random(np.asarray(valid), segments, L,
                                 _PinnedGenerator())
    for i, n in enumerate(valid):
        ref = ds._sample_indices(_record(n)).astype(np.int64)
        np.testing.assert_array_equal(
            ours[i] + 1, ref,
            err_msg=f"random indices n={n} S={segments} L={L}")


def test_random_sampler_crashes_reference_on_short_diff_videos(fixtures,
                                                               ):
    """Reference defect (documented divergence): for S < num_frames <
    S+L-1 the sorted-randint branch calls randint(num_frames-L+1) with a
    NON-POSITIVE bound (dataset.py:85) and numpy raises — e.g. Flow/Diff
    (L=5) videos of 4..7 frames with 3 segments.  Ours clamps the bound
    to 1 (frame 0), keeping short videos loadable."""
    list_file, _ = fixtures
    ds = _ref_dataset(list_file, 7, 3, 5)  # L=5, S=3
    n = 4                                  # S < 4 < S+L-1 = 7
    with pytest.raises(ValueError):
        ds._sample_indices(_record(n))
    ours = sample_indices_random(np.asarray([n]), 3, 5,
                                 np.random.default_rng(0))
    assert (ours == 0).all()


def test_diff_modality_extends_new_length(fixtures):
    """RGBDiff* adds one frame for the difference (dataset.py:48-49);
    ModelConfig.sample_new_length encodes the same rule statically."""
    from ta3n_tpu.config import ModelConfig
    list_file, _ = fixtures
    for modality in ("RGBDiff", "RGBDiff2", "RGBDiffplus"):
        ds = _ref_dataset(list_file, 7, 3, 5, modality=modality)
        assert ds.new_length == 6
        cfg = ModelConfig(num_class=2, modality=modality, feature_dim=D)
        assert cfg.sample_new_length == 6
    assert _ref_dataset(list_file, 7, 3, 1).new_length == 1
    assert _ref_dataset(list_file, 7, 3, 5, modality="Flow").new_length == 5


# ---------------------------------------------------------------- repeat-to

@pytest.mark.parametrize("num_dataload", [7, 10, 14, 23, 3])
def test_repeat_to_matches_reference(fixtures, num_dataload):
    """_parse_list repeat-to (dataset.py:69-74): list*(n//len) +
    list[:n%len] — including num_dataload < len (truncation)."""
    list_file, _ = fixtures
    ds = _ref_dataset(list_file, num_dataload, 3, 1)
    ref_paths = [r.path for r in ds.video_list]
    ours = repeat_to(parse_list_file(list_file), num_dataload)
    assert [r.path for r in ours] == ref_paths
    assert [r.num_frames for r in ours] == \
        [r.num_frames for r in ds.video_list]
    assert len(ds) == num_dataload


# ---------------------------------------------------------------- get()

def _stack_all(ds):
    """All videos' stacked tensors + labels through the reference's own
    __getitem__ -> get() (dataset.py:121-144)."""
    feats, labels = [], []
    for i in range(len(ds)):
        x, y = ds[i]
        feats.append(x.numpy())
        labels.append(y)
    return np.stack(feats), np.asarray(labels)


def _filtered_list(list_file, tmp_path, min_frames):
    """List restricted to videos the reference can sample at all
    (num_frames >= new_length; shorter ones crash its test sampler)."""
    kept = [r for r in parse_list_file(list_file)
            if r.num_frames >= min_frames]
    out = tmp_path / f"list_min{min_frames}.txt"
    out.write_text("".join(f"{r.path} {r.num_frames} {r.label}\n"
                           for r in kept))
    return str(out), len(kept)


@pytest.mark.parametrize("new_length", [1, 5])
def test_rgb_get_stack_matches_loader(fixtures, tmp_path, new_length):
    """End-to-end RGB: reference get() stack (incl. the p < num_frames
    end clamp, dataset.py:139-141) vs convert() -> FeatureStore ->
    TSNLoader in 'test' mode.  n=5 exercises the short-video duplication
    AND the clamp at L=5; sub-L videos only survive OUR loader (see the
    crash-repro test)."""
    list_file, _ = fixtures
    segments = 3
    list_file, n_vids = _filtered_list(list_file, tmp_path, new_length)
    ds = _ref_dataset(list_file, n_vids, segments, new_length,
                      test_mode=True)
    ref_feats, ref_labels = _stack_all(ds)

    store = convert(list_file, str(tmp_path / "store_rgb"), modality="RGB")
    loader = TSNLoader(store, batch_size=n_vids,
                       num_segments=segments, new_length=new_length,
                       mode="test", shuffle=False)
    (batch,) = list(loader.epoch())
    np.testing.assert_array_equal(batch.features, ref_feats)
    np.testing.assert_array_equal(batch.labels, ref_labels)
    assert batch.mask.all()


def test_flow_get_stack_matches_loader(fixtures, tmp_path):
    """End-to-end Flow: the reference extends [x, y] per step
    (dataset.py:62-66), i.e. x/y interleaved per frame; our 2-stream
    store gather emits the same [S*L*2, D] row order."""
    list_file, _ = fixtures
    segments, new_length = 3, 5
    list_file, n_vids = _filtered_list(list_file, tmp_path, new_length)
    ds = _ref_dataset(list_file, n_vids, segments, new_length,
                      modality="Flow", tmpl="img_{}_{:05d}.t7",
                      test_mode=True)
    ref_feats, ref_labels = _stack_all(ds)

    store = convert(list_file, str(tmp_path / "store_flow"),
                    modality="Flow", flow_prefix="img_")
    loader = TSNLoader(store, batch_size=n_vids,
                       num_segments=segments, new_length=new_length,
                       mode="test", shuffle=False)
    (batch,) = list(loader.epoch())
    np.testing.assert_array_equal(batch.features, ref_feats)
    np.testing.assert_array_equal(batch.labels, ref_labels)


def test_val_mode_get_stack_matches_loader(fixtures, tmp_path):
    """random_shift=False, test_mode=False -> _get_val_indices feeding
    get(): the loader's 'val' mode must reproduce the stack."""
    list_file, num_frames = fixtures
    segments, new_length = 5, 1
    ds = _ref_dataset(list_file, len(num_frames), segments, new_length,
                      random_shift=False)
    ref_feats, ref_labels = _stack_all(ds)

    store = convert(list_file, str(tmp_path / "store_val"), modality="RGB")
    loader = TSNLoader(store, batch_size=len(num_frames),
                       num_segments=segments, new_length=new_length,
                       mode="val", shuffle=False)
    (batch,) = list(loader.epoch())
    np.testing.assert_array_equal(batch.features, ref_feats)
    np.testing.assert_array_equal(batch.labels, ref_labels)


def test_expand_new_length_end_clamp_matches_reference(fixtures):
    """The get() frame walk increments p only while p < num_frames
    (dataset.py:139-141) — i.e. clamps at the LAST frame; pin our
    expand_new_length to the reference's own walk on its real indices."""
    list_file, _ = fixtures
    segments, new_length = 3, 6
    ds = _ref_dataset(list_file, 7, segments, new_length, test_mode=True)
    for n in FR_GRID:
        if n - new_length + 1 < 1:
            continue  # the reference's sampler crashes (crash-repro test)
        rec = _record(n)
        idx = ds._get_test_indices(rec)
        walked = []
        for seg_ind in idx:              # the reference's own loop shape
            p = int(seg_ind)
            for _ in range(ds.new_length):
                walked.append(p)
                if p < rec.num_frames:
                    p += 1
        ours = expand_new_length(idx.astype(np.int64)[None] - 1,
                                 np.asarray([n]), ds.new_length)[0] + 1
        np.testing.assert_array_equal(ours, np.asarray(walked),
                                      err_msg=f"end clamp n={n}")
