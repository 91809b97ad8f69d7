"""Config-space trace sweep (SURVEY §2.7 flag surface).

Every sampled combination of the reference's categorical flags must
either trace a FULL train step + eval step (jax.eval_shape — zero FLOPs,
no compile) or raise the documented ValueError.  The reference crashes
or silently no-ops on many corners of this space (SURVEY §2.10:
tsn+JAN IndexError, 3D-feat discrepancy RuntimeError, DotProduct
accepted-but-unimplemented, ...); here the contract over the whole
space is CI-enforced.  scripts/config_space_sweep.py is the standalone
enumerator.
"""

import time

from scripts.config_space_sweep import (CANONICAL, check_combo,
                                        expected_error, sample_combos)

N_SAMPLES = 60  # + the canonical corners; ~1 s/combo of pure tracing


def test_canonical_corners_trace():
    for combo in CANONICAL:
        check_combo(combo)


def test_sampled_config_space_traces_or_errors():
    combos = sample_combos(N_SAMPLES, seed=0)[len(CANONICAL):]
    t0 = time.time()
    rejected = 0
    for combo in combos:
        check_combo(combo)
        rejected += expected_error(combo) is not None
    # the seeded sample must actually exercise the documented-reject path
    assert rejected >= 1, "seed produced no rejected combos; bump seed"
    assert time.time() - t0 < 600


def test_covering_design_executes():
    """Beyond tracing: a deterministic covering design — every
    executable categorical value of every axis effectively exercised in
    >= 2 combos — runs real optimizer steps + an eval step per combo,
    asserting finite losses, parameter movement, and masked-row
    invariance (VERDICT r3 item 4).  Excluded from execution (still
    trace-covered above): DotProduct (rejected by design) and
    pred_normalize='Y' ('in construction' in the reference,
    main.py:424-427)."""
    from scripts.config_space_sweep import (_effective_values,
                                            covering_combos, execute_combo)

    combos = covering_combos(min_cover=2)
    assert 10 <= len(combos) <= 40, len(combos)

    # the design actually covers what it claims
    from collections import Counter
    cover = Counter()
    for c in combos:
        assert expected_error(c) is None, c
        cover.update(_effective_values(c))
    from scripts.config_space_sweep import AXES
    for k, vals in AXES.items():
        for v in vals:
            if v == "DotProduct" or (k == "pred_normalize" and v == "Y"):
                continue
            assert cover[(k, v)] >= 2, (k, v, cover[(k, v)])

    print(f"executing {len(combos)} covering combos")
    for combo in combos:
        execute_combo(combo, n_steps=2)


def test_tsn_jan_rejected_at_build_time():
    """The reference crashes at runtime (loss.py:86 on an empty feature
    list); we reject the config when the step is built."""
    import pytest

    from scripts.config_space_sweep import trace_combo

    combo = dict(CANONICAL[0], baseline_type="tsn", dis_DA="JAN",
                 use_target="uSv")
    assert expected_error(combo) is not None
    with pytest.raises(ValueError, match="tsn"):
        trace_combo(combo)


def test_dotproduct_rejected_at_both_attention_levels():
    """The reference accepts --use_attn/--use_attn_frame DotProduct but
    never implements it (opts.py:50-51); both levels must be rejected
    loudly at ModelConfig construction instead of silently no-opping."""
    import pytest

    from ta3n_tpu.config import ModelConfig

    with pytest.raises(ValueError, match="DotProduct"):
        ModelConfig(num_class=3, use_attn="DotProduct")
    with pytest.raises(ValueError, match="DotProduct"):
        ModelConfig(num_class=3, use_attn_frame="DotProduct")
