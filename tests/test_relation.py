"""Relation-set index plan: golden values vs the reference's exact quirks
(TRNmodule.py:27-86)."""

import itertools
from math import ceil

import numpy as np

from ta3n_tpu.ops import (build_relation_plan, even_subsample_indices,
                          relation_scales, relation_set,
                          selected_relation_indices)


def test_scales():
    assert relation_scales(5) == [5, 4, 3, 2]
    assert relation_scales(3) == [3, 2]
    assert relation_scales(2) == [2]


def test_relation_set_matches_itertools():
    for s in (3, 5, 7):
        for k in range(2, s + 1):
            assert relation_set(s, k) == tuple(
                itertools.combinations(range(s), k))


def test_even_subsample_exact_formula():
    # reference: idx = int(ceil(i * N / n_sel)) (TRNmodule.py:71)
    for n_total, n_sel in [(5, 3), (10, 3), (3, 3), (1, 1), (4, 3)]:
        got = even_subsample_indices(n_total, n_sel)
        want = [int(ceil(i * n_total / n_sel)) for i in range(n_sel)]
        assert got == want


def test_selected_sets_s5_golden():
    sel = selected_relation_indices(5)
    # largest scale: only the single full combination (TRNmodule.py:60-64)
    assert sel[0] == [(0, 1, 2, 3, 4)]
    # k=4: C(5,4)=5, pick ceil(i*5/3) = [0, 2, 4]
    combos4 = list(itertools.combinations(range(5), 4))
    assert sel[1] == [combos4[0], combos4[2], combos4[4]]
    # k=3: C(5,3)=10, pick ceil(i*10/3) = [0, 4, 7]
    combos3 = list(itertools.combinations(range(5), 3))
    assert sel[2] == [combos3[0], combos3[4], combos3[7]]
    # k=2: C(5,2)=10, pick [0, 4, 7]
    combos2 = list(itertools.combinations(range(5), 2))
    assert sel[3] == [combos2[0], combos2[4], combos2[7]]


def test_plan_shapes():
    plan = build_relation_plan(5)
    assert plan.num_relation_features == 4
    assert [s.shape for s in plan.subsets] == [(1, 5), (3, 4), (3, 3), (3, 2)]
    assert all(s.dtype == np.int32 for s in plan.subsets)
