"""Confusion matrix / per-class top-K vs sklearn and the reference
accumulation semantics (test_models.py:198-229)."""

import numpy as np
from sklearn.metrics import confusion_matrix as sk_confusion

from ta3n_tpu.io_utils import (confusion_matrix, per_class_topk_accuracy,
                               plot_confusion_matrix)


def test_confusion_matches_sklearn():
    rng = np.random.default_rng(0)
    y_true = rng.integers(0, 5, size=200)
    y_pred = rng.integers(0, 5, size=200)
    got = confusion_matrix(y_true, y_pred, 5)
    want = sk_confusion(y_true, y_pred, labels=list(range(5)))
    np.testing.assert_array_equal(got, want)


def test_per_class_topk_matches_reference_accumulation():
    rng = np.random.default_rng(1)
    n, c, kmax = 300, 6, 3
    y_true = rng.integers(0, c, size=n)
    topk = rng.integers(0, c, size=(n, kmax))

    got = per_class_topk_accuracy(y_true, topk, c, tops=[1, 3])

    # reference: cf per rank; cls_hit[:k].sum(axis=0) / cls_cnt
    cfs = [sk_confusion(y_true, topk[:, k], labels=list(range(c)))
           for k in range(kmax)]
    cls_cnt = np.maximum(cfs[0].sum(axis=1), 1)
    cls_hit = np.array([np.diag(cf) for cf in cfs])
    for j, k in enumerate([1, 3]):
        want = cls_hit[:k].sum(axis=0) / cls_cnt
        np.testing.assert_allclose(got[j], want)


def test_plot_confusion_writes_png(tmp_path):
    cm = np.array([[5, 1], [2, 7]])
    path = str(tmp_path / "cm.png")
    plot_confusion_matrix(path, cm, classes=["a", "b"], normalize=True)
    import os
    assert os.path.isfile(path) or os.path.isfile(path + ".txt")
