"""Metric engine tests vs sklearn and direct formulas."""

import numpy as np
from sklearn.metrics import confusion_matrix as sk_confusion

from lmnet_tpu.metrics import (
    Evaluator,
    confusion_matrix,
    derived_metrics,
    get_stats,
    hausdorff_distance_95,
)
from lmnet_tpu.metrics import functional as Fm


def test_confusion_matrix_matches_sklearn(rng):
    pred = rng.randint(0, 3, (2, 16, 16))
    target = rng.randint(0, 3, (2, 16, 16))
    ours = np.asarray(confusion_matrix(pred, target, 3))
    ref = sk_confusion(target.ravel(), pred.ravel(), labels=[0, 1, 2])
    np.testing.assert_array_equal(ours.astype(int), ref)


def test_derived_metrics_binary(rng):
    pred = rng.randint(0, 2, (4, 8, 8))
    target = rng.randint(0, 2, (4, 8, 8))
    cm = confusion_matrix(pred, target, 2)
    m = derived_metrics(cm)
    tp = int(((pred == 1) & (target == 1)).sum())
    fp = int(((pred == 1) & (target == 0)).sum())
    fn = int(((pred == 0) & (target == 1)).sum())
    tn = int(((pred == 0) & (target == 0)).sum())
    np.testing.assert_allclose(float(m["accuracy"]), (tp + tn) / (tp + tn + fp + fn), rtol=1e-6)
    np.testing.assert_allclose(float(m["precision"]), tp / (tp + fp), rtol=1e-6)
    np.testing.assert_allclose(float(m["recall"]), tp / (tp + fn), rtol=1e-6)
    np.testing.assert_allclose(float(m["specificity"]), tn / (tn + fp), rtol=1e-6)
    np.testing.assert_allclose(float(m["iou"]), tp / (tp + fp + fn), rtol=1e-6)
    # macro dice over both classes
    dice0 = 2 * tn / (2 * tn + fn + fp)
    dice1 = 2 * tp / (2 * tp + fp + fn)
    np.testing.assert_allclose(float(m["dice"]), (dice0 + dice1) / 2, rtol=1e-6)


def test_evaluator_parity_with_derived(rng):
    pred = rng.randint(0, 2, (4, 8, 8))
    target = rng.randint(0, 2, (4, 8, 8))
    ev = Evaluator(2)
    ev.add_batch(target, pred)
    m = derived_metrics(confusion_matrix(pred, target, 2))
    np.testing.assert_allclose(ev.Accuracy(), float(m["accuracy"]), rtol=1e-6)
    np.testing.assert_allclose(ev.Precision(), float(m["precision"]), rtol=1e-6)
    np.testing.assert_allclose(ev.MIoU(), float(m["mean_iou"]), rtol=1e-6)


def test_get_stats_binary(rng):
    out = rng.randint(0, 2, (3, 1, 6, 6))
    tgt = rng.randint(0, 2, (3, 1, 6, 6))
    tp, fp, fn, tn = get_stats(out, tgt, mode="binary")
    assert tp.shape == (3, 1)
    i = 1
    np.testing.assert_equal(tp[i, 0], ((out[i] == 1) & (tgt[i] == 1)).sum())
    np.testing.assert_equal(fp[i, 0], ((out[i] == 1) & (tgt[i] == 0)).sum())


def test_get_stats_multiclass_ignore(rng):
    out = rng.randint(0, 3, (2, 5, 5))
    tgt = rng.randint(0, 3, (2, 5, 5))
    tgt[0, 0, :] = 255
    tp, fp, fn, tn = get_stats(out, tgt, mode="multiclass", num_classes=3, ignore_index=255)
    # counts exclude ignored pixels
    keep = tgt[0] != 255
    c = 1
    assert tp[0, c] == ((out[0] == c) & (tgt[0] == c) & keep).sum()


def test_functional_reductions(rng):
    tp = np.array([[5, 1], [3, 2]])
    fp = np.array([[1, 2], [0, 1]])
    fn = np.array([[2, 0], [1, 3]])
    tn = np.array([[10, 15], [12, 10]])
    micro = Fm.iou_score(tp, fp, fn, tn, reduction="micro")
    expect = tp.sum() / (tp.sum() + fp.sum() + fn.sum())
    np.testing.assert_allclose(micro, expect, rtol=1e-6)
    macro = Fm.f1_score(tp, fp, fn, tn, reduction="macro")
    per_class = 2 * tp.sum(0) / (2 * tp.sum(0) + fp.sum(0) + fn.sum(0))
    np.testing.assert_allclose(macro, per_class.mean(), rtol=1e-6)
    none = Fm.accuracy(tp, fp, fn, tn, reduction=None)
    assert none.shape == (2, 2)


def test_hd95():
    a = np.zeros((32, 32), bool)
    b = np.zeros((32, 32), bool)
    a[8:16, 8:16] = True
    b[8:16, 8:16] = True
    assert hausdorff_distance_95(a, b) == 0.0
    b2 = np.zeros((32, 32), bool)
    b2[10:18, 8:16] = True  # shifted 2 down
    d = hausdorff_distance_95(a, b2)
    assert 0 < d <= 2.0 + 1e-6
    assert np.isnan(hausdorff_distance_95(a, np.zeros((32, 32), bool)))
