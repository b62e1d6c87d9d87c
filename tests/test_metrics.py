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


def test_derived_metrics_multiclass_macro_vs_sklearn(rng):
    """task='multiclass' (reference --categories, train.py:165-174):
    macro reductions must match sklearn's average='macro' at C=3."""
    from sklearn.metrics import (
        balanced_accuracy_score,
        jaccard_score,
        precision_score,
        recall_score,
    )

    pred = rng.randint(0, 3, (4, 8, 8))
    target = rng.randint(0, 3, (4, 8, 8))
    cm = confusion_matrix(pred, target, 3)
    m = derived_metrics(cm, task="multiclass")
    y_t, y_p = target.ravel(), pred.ravel()
    np.testing.assert_allclose(
        float(m["precision"]),
        precision_score(y_t, y_p, average="macro", zero_division=0),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        float(m["recall"]),
        recall_score(y_t, y_p, average="macro", zero_division=0),
        rtol=1e-6,
    )
    # torchmetrics multiclass accuracy (average='macro') == macro recall
    # == sklearn balanced accuracy
    np.testing.assert_allclose(
        float(m["accuracy"]), balanced_accuracy_score(y_t, y_p), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(m["iou"]),
        jaccard_score(y_t, y_p, average="macro", zero_division=0),
        rtol=1e-6,
    )
    np.testing.assert_allclose(float(m["iou"]), float(m["mean_iou"]), rtol=1e-7)
    # macro specificity: mean_c tn_c/(tn_c+fp_c), from the sklearn cm
    ref = sk_confusion(y_t, y_p, labels=[0, 1, 2]).astype(float)
    tp = np.diag(ref)
    fp = ref.sum(0) - tp
    fn = ref.sum(1) - tp
    tn = ref.sum() - tp - fp - fn
    np.testing.assert_allclose(
        float(m["specificity"]), np.mean(tn / (tn + fp)), rtol=1e-6
    )
    # macro dice == macro f1
    from sklearn.metrics import f1_score

    np.testing.assert_allclose(
        float(m["dice"]),
        f1_score(y_t, y_p, average="macro", zero_division=0),
        rtol=1e-6,
    )


def test_derived_metrics_multilabel_accuracy(rng):
    """task='multilabel': per-label one-vs-rest accuracy, macro-averaged;
    the other reductions coincide with the multiclass macro forms."""
    pred = rng.randint(0, 3, (2, 8, 8))
    target = rng.randint(0, 3, (2, 8, 8))
    cm = confusion_matrix(pred, target, 3)
    m = derived_metrics(cm, task="multilabel")
    mc = derived_metrics(cm, task="multiclass")
    ref = np.asarray(cm)
    tp = np.diag(ref)
    fp = ref.sum(0) - tp
    fn = ref.sum(1) - tp
    tn = ref.sum() - tp - fp - fn
    np.testing.assert_allclose(
        float(m["accuracy"]), np.mean((tp + tn) / ref.sum()), rtol=1e-6
    )
    for k in ("precision", "recall", "specificity", "dice", "iou", "mean_iou"):
        np.testing.assert_allclose(float(m[k]), float(mc[k]), rtol=1e-7)


def test_evaluate_voc_style_multiclass_smoke(rng):
    """A VOC-style run (mask_mode='index', num_classes=21) through the full
    ``evaluate`` loop with task='multiclass' (VERDICT r3 ask #3): metrics
    must be the macro reductions, not silently binary class-1."""
    import jax
    import jax.numpy as jnp

    from lmnet_tpu.train.engine import TrainState
    from lmnet_tpu.train.loop import evaluate

    num_classes = 21

    def fake_apply(variables, x, train=False):
        # deterministic fake logits: favor (pixel_sum mod C) per pixel
        idx = (jnp.sum(x, axis=-1) * 37.0).astype(jnp.int32) % num_classes
        return jax.nn.one_hot(idx, num_classes) * 5.0

    state = TrainState(
        step=jnp.zeros((), jnp.int32), params={}, batch_stats={},
        opt_state={}, apply_fn=fake_apply, tx=None,
    )
    images = rng.randint(0, 255, (4, 16, 16, 3)).astype(np.uint8)
    masks = rng.randint(0, num_classes, (4, 16, 16)).astype(np.int32)
    loader = [(images, masks)]
    _, m = evaluate(
        state, loader, num_classes=num_classes, img_size=16, task="multiclass"
    )
    # reconstruct what the fake model predicts after eval_pipeline to pin
    # the macro semantics end-to-end
    from lmnet_tpu.data import augment

    x, y = augment.eval_pipeline(images, masks, out_size=16)
    preds = np.asarray(jnp.argmax(fake_apply(None, x), axis=-1))
    ref = derived_metrics(
        confusion_matrix(jnp.asarray(preds), jnp.asarray(y), num_classes),
        task="multiclass",
    )
    for k in ("accuracy", "precision", "recall", "iou", "mean_iou"):
        np.testing.assert_allclose(m[k], float(ref[k]), rtol=1e-5)
    # multiclass iou is the macro Jaccard, not the binary class-1 IoU
    np.testing.assert_allclose(m["iou"], m["mean_iou"], rtol=1e-7)


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


def test_metric_tracker():
    """Running-average meter (reference utils/metrics.py:90-106)."""
    from lmnet_tpu.metrics import MetricTracker

    t = MetricTracker()
    t.update(2.0)
    t.update(4.0, n=3)
    assert t.val == 4.0
    assert t.count == 4
    np.testing.assert_allclose(t.avg, (2.0 + 12.0) / 4)
    t.reset()
    assert t.count == 0 and t.sum == 0.0


def test_per_class_confusion_counts(rng):
    """Per-image tp/tn/fp/fn vs direct boolean counting
    (reference utils/metrics.py:25-40)."""
    from lmnet_tpu.metrics import per_class_confusion

    truth = rng.randint(0, 3, size=(4, 8, 8))
    pred = rng.randint(0, 3, size=(4, 8, 8))
    tp, tn, fp, fn = per_class_confusion(truth, pred, c=1)
    for i in range(4):
        gt = truth[i] == 1
        pd = pred[i] == 1
        assert tp[i] == np.sum(gt & pd)
        assert tn[i] == np.sum(~gt & ~pd)
        assert fp[i] == np.sum(~gt & pd)
        assert fn[i] == np.sum(gt & ~pd)
        assert tp[i] + tn[i] + fp[i] + fn[i] == 64


def test_binary_eval_closed_form():
    """binary_eval's 0/0 -> 1 convention and batch-sum reduction
    (reference utils/metrics.py:42-86)."""
    from lmnet_tpu.metrics import binary_eval

    # image 0: perfect prediction; image 1: all-background on all-background
    # (tp+fp == 0 and tp+fn == 0 -> precision/recall/dice/iou resolve to 1)
    truth = np.zeros((2, 4, 4), np.int64)
    pred = np.zeros((2, 4, 4), np.int64)
    truth[0, :2] = 1
    pred[0, :2] = 1
    acc, prec, recall, dice, iou = binary_eval(truth, pred)
    np.testing.assert_allclose([acc, prec, recall, dice, iou], [2.0] * 5)

    # half-overlap case: tp=4, fp=4, fn=4 on image 0
    pred2 = np.zeros((2, 4, 4), np.int64)
    pred2[0, 1:3] = 1
    acc, prec, recall, dice, iou = binary_eval(truth, pred2)
    np.testing.assert_allclose(prec, 0.5 + 1.0)
    np.testing.assert_allclose(recall, 0.5 + 1.0)
    np.testing.assert_allclose(dice, 0.5 + 1.0)
    np.testing.assert_allclose(iou, 4 / 12 + 1.0)


def test_multi_eval_nanmean_semantics():
    """multi_eval: per-class nan (0/0) drops out of the class mean
    (reference utils/metrics.py:11-24)."""
    from lmnet_tpu.metrics import multi_eval

    truth = np.zeros((1, 4, 4), np.int64)
    pred = np.zeros((1, 4, 4), np.int64)
    truth[0, :2] = 1
    pred[0, 1:3] = 1
    acc, prec, recall, dice, iou = multi_eval(truth, pred, n_classes=3)
    # class 2 never appears -> all its ratios are nan and are dropped;
    # classes 0/1 are symmetric here: tp=4, fp=4, fn=4 each
    np.testing.assert_allclose(prec, 0.5)
    np.testing.assert_allclose(recall, 0.5)
    np.testing.assert_allclose(dice, 0.5)
    np.testing.assert_allclose(iou, 1 / 3)
    # class-2 accuracy is (0 + 16)/16 = 1 (tn-only, NOT nan): mean 2/3
    np.testing.assert_allclose(acc, (0.5 + 0.5 + 1.0) / 3)


def test_binary_iou_dice_per_image(rng):
    """Smoothed per-image IoU/Dice on probability maps
    (reference utils/metrics.py:139-159)."""
    import jax.numpy as jnp

    from lmnet_tpu.metrics import binary_dice, binary_iou

    probs = rng.rand(3, 8, 8).astype(np.float32)
    labels = rng.randint(0, 2, size=(3, 8, 8))
    iou = np.asarray(binary_iou(jnp.asarray(probs), jnp.asarray(labels)))
    dice = np.asarray(binary_dice(jnp.asarray(probs), jnp.asarray(labels)))
    e = 1e-7
    for i in range(3):
        p = probs[i] > 0.5
        t = labels[i] != 0
        inter = np.sum(p & t)
        union = np.sum(p | t)
        np.testing.assert_allclose(iou[i], (inter + e) / (union + e), rtol=1e-5)
        np.testing.assert_allclose(
            dice[i], (2 * inter + e) / (p.sum() + t.sum() + e), rtol=1e-5
        )
    # dice/iou consistency: d = 2i/(i+u)
    np.testing.assert_allclose(dice, 2 * iou / (1 + iou), rtol=1e-4)


def test_evaluator_mean_accuracy_mean_recall(rng):
    """Evaluator.Mean_Accuracy / Mean_Recall (reference
    utils/metrics.py:169-178) — incl. the grand-total divisor quirk."""
    from lmnet_tpu.metrics import Evaluator

    ev = Evaluator(3)
    gt = rng.randint(0, 3, size=(2, 8, 8))
    pred = rng.randint(0, 3, size=(2, 8, 8))
    ev.add_batch(gt, pred)
    cm = ev.confusion_matrix
    np.testing.assert_allclose(
        ev.Mean_Accuracy(), np.nanmean(np.diag(cm) / cm.sum())
    )
    np.testing.assert_allclose(
        ev.Mean_Recall(), np.nanmean(np.diag(cm) / cm.sum(axis=1))
    )
