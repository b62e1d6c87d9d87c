"""Confusion-matrix metric engine, accumulated **on device**.

The reference updates torchmetrics on CPU every step, forcing a
device->host sync per batch (reference ``train_eval_utils.py:150-156``,
noted in SURVEY Appendix A).  Here the per-epoch state is a single (C, C)
confusion matrix living on device; ``update`` runs inside the jitted
train/eval step, and the host reads one tiny array per epoch.

``derived_metrics`` reproduces the reference's 7-metric collection
(``train.py:165-174``): binary accuracy / precision / recall / specificity,
macro Dice, binary IoU, and multiclass-macro mean IoU.

``Evaluator`` mirrors the latent numpy engine (reference
``utils/metrics.py:162-222``) for API parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def confusion_matrix(
    pred: jnp.ndarray, target: jnp.ndarray, num_classes: int
) -> jnp.ndarray:
    """(C, C) confusion matrix; rows = target class, cols = predicted class.

    Computed with a one-hot matmul (MXU-friendly) instead of bincount/scatter.
    """
    pred = pred.reshape(-1)
    target = target.reshape(-1)
    t1 = jax.nn.one_hot(target, num_classes, dtype=jnp.float32)
    p1 = jax.nn.one_hot(pred, num_classes, dtype=jnp.float32)
    return jnp.einsum("nc,nk->ck", t1, p1, optimize=True)


def derived_metrics(cm: jnp.ndarray) -> dict[str, jnp.ndarray]:
    """The reference's live metric collection, from one confusion matrix.

    Keys/order follow train.py:205-210: accuracy, precision, recall,
    specificity, dice, iou, mean_iou.
    """
    cm = cm.astype(jnp.float64) if cm.dtype == jnp.int64 else cm.astype(jnp.float32)
    eps = 0.0
    total = jnp.sum(cm)
    tp_c = jnp.diag(cm)
    fp_c = jnp.sum(cm, axis=0) - tp_c  # predicted c but target != c
    fn_c = jnp.sum(cm, axis=1) - tp_c

    def safe(n, d):
        return jnp.where(d > 0, n / jnp.maximum(d, 1e-12), 0.0)

    # binary stats (positive class = 1)
    tp, fp, fn = tp_c[1], fp_c[1], fn_c[1]
    tn = total - tp - fp - fn
    dice_c = safe(2 * tp_c, 2 * tp_c + fp_c + fn_c)
    iou_c = safe(tp_c, tp_c + fp_c + fn_c)
    return {
        "accuracy": safe(tp + tn, total),
        "precision": safe(tp, tp + fp),
        "recall": safe(tp, tp + fn),
        "specificity": safe(tn, tn + fp),
        "dice": jnp.mean(dice_c),
        "iou": safe(tp, tp + fp + fn),
        "mean_iou": jnp.mean(iou_c),
    }


class ConfusionAccumulator:
    """Tiny helper holding the on-device epoch state.

    Usage: state = ConfusionAccumulator.init(C); inside the jitted step call
    ``state = state + confusion_matrix(pred, target, C)``; at epoch end call
    ``derived_metrics(state)``.
    """

    @staticmethod
    def init(num_classes: int) -> jnp.ndarray:
        return jnp.zeros((num_classes, num_classes), dtype=jnp.float32)


def relative_volume_difference(pred: np.ndarray, target: np.ndarray) -> float:
    """RVD = (|pred| - |target|) / |target| for the foreground class
    (reference ``utils/metrics.py:14-25`` ``ravd`` /
    ``train_eval_utils.py:27-52`` RVDEvaluator semantics)."""
    vol_p = float(np.count_nonzero(pred))
    vol_t = float(np.count_nonzero(target))
    if vol_t == 0:
        return float("nan")
    return (vol_p - vol_t) / vol_t


class Evaluator:
    """Numpy confusion-matrix evaluator, API-parity with the reference's
    latent engine (utils/metrics.py:162-222): add_batch + Accuracy / Recall /
    Precision / Specificity / Dice / Mean_Dice / MIoU / FWIoU."""

    def __init__(self, num_class: int):
        self.num_class = num_class
        self.confusion_matrix = np.zeros((num_class, num_class), dtype=np.float64)

    def _generate_matrix(self, gt: np.ndarray, pred: np.ndarray) -> np.ndarray:
        mask = (gt >= 0) & (gt < self.num_class)
        label = self.num_class * gt[mask].astype(int) + pred[mask].astype(int)
        count = np.bincount(label, minlength=self.num_class**2)
        return count.reshape(self.num_class, self.num_class)

    def add_batch(self, gt_image: np.ndarray, pre_image: np.ndarray) -> None:
        assert gt_image.shape == pre_image.shape
        self.confusion_matrix += self._generate_matrix(gt_image, pre_image)

    def reset(self) -> None:
        self.confusion_matrix = np.zeros_like(self.confusion_matrix)

    # ---- derived metrics -------------------------------------------------
    @property
    def _counts(self):
        cm = self.confusion_matrix
        tp = np.diag(cm)
        fp = cm.sum(axis=0) - tp
        fn = cm.sum(axis=1) - tp
        tn = cm.sum() - tp - fp - fn
        return tp, fp, fn, tn

    def Accuracy(self) -> float:
        cm = self.confusion_matrix
        return float(np.diag(cm).sum() / cm.sum())

    def Recall(self) -> float:  # foreground class
        tp, fp, fn, tn = self._counts
        return float(tp[1] / max(tp[1] + fn[1], 1e-12))

    def Precision(self) -> float:
        tp, fp, fn, tn = self._counts
        return float(tp[1] / max(tp[1] + fp[1], 1e-12))

    def Specificity(self) -> float:
        tp, fp, fn, tn = self._counts
        return float(tn[1] / max(tn[1] + fp[1], 1e-12))

    def Dice(self) -> float:
        tp, fp, fn, tn = self._counts
        return float(2 * tp[1] / max(2 * tp[1] + fp[1] + fn[1], 1e-12))

    def Mean_Dice(self) -> float:
        tp, fp, fn, tn = self._counts
        denom = np.maximum(2 * tp + fp + fn, 1e-12)
        return float(np.mean(2 * tp / denom))

    def MIoU(self) -> float:
        tp, fp, fn, tn = self._counts
        denom = np.maximum(tp + fp + fn, 1e-12)
        return float(np.mean(tp / denom))

    def FWIoU(self) -> float:
        cm = self.confusion_matrix
        freq = cm.sum(axis=1) / cm.sum()
        tp, fp, fn, tn = self._counts
        iu = tp / np.maximum(tp + fp + fn, 1e-12)
        return float((freq[freq > 0] * iu[freq > 0]).sum())
