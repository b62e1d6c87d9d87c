"""Segmentation losses, bit-matched to the reference's semantics.

Parity targets (reference ``utils/loss.py`` and ``train.py``):
  dice_loss            : DiceLoss (:170-206) — softmax, per-class square-sum
                         denominator dice, smooth=1e-5, class weights,
                         optional ignore mask; mean over classes.
  cross_entropy_loss   : torch.nn.CrossEntropyLoss with class weights and
                         label smoothing (train.py:157, weight [1,4],
                         label_smoothing 0.001).
  bce_dice_loss        : BCEDiceLoss (:6-28) — 0.4*CE + 0.6*(1 - mean dice),
                         linear denominator, eps 1e-7, per-image-per-class.
  focal_loss           : modulator-form sigmoid focal loss (:29-58).
  class_balanced_loss  : effective-number class weights (beta=0.9999) +
                         focal/sigmoid/softmax (:59-125).
  segmentation_loss    : the live training criterion, CE + weighted Dice
                         (train_eval_utils.py:133,141).

Layout: logits are NHWC ``(B, H, W, C)``; integer labels are ``(B, H, W)``.
All functions are pure and jit/grad-safe; reductions happen on device.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def _one_hot(labels: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    return jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)


def dice_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    weight: Sequence[float] | None = None,
    softmax: bool = True,
    ignore: jnp.ndarray | None = None,
    smooth: float = 1e-5,
) -> jnp.ndarray:
    """Reference DiceLoss (utils/loss.py:170-206), square-sum denominator.

    dice_c = (2*sum(s*t) + smooth) / (sum(s^2) + sum(t^2) + smooth)
    loss  = sum_c weight_c * (1 - dice_c) / C, sums over the whole batch.
    ``ignore``: optional (B, H, W) mask; pixels with ignore==1 are excluded.
    """
    num_classes = logits.shape[-1]
    probs = jax.nn.softmax(logits, axis=-1) if softmax else logits
    target = _one_hot(labels, num_classes)
    if weight is None:
        weight = [1.0] * num_classes
    w = jnp.asarray(weight, dtype=probs.dtype)
    if ignore is not None:
        keep = (ignore != 1).astype(probs.dtype)[..., None]
        probs = probs * keep
        target = target * keep
    axes = (0, 1, 2)
    intersect = jnp.sum(probs * target, axis=axes)
    y_sum = jnp.sum(target * target, axis=axes)
    z_sum = jnp.sum(probs * probs, axis=axes)
    dice = (2.0 * intersect + smooth) / (z_sum + y_sum + smooth)
    return jnp.sum(w * (1.0 - dice)) / num_classes


def cross_entropy_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    weight: Sequence[float] | None = None,
    label_smoothing: float = 0.0,
) -> jnp.ndarray:
    """torch.nn.CrossEntropyLoss semantics (class weights + label smoothing).

    Per-pixel: l_n = -sum_c t_nc * w_c * log p_nc with
    t = (1-eps)*onehot + eps/C; reduction is sum(l_n) / sum(w_{y_n})
    (torch's weighted mean uses the *target-class* weight as denominator).
    """
    num_classes = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    one_hot = _one_hot(labels, num_classes)
    target = one_hot
    if label_smoothing > 0.0:
        target = (1.0 - label_smoothing) * one_hot + label_smoothing / num_classes
    if weight is None:
        per_pixel = -jnp.sum(target * logp, axis=-1)
        return jnp.mean(per_pixel)
    w = jnp.asarray(weight, dtype=logits.dtype)
    per_pixel = -jnp.sum(target * w * logp, axis=-1)
    # torch's weighted mean divides by sum of target-class weights; computed
    # via the one-hot (a w[labels] gather from a tiny table costs ~4 ms on
    # TPU for a 256^2 batch — one-hot multiply fuses to nothing)
    denom = jnp.sum(one_hot * w)
    return jnp.sum(per_pixel) / denom


def bce_dice_loss(
    logits: jnp.ndarray, labels: jnp.ndarray, eps: float = 1e-7
) -> jnp.ndarray:
    """Reference BCEDiceLoss (utils/loss.py:6-28): 0.4*CE + 0.6*(1-dice),
    linear-denominator dice averaged over (image, class)."""
    num_classes = logits.shape[-1]
    ce = cross_entropy_loss(logits, labels)
    probs = jax.nn.softmax(logits, axis=-1)
    target = _one_hot(labels, num_classes)
    axes = (1, 2)  # per-image sums
    inter = jnp.sum(probs * target, axis=axes)
    union = jnp.sum(probs, axis=axes) + jnp.sum(target, axis=axes)
    dice = jnp.mean((2.0 * inter + eps) / (union + eps))
    return 0.4 * ce + 0.6 * (1.0 - dice)


def focal_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    alpha: jnp.ndarray,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """Modulator-form sigmoid focal loss (reference utils/loss.py:29-58).

    ``labels`` are multi-hot floats of logits' shape; ``alpha`` broadcasts as
    a per-example weight. Normalized by sum(labels).
    """
    bce = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    if gamma == 0.0:
        modulator = 1.0
    else:
        modulator = jnp.exp(
            -gamma * labels * logits - gamma * jnp.log1p(jnp.exp(-logits))
        )
    loss = jnp.sum(alpha * modulator * bce)
    return loss / jnp.sum(labels)


def sigmoid_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    alpha: float = 0.25,
    gamma: float = 2.0,
    reduction: str = "mean",
) -> jnp.ndarray:
    """torchvision.ops.sigmoid_focal_loss semantics (the op the reference's
    per-class FocalLoss wrapper calls — utils/loss.py:5,135-137):
    BCE(logits, t) * (1 - p_t)^gamma, alpha-balanced, optional reduction."""
    p = jax.nn.sigmoid(logits)
    bce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    loss = bce * (1.0 - p_t) ** gamma
    if alpha >= 0:
        loss = (alpha * targets + (1.0 - alpha) * (1.0 - targets)) * loss
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def focal_loss_per_class(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """The reference's second focal variant, class FocalLoss
    (utils/loss.py:126-148): sum over classes of mean sigmoid focal loss of
    the class-c logit map against the binary (labels == c) target.

    ``logits``: (B, H, W, C); ``labels``: (B, H, W) ints.
    """
    num_classes = logits.shape[-1]
    loss = jnp.float32(0.0)
    for c in range(num_classes):
        target_c = (labels == c).astype(jnp.float32)
        loss = loss + sigmoid_focal_loss(
            logits[..., c], target_c, alpha, gamma, "mean"
        )
    return loss


def effective_number_weights(
    samples_per_class: Sequence[float], beta: float = 0.9999
) -> jnp.ndarray:
    """Class-balanced 'effective number' weights (reference utils/loss.py:66-72)."""
    import numpy as np

    spc = np.asarray(samples_per_class, dtype=np.float64)
    effective = 1.0 - np.power(beta, spc)
    w = (1.0 - beta) / (effective + 1e-8)
    w = w / w.sum() * len(spc)
    return jnp.asarray(w, dtype=jnp.float32)


def class_balanced_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    samples_per_class: Sequence[float],
    beta: float = 0.9999,
    gamma: float = 2.0,
    loss_type: str = "focal",
) -> jnp.ndarray:
    """Class-balanced loss (reference utils/loss.py:59-125) on (N, C) logits
    with integer labels (N,)."""
    num_classes = logits.shape[-1]
    w = effective_number_weights(samples_per_class, beta)
    one_hot = _one_hot(labels, num_classes)
    wn = w[labels][:, None]  # (N, 1) per-example weight
    if loss_type == "focal":
        return focal_loss(logits, one_hot, wn, gamma)
    if loss_type == "sigmoid":
        bce = jnp.maximum(logits, 0) - logits * one_hot + jnp.log1p(
            jnp.exp(-jnp.abs(logits))
        )
        return jnp.mean(wn * bce)
    # softmax: weighted binary CE on softmax probabilities
    probs = jax.nn.softmax(logits, axis=-1)
    probs = jnp.clip(probs, 1e-12, 1.0 - 1e-12)
    bce = -(one_hot * jnp.log(probs) + (1.0 - one_hot) * jnp.log(1.0 - probs))
    return jnp.mean(wn * bce)


def mmseg_binary_dice_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    valid_mask: jnp.ndarray,
    smooth: float = 1.0,
    exponent: float = 2.0,
) -> jnp.ndarray:
    """mmseg-style per-sample binary dice (reference utils/loss.py:228-237).

    Flattens per sample; numerator masks by ``valid_mask``, denominator does
    NOT (matching the reference exactly). Returns a per-sample (B,) vector of
    ``1 - (2*sum(p*t*m) + smooth) / (sum(p^e + t^e) + smooth)``.
    """
    b = pred.shape[0]
    p = pred.reshape(b, -1)
    t = target.reshape(b, -1).astype(p.dtype)
    m = valid_mask.reshape(b, -1).astype(p.dtype)
    num = 2.0 * jnp.sum(p * t * m, axis=1) + smooth
    den = jnp.sum(p**exponent + t**exponent, axis=1) + smooth
    return 1.0 - num / den


def mmseg_dice_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    valid_mask: jnp.ndarray,
    smooth: float = 1.0,
    exponent: float = 2.0,
    class_weight: Sequence[float] | None = None,
    ignore_index: int = 255,
) -> jnp.ndarray:
    """mmseg-style multi-class dice (reference utils/loss.py:210-225).

    ``pred``: (B, H, W, C) probabilities; ``target``: (B, H, W, C) one-hot;
    ``valid_mask``: (B, H, W). Classes whose *index* equals ``ignore_index``
    are skipped (as in the reference — 255 never matches a real class id);
    per-class dice is weighted and summed, divided by C. Returns (B,).
    """
    num_classes = pred.shape[-1]
    total = jnp.zeros((pred.shape[0],), pred.dtype)
    for i in range(num_classes):
        if i == ignore_index:
            continue
        d = mmseg_binary_dice_loss(
            pred[..., i], target[..., i], valid_mask, smooth, exponent
        )
        if class_weight is not None:
            d = d * class_weight[i]
        total = total + d
    return total / num_classes


def official_dice_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    smooth: float = 1.0,
    exponent: float = 2.0,
    class_weight: Sequence[float] | None = None,
    loss_weight: float = 1.0,
    ignore_index: int = 255,
) -> jnp.ndarray:
    """Reference ``offical_DiceLoss`` (utils/loss.py:239-267): softmax over
    classes, one-hot of clamped labels, valid_mask = labels != ignore_index,
    mmseg dice summed over the batch, scaled by ``loss_weight``.

    ``logits``: (B, H, W, C); ``labels``: (B, H, W) ints (255 = ignore).
    """
    num_classes = logits.shape[-1]
    probs = jax.nn.softmax(logits, axis=-1)
    one_hot = _one_hot(jnp.clip(labels, 0, num_classes - 1), num_classes)
    valid_mask = (labels != ignore_index).astype(jnp.int32)
    per_sample = mmseg_dice_loss(
        probs, one_hot, valid_mask, smooth, exponent, class_weight, ignore_index
    )
    return loss_weight * jnp.sum(per_sample)


def segmentation_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    ce_weight: Sequence[float] = (1.0, 4.0),
    dice_weight: Sequence[float] = (1.0, 4.0),
    label_smoothing: float = 0.001,
) -> jnp.ndarray:
    """The live LM-Net training criterion: weighted label-smoothed CE plus
    weighted square-denominator Dice (reference train.py:157-158 +
    train_eval_utils.py:133,141)."""
    return cross_entropy_loss(
        logits, labels, ce_weight, label_smoothing
    ) + dice_loss(logits, labels, dice_weight)
