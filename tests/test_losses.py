"""Loss golden-value tests vs torch oracles (CE) and direct formulas (Dice)."""

import numpy as np
import torch

from lmnet_tpu.losses import (
    bce_dice_loss,
    cross_entropy_loss,
    dice_loss,
    segmentation_loss,
)


def test_cross_entropy_weighted_smoothed_matches_torch(rng):
    logits = rng.randn(2, 8, 8, 2).astype(np.float32)
    labels = rng.randint(0, 2, (2, 8, 8))
    ours = float(cross_entropy_loss(logits, labels, (1.0, 4.0), 0.001))
    t_logits = torch.from_numpy(np.transpose(logits, (0, 3, 1, 2)))
    t_labels = torch.from_numpy(labels).long()
    ref = torch.nn.CrossEntropyLoss(
        weight=torch.tensor([1.0, 4.0]), label_smoothing=0.001
    )(t_logits, t_labels)
    np.testing.assert_allclose(ours, float(ref), rtol=1e-5)


def test_cross_entropy_unweighted_matches_torch(rng):
    logits = rng.randn(3, 4, 4, 3).astype(np.float32)
    labels = rng.randint(0, 3, (3, 4, 4))
    ours = float(cross_entropy_loss(logits, labels))
    ref = torch.nn.CrossEntropyLoss()(
        torch.from_numpy(np.transpose(logits, (0, 3, 1, 2))),
        torch.from_numpy(labels).long(),
    )
    np.testing.assert_allclose(ours, float(ref), rtol=1e-5)


def _dice_oracle(logits, labels, weight, smooth=1e-5):
    """Direct transcription of the reference DiceLoss formula
    (utils/loss.py:183-206): softmax, per-class square-sum dice."""
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    C = logits.shape[-1]
    loss = 0.0
    for c in range(C):
        s = probs[..., c].ravel()
        t = (labels == c).astype(np.float64).ravel()
        dice = (2 * (s * t).sum() + smooth) / ((s**2).sum() + (t**2).sum() + smooth)
        loss += weight[c] * (1 - dice)
    return loss / C


def test_dice_loss_matches_reference_formula(rng):
    logits = rng.randn(2, 8, 8, 2).astype(np.float32)
    labels = rng.randint(0, 2, (2, 8, 8))
    ours = float(dice_loss(logits, labels, (1.0, 4.0)))
    ref = _dice_oracle(logits.astype(np.float64), labels, [1.0, 4.0])
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_dice_loss_ignore_mask(rng):
    logits = rng.randn(1, 4, 4, 2).astype(np.float32)
    labels = rng.randint(0, 2, (1, 4, 4))
    ignore = np.zeros((1, 4, 4), dtype=np.int32)
    ignore[0, 0, :] = 1
    full = float(dice_loss(logits, labels, ignore=ignore))
    # oracle: zero out ignored pixels in both probs and target
    keep = ignore == 0
    l2 = logits.copy()
    ref_probs = np.exp(l2 - l2.max(-1, keepdims=True))
    ref_probs /= ref_probs.sum(-1, keepdims=True)
    loss = 0.0
    for c in range(2):
        s = (ref_probs[..., c] * keep).ravel().astype(np.float64)
        t = ((labels == c) & keep).astype(np.float64).ravel()
        dice = (2 * (s * t).sum() + 1e-5) / ((s**2).sum() + (t**2).sum() + 1e-5)
        loss += 1 - dice
    np.testing.assert_allclose(full, loss / 2, rtol=1e-5)


def test_bce_dice_runs(rng):
    logits = rng.randn(2, 8, 8, 2).astype(np.float32)
    labels = rng.randint(0, 2, (2, 8, 8))
    v = float(bce_dice_loss(logits, labels))
    assert np.isfinite(v) and v > 0


def test_segmentation_loss_is_ce_plus_dice(rng):
    logits = rng.randn(2, 8, 8, 2).astype(np.float32)
    labels = rng.randint(0, 2, (2, 8, 8))
    total = float(segmentation_loss(logits, labels))
    ce = float(cross_entropy_loss(logits, labels, (1.0, 4.0), 0.001))
    dl = float(dice_loss(logits, labels, (1.0, 4.0)))
    np.testing.assert_allclose(total, ce + dl, rtol=1e-6)


def test_mmseg_dice_trio_matches_torch_oracle(rng):
    """Golden test of the mmseg-style trio (reference utils/loss.py:210-267)
    against a torch oracle written from the documented equations."""
    from lmnet_tpu.losses import official_dice_loss

    B, H, W, C = 2, 6, 6, 3
    logits = rng.randn(B, H, W, C).astype(np.float32)
    labels = rng.randint(0, C, (B, H, W))
    labels[0, :2, :2] = 255  # ignore region

    ours = float(official_dice_loss(logits, labels, class_weight=(1.0, 2.0, 0.5)))

    # torch oracle: softmax(C dim) -> one_hot(clamped) -> valid mask ->
    # per-class binary dice with unmasked denominator -> weighted sum / C
    # -> sum over batch
    t_logits = torch.from_numpy(np.transpose(logits, (0, 3, 1, 2)))
    t_labels = torch.from_numpy(labels).long()
    pred = torch.softmax(t_logits, dim=1)
    one_hot = torch.nn.functional.one_hot(torch.clamp(t_labels, 0, C - 1), C)
    valid = (t_labels != 255).long().reshape(B, -1)
    total = torch.zeros(B)
    for i, w in zip(range(C), (1.0, 2.0, 0.5)):
        p = pred[:, i].reshape(B, -1)
        t = one_hot[..., i].reshape(B, -1).float()
        num = 2 * (p * t * valid).sum(1) + 1.0
        den = (p.pow(2) + t.pow(2)).sum(1) + 1.0
        total += (1 - num / den) * w
    expected = float((total / C).sum())
    np.testing.assert_allclose(ours, expected, rtol=1e-5)


def test_mmseg_binary_dice_shape_and_range(rng):
    from lmnet_tpu.losses import mmseg_binary_dice_loss

    p = rng.rand(3, 5, 5).astype(np.float32)
    t = (rng.rand(3, 5, 5) > 0.5).astype(np.float32)
    m = np.ones((3, 5, 5), np.float32)
    d = np.asarray(mmseg_binary_dice_loss(p, t, m))
    assert d.shape == (3,)
    assert (d >= 0).all() and (d <= 1).all()


def _torch_sigmoid_focal(logits, targets, alpha=0.25, gamma=2.0):
    """torchvision.ops.sigmoid_focal_loss reimplemented from its documented
    formula (torchvision is not installed here)."""
    p = torch.sigmoid(logits)
    ce = torch.nn.functional.binary_cross_entropy_with_logits(
        logits, targets, reduction="none"
    )
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        loss = (alpha * targets + (1 - alpha) * (1 - targets)) * loss
    return loss.mean()


def test_sigmoid_focal_loss_matches_torch_formula(rng):
    import jax.numpy as jnp

    from lmnet_tpu.losses import sigmoid_focal_loss

    x = rng.randn(4, 16).astype(np.float32) * 3
    t = rng.randint(0, 2, size=(4, 16)).astype(np.float32)
    want = _torch_sigmoid_focal(torch.from_numpy(x), torch.from_numpy(t))
    got = sigmoid_focal_loss(jnp.asarray(x), jnp.asarray(t))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_focal_loss_per_class_matches_reference_wrapper(rng):
    """Per-class FocalLoss (reference utils/loss.py:126-148): sum over c of
    mean sigmoid focal loss of channel c vs binary (target == c)."""
    import jax.numpy as jnp

    from lmnet_tpu.losses import focal_loss_per_class

    B, H, W, C = 2, 8, 8, 3
    logits = rng.randn(B, H, W, C).astype(np.float32)
    labels = rng.randint(0, C, size=(B, H, W))
    want = 0.0
    for c in range(C):
        want += float(
            _torch_sigmoid_focal(
                torch.from_numpy(logits[..., c]),
                torch.from_numpy((labels == c).astype(np.float32)),
            )
        )
    got = float(focal_loss_per_class(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(got, want, rtol=1e-5)
