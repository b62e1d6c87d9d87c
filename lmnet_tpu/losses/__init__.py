from lmnet_tpu.losses.losses import (
    bce_dice_loss,
    class_balanced_loss,
    cross_entropy_loss,
    dice_loss,
    focal_loss,
    segmentation_loss,
)

__all__ = [
    "bce_dice_loss",
    "class_balanced_loss",
    "cross_entropy_loss",
    "dice_loss",
    "focal_loss",
    "segmentation_loss",
]
