from lmnet_tpu.metrics.confusion import (
    ConfusionAccumulator,
    ConfusionMatrix,
    Evaluator,
    MetricTracker,
    binary_dice,
    binary_eval,
    binary_iou,
    confusion_matrix,
    derived_metrics,
    dice_pytorch,
    get_multi_ConfusionMatrix,
    iou_pytorch,
    multi_class_confusion,
    multi_eval,
    per_class_confusion,
    relative_volume_difference,
)
from lmnet_tpu.metrics.functional import get_stats, compute_metric
from lmnet_tpu.metrics import functional
from lmnet_tpu.metrics.hd95 import hausdorff_distance_95

__all__ = [
    "ConfusionAccumulator",
    "ConfusionMatrix",
    "Evaluator",
    "MetricTracker",
    "binary_dice",
    "binary_eval",
    "binary_iou",
    "dice_pytorch",
    "get_multi_ConfusionMatrix",
    "iou_pytorch",
    "multi_class_confusion",
    "multi_eval",
    "per_class_confusion",
    "confusion_matrix",
    "derived_metrics",
    "relative_volume_difference",
    "get_stats",
    "compute_metric",
    "functional",
    "hausdorff_distance_95",
]
