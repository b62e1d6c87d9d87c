from lmnet_tpu.metrics.confusion import (
    ConfusionAccumulator,
    Evaluator,
    confusion_matrix,
    derived_metrics,
    relative_volume_difference,
)
from lmnet_tpu.metrics.functional import get_stats, compute_metric
from lmnet_tpu.metrics import functional
from lmnet_tpu.metrics.hd95 import hausdorff_distance_95

__all__ = [
    "ConfusionAccumulator",
    "Evaluator",
    "confusion_matrix",
    "derived_metrics",
    "relative_volume_difference",
    "get_stats",
    "compute_metric",
    "functional",
    "hausdorff_distance_95",
]
