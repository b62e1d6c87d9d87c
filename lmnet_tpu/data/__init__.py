from lmnet_tpu.data.manifests import (
    create_basic_manifest,
    create_busi_manifest,
    create_cvc_manifest,
    create_kvasir_manifest,
    create_thyroid_manifest,
    create_voc_manifest,
)
from lmnet_tpu.data.balance import (
    calculate_class_weights,
    calculate_sample_weights,
    merge_multi_masks,
)
from lmnet_tpu.data.datasets import SegmentationDataset, make_loader
from lmnet_tpu.data import augment

__all__ = [
    "create_basic_manifest",
    "create_busi_manifest",
    "create_cvc_manifest",
    "create_kvasir_manifest",
    "create_thyroid_manifest",
    "create_voc_manifest",
    "calculate_class_weights",
    "calculate_sample_weights",
    "merge_multi_masks",
    "SegmentationDataset",
    "make_loader",
    "augment",
]
