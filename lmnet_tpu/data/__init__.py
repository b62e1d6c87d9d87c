from lmnet_tpu.data.manifests import (
    create_basic_manifest,
    create_busi_manifest,
    create_cvc_manifest,
    create_kvasir_manifest,
    create_thyroid_manifest,
)
from lmnet_tpu.data.datasets import SegmentationDataset, make_loader
from lmnet_tpu.data import augment

__all__ = [
    "create_basic_manifest",
    "create_busi_manifest",
    "create_cvc_manifest",
    "create_kvasir_manifest",
    "create_thyroid_manifest",
    "SegmentationDataset",
    "make_loader",
    "augment",
]
