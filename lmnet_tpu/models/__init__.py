from lmnet_tpu.models.lm_net import LMNet, structural_reparam
from lmnet_tpu.models import blocks

__all__ = ["LMNet", "structural_reparam", "blocks"]
