from lmnet_tpu.ops.resize import (
    adaptive_avg_pool,
    bilinear_resize,
    upsample2x_align_corners,
)
from lmnet_tpu.ops.nat import neighborhood_attention
from lmnet_tpu.ops import reparam

__all__ = [
    "adaptive_avg_pool",
    "bilinear_resize",
    "upsample2x_align_corners",
    "neighborhood_attention",
    "reparam",
]
