from lmnet_tpu.ops.pallas.nat_kernel import neighborhood_attention_pallas
from lmnet_tpu.ops.pallas.rc_kernel import fold_rc_weights, fused_reparam_conv

__all__ = [
    "neighborhood_attention_pallas",
    "fused_reparam_conv",
    "fold_rc_weights",
]
