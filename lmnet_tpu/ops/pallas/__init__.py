from lmnet_tpu.ops.pallas.nat_kernel import neighborhood_attention_pallas

__all__ = ["neighborhood_attention_pallas"]
