from lmnet_tpu.serve.engine import deploy_forward

__all__ = ["deploy_forward"]
