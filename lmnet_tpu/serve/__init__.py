from lmnet_tpu.serve.daemon import DynamicBatcher
from lmnet_tpu.serve.engine import autoselect_backends, deploy_forward
from lmnet_tpu.serve.export import export_deploy, load_deploy, save_deploy

__all__ = ["deploy_forward", "autoselect_backends", "DynamicBatcher",
           "export_deploy", "load_deploy", "save_deploy"]
