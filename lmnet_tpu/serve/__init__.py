from lmnet_tpu.serve.engine import autoselect_backends, deploy_forward
from lmnet_tpu.serve.export import export_deploy, load_deploy, save_deploy

__all__ = ["deploy_forward", "autoselect_backends",
           "export_deploy", "load_deploy", "save_deploy"]
