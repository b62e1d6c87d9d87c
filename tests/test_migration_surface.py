"""Pin the public API surface promised by MIGRATION.md.

Every `lmnet_tpu.<module>.<name>` that the migration guide maps a
reference symbol onto must exist (and callables must be callable), so the
guide cannot rot silently when modules are refactored.
"""

import importlib

import pytest

# (module, attribute) pairs straight out of MIGRATION.md's API table.
SURFACE = [
    ("lmnet_tpu.models", "LMNet"),
    ("lmnet_tpu.models", "structural_reparam"),
    ("lmnet_tpu.models.blocks", "ReparamConv"),
    ("lmnet_tpu.models.blocks", "SE"),
    ("lmnet_tpu.models.blocks", "GFT"),
    ("lmnet_tpu.models.blocks", "GlobalAttention"),
    ("lmnet_tpu.models.blocks", "pyramid_pool"),
    ("lmnet_tpu.models.blocks", "M2Skip"),
    ("lmnet_tpu.models.blocks", "M3Skip"),
    ("lmnet_tpu.models.blocks", "OverlapPatchEmbed"),
    ("lmnet_tpu.models.blocks", "Mlp"),
    ("lmnet_tpu.models.blocks", "NeighborhoodTransformer"),
    ("lmnet_tpu.ops.nat", "neighborhood_attention"),
    ("lmnet_tpu.losses", "bce_dice_loss"),
    ("lmnet_tpu.losses", "dice_loss"),
    ("lmnet_tpu.losses", "official_dice_loss"),
    ("lmnet_tpu.losses", "mmseg_dice_loss"),
    ("lmnet_tpu.losses", "mmseg_binary_dice_loss"),
    ("lmnet_tpu.losses", "focal_loss"),
    ("lmnet_tpu.losses", "focal_loss_per_class"),
    ("lmnet_tpu.losses", "sigmoid_focal_loss"),
    ("lmnet_tpu.losses", "class_balanced_loss"),
    ("lmnet_tpu.losses", "effective_number_weights"),
    ("lmnet_tpu.losses", "segmentation_loss"),
    ("lmnet_tpu.metrics", "Evaluator"),
    ("lmnet_tpu.metrics", "ConfusionMatrix"),
    ("lmnet_tpu.metrics", "get_multi_ConfusionMatrix"),
    ("lmnet_tpu.metrics", "binary_eval"),
    ("lmnet_tpu.metrics", "multi_eval"),
    ("lmnet_tpu.metrics", "MetricTracker"),
    ("lmnet_tpu.metrics", "iou_pytorch"),
    ("lmnet_tpu.metrics", "dice_pytorch"),
    ("lmnet_tpu.metrics", "ConfusionAccumulator"),
    ("lmnet_tpu.metrics", "get_stats"),
    ("lmnet_tpu.metrics", "compute_metric"),
    ("lmnet_tpu.metrics", "relative_volume_difference"),
    ("lmnet_tpu.metrics", "hausdorff_distance_95"),
    ("lmnet_tpu.train.loop", "train_one_epoch"),
    ("lmnet_tpu.train.loop", "evaluate"),
    ("lmnet_tpu.serve.engine", "serving_evaluate"),
    ("lmnet_tpu.parallel.dist_utils", "init_distributed_mode"),
    ("lmnet_tpu.parallel.dist_utils", "get_rank"),
    ("lmnet_tpu.parallel.dist_utils", "get_world_size"),
    ("lmnet_tpu.parallel.dist_utils", "is_main_process"),
    ("lmnet_tpu.parallel.dist_utils", "reduce_value"),
    ("lmnet_tpu.parallel.dist_utils", "cleanup"),
    ("lmnet_tpu.parallel", "make_mesh"),
    ("lmnet_tpu.parallel", "shard_batch"),
    ("lmnet_tpu.data", "create_kvasir_manifest"),
    ("lmnet_tpu.data", "calculate_sample_weights"),
    ("lmnet_tpu.data", "make_loader"),
    ("lmnet_tpu.data", "augment"),
    ("lmnet_tpu.serve", "deploy_forward"),
    ("lmnet_tpu.serve", "save_deploy"),
    ("lmnet_tpu.serve", "load_deploy"),
    ("lmnet_tpu.serve", "DynamicBatcher"),
]


@pytest.mark.parametrize("module,name", SURFACE, ids=lambda v: str(v))
def test_symbol_exists(module, name):
    mod = importlib.import_module(module)
    assert hasattr(mod, name), f"{module}.{name} promised by MIGRATION.md"


def test_metrics_functional_namespace():
    from lmnet_tpu.metrics import functional

    # the smp-style functional suite the guide points --test users at
    for fn in ("iou_score", "f1_score", "accuracy", "recall"):
        assert hasattr(functional, fn)


def test_packaging_entry_point():
    """pyproject.toml's console script must resolve to a real callable and
    the native loader source must ship as package data."""
    import os
    import tomllib

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "pyproject.toml"), "rb") as f:
        proj = tomllib.load(f)["project"]
    target = proj["scripts"]["lmnet-train"]
    module, func = target.split(":")
    mod = importlib.import_module(module)
    assert callable(getattr(mod, func))
    # loader.cpp must be inside the package tree (shipped via package-data)
    import lmnet_tpu.native

    pkg_dir = os.path.dirname(lmnet_tpu.native.__file__)
    assert os.path.exists(os.path.join(pkg_dir, "loader.cpp"))
