"""CLI surface contract (reference train.py:245-281) — parser-level tests."""

from lmnet_tpu.cli.train import build_parser, _manifest


def test_parser_defaults_match_reference():
    a = build_parser().parse_args([])
    assert a.num_classes == 2
    assert a.epochs == 200
    assert a.batch_size == 2
    assert a.lr == 1e-3
    assert a.weight_decay == 1e-4
    assert a.smoothing == 0.001
    assert a.dataset == "Kvasir"
    assert a.model == "LM_Net"
    assert a.categories == "binary"
    assert a.seed == 42
    assert a.k_fold is True
    assert a.mixup is False and a.deep_supervision is False
    assert not (a.test or a.resume or a.visualization or a.plot)


def test_dataset_choices():
    p = build_parser()
    for name in ("Basic", "Kvasir", "BUSI", "CVCDataset", "VOC2012"):
        assert p.parse_args(["--dataset", name]).dataset == name


def _write_csv(path, epochs=3):
    import csv

    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        for e in range(epochs):
            w.writerow([f"{0.1 * e:.4f}"] * 16)


def test_plot_mode_comparative(tmp_path):
    """The reference's multi-model x multi-dataset 1xN figure
    (train.py:44-106): one subplot per dataset, one curve per model."""
    from lmnet_tpu.cli.train import plot_curves

    for model in ("LM_Net", "unet"):
        for ds in ("Kvasir", "BUSI"):
            _write_csv(tmp_path / f"{model}{ds}_0.csv")
    # bestresult/test files must NOT be picked up as models
    _write_csv(tmp_path / "LM_NetKvasirbestresult_0.csv", 1)
    args = build_parser().parse_args(["--out_dir", str(tmp_path)])
    plot_curves(args)
    assert (tmp_path / "Validation_mDice_curves.png").exists()


def test_plot_mode_fallback_single_axis(tmp_path):
    """CSVs that don't match any --plot_datasets name still plot."""
    from lmnet_tpu.cli.train import plot_curves

    _write_csv(tmp_path / "LM_NetThyroid_0.csv")
    args = build_parser().parse_args(["--out_dir", str(tmp_path)])
    plot_curves(args)
    assert (tmp_path / "mdice_curves.png").exists()


def test_manifest_naming():
    a = build_parser().parse_args(["--manifest_dir", "m"])
    assert _manifest(a, "train", 3).endswith("train_Kvasir_3.csv")
    assert _manifest(a, "val", 0).endswith("val_Kvasir_0.csv")
    assert _manifest(a, "test", 4).endswith("test_Kvasir_0.1.csv")
    a2 = build_parser().parse_args(["--dataset", "CVCDataset", "--manifest_dir", "m"])
    assert _manifest(a2, "train", 1).endswith("train_CVC_1.csv")


import pytest


@pytest.mark.slow  # builds the model per mode: ~7 min of CPU compiles
def test_modes_fail_loudly_without_checkpoint(tmp_path):
    """--test / --visualization / --export must refuse to run with no
    trained checkpoint instead of silently using random-init weights
    (VERDICT r3 weak #1; reference crashes in torch.load, train.py:183)."""

    from lmnet_tpu.cli import train as cli

    base = [
        "--synthetic", "--k_fold", "False", "--batch_size", "2",
        "--img_size", "32", "--filters", "4,8,12,16,24", "--num_heads", "2",
        "--ckpt_dir", str(tmp_path / "ckpt"), "--out_dir", str(tmp_path / "out"),
    ]
    for mode in (["--test"], ["--visualization"], ["--export", str(tmp_path / "blob")]):
        with pytest.raises(SystemExit, match="checkpoint .* not found"):
            cli.main(base + mode)
