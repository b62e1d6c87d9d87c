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


def test_plot_mode(tmp_path):
    import csv

    from lmnet_tpu.cli.train import plot_curves

    out = tmp_path / "LM_NetKvasir_0.csv"
    with open(out, "w", newline="") as f:
        w = csv.writer(f)
        for e in range(3):
            w.writerow([f"{0.1 * e:.4f}"] * 16)
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
