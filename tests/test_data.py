"""Data layer tests: manifest split protocol, dataset decode, loader."""

import os

import numpy as np
import pandas as pd
import pytest

from lmnet_tpu.data.datasets import SegmentationDataset, SyntheticDataset, make_loader
from lmnet_tpu.data.manifests import create_kvasir_manifest


@pytest.fixture
def fake_kvasir(tmp_path):
    import cv2

    root = tmp_path / "kvasir"
    (root / "images").mkdir(parents=True)
    (root / "masks").mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(30):
        img = rng.randint(0, 256, (40, 40, 3), dtype=np.uint8)
        mask = (rng.rand(40, 40) > 0.5).astype(np.uint8) * 255
        cv2.imwrite(str(root / "images" / f"im{i:03d}.png"), img)
        cv2.imwrite(str(root / "masks" / f"im{i:03d}.png"), mask)
    return str(root)


def test_manifest_protocol(fake_kvasir, tmp_path):
    out = str(tmp_path / "manifests")
    df = create_kvasir_manifest(fake_kvasir, out)
    assert len(df) == 30
    # split sizes: 10% test (3), 10% of the rest val, 5 folds
    test = pd.read_csv(os.path.join(out, "test_Kvasir_0.1.csv"))
    assert len(test) == 3
    for fold in range(5):
        tr = pd.read_csv(os.path.join(out, f"train_Kvasir_{fold}.csv"))
        va = pd.read_csv(os.path.join(out, f"val_Kvasir_{fold}.csv"))
        assert len(tr) + len(va) == 27
        # disjoint
        assert not set(tr["images"]) & set(va["images"])
        # no test leakage into folds
        assert not set(tr["images"]) & set(test["images"])
    # determinism: same seed -> same split
    out2 = str(tmp_path / "m2")
    create_kvasir_manifest(fake_kvasir, out2)
    t2 = pd.read_csv(os.path.join(out2, "test_Kvasir_0.1.csv"))
    assert list(t2["images"]) == list(test["images"])


def test_dataset_decode(fake_kvasir, tmp_path):
    out = str(tmp_path / "manifests")
    create_kvasir_manifest(fake_kvasir, out)
    ds = SegmentationDataset.from_csv(
        os.path.join(out, "train_Kvasir_0.csv"), "train", img_size=32
    )
    img, mask = ds[0]
    assert img.shape == (36, 36, 3) and img.dtype == np.uint8  # load_size = 9/8
    assert mask.shape == (36, 36)
    assert set(np.unique(mask)) <= {0, 1}
    ds_val = SegmentationDataset.from_csv(
        os.path.join(out, "val_Kvasir_0.csv"), "val", img_size=32
    )
    img, mask = ds_val[0]
    assert img.shape == (32, 32, 3)


def test_loader_batching():
    ds = SyntheticDataset(n=10, img_size=32, mode="val")
    batches = list(make_loader(ds, batch_size=4, shuffle=False))
    assert [b[0].shape[0] for b in batches] == [4, 4, 2]
    batches = list(make_loader(ds, batch_size=4, shuffle=True, drop_last=True, seed=1))
    assert [b[0].shape[0] for b in batches] == [4, 4]
    # deterministic shuffle per (seed, epoch)
    a = list(make_loader(ds, 4, shuffle=True, seed=1, epoch=0))
    b = list(make_loader(ds, 4, shuffle=True, seed=1, epoch=0))
    np.testing.assert_array_equal(a[0][0], b[0][0])
    c = list(make_loader(ds, 4, shuffle=True, seed=1, epoch=1))
    assert not np.array_equal(a[0][0], c[0][0])
