"""C++ cache loader: build, roundtrip, threaded gather correctness."""

import numpy as np
import pytest

from lmnet_tpu.data.datasets import SyntheticDataset
from lmnet_tpu.data import native_loader


pytestmark = pytest.mark.skipif(
    not native_loader.native_available(), reason="no C++ toolchain"
)


def test_cache_roundtrip(tmp_path):
    ds = SyntheticDataset(n=12, img_size=24, mode="val", seed=3)
    path = str(tmp_path / "cache.bin")
    native_loader.build_cache(ds, path)
    ldr = native_loader.NativeCacheLoader(path, num_threads=3)
    assert (ldr.n, ldr.height, ldr.width) == (12, 24, 24)
    imgs, masks = ldr.gather(np.array([0, 5, 11]))
    for out_i, ds_i in zip(range(3), [0, 5, 11]):
        ref_img, ref_mask = ds[ds_i]
        np.testing.assert_array_equal(imgs[out_i], ref_img)
        np.testing.assert_array_equal(masks[out_i], ref_mask)
    ldr.close()


def test_epoch_iteration(tmp_path):
    ds = SyntheticDataset(n=10, img_size=16, mode="val")
    path = str(tmp_path / "cache.bin")
    native_loader.build_cache(ds, path)
    ldr = native_loader.NativeCacheLoader(path)
    batches = list(ldr.epoch(4, shuffle=True, seed=1, epoch=0))
    assert [b[0].shape[0] for b in batches] == [4, 4, 2]
    # deterministic per (seed, epoch)
    again = list(ldr.epoch(4, shuffle=True, seed=1, epoch=0))
    np.testing.assert_array_equal(batches[0][0], again[0][0])
    ldr.close()


def _write_jpeg_dataset(tmp_path, n=4, hw=(37, 29)):
    """JPEG images + masks on disk plus the manifest DataFrame."""
    import cv2
    import pandas as pd

    from lmnet_tpu.data.datasets import SegmentationDataset

    rng = np.random.RandomState(0)
    rows = []
    for i in range(n):
        img = rng.randint(0, 256, (*hw, 3), dtype=np.uint8)
        mask = (rng.rand(*hw) > 0.5).astype(np.uint8) * 255
        ip = str(tmp_path / f"img_{i}.jpg")
        mp = str(tmp_path / f"mask_{i}.jpg")
        cv2.imwrite(ip, cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, 95])
        cv2.imwrite(mp, mask, [cv2.IMWRITE_JPEG_QUALITY, 100])
        rows.append({"images": ip, "masks": mp})
    df = pd.DataFrame(rows)
    return SegmentationDataset(df, "val", img_size=16)


def test_native_jpeg_build_matches_python_decode(tmp_path):
    """The libjpeg decode stage (lm_build_cache_jpeg) produces the same
    cache as the Python/cv2 decode path, within JPEG-decoder and resize
    rounding (<= 2 intensity levels; masks near-exact)."""
    ds = _write_jpeg_dataset(tmp_path)
    jp = native_loader._jpeg_paths(ds)
    assert jp is not None

    native_path = str(tmp_path / "native.bin")
    native_loader.build_cache_jpeg(*jp, ds.img_size, native_path, num_threads=2)
    python_path = str(tmp_path / "python.bin")
    native_loader.build_cache(ds, python_path)

    ln = native_loader.NativeCacheLoader(native_path)
    lp = native_loader.NativeCacheLoader(python_path)
    assert (ln.n, ln.height, ln.width) == (lp.n, lp.height, lp.width)
    idx = np.arange(ln.n)
    ni, nm = ln.gather(idx)
    pi, pm = lp.gather(idx)
    diff = np.abs(ni.astype(np.int32) - pi.astype(np.int32))
    assert diff.mean() < 1.0 and diff.max() <= 4, (diff.mean(), diff.max())
    # masks: thresholded binary, identical except at resize boundary pixels
    assert (nm != pm).mean() < 0.02
    ln.close()
    lp.close()


def test_make_native_loader_end_to_end(tmp_path):
    """make_native_loader: build-once cache + deterministic epoch batches
    identical to datasets.make_loader order."""
    from lmnet_tpu.data.datasets import make_loader

    ds = SyntheticDataset(n=10, img_size=16, mode="val")
    batches_native = list(native_loader.make_native_loader(
        ds, str(tmp_path / "cache"), 4, shuffle=True, seed=3, epoch=1,
    ))
    batches_python = list(make_loader(ds, 4, shuffle=True, seed=3, epoch=1))
    assert len(batches_native) == len(batches_python)
    for (ni, nm), (pi, pm) in zip(batches_native, batches_python):
        np.testing.assert_array_equal(ni, pi)
        np.testing.assert_array_equal(nm, pm)
