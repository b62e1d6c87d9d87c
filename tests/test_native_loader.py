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
