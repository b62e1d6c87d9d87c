"""Host-side dataset: CSV-manifest reading, image decode, batched prefetch.

Counterpart of the reference's ``MedicineDataset`` + torch DataLoader
(reference ``dataset/data_loading.py:199-251``, ``train.py:128-133``), split
TPU-style: the host only decodes and resizes (cv2), while every random
augmentation runs on device (``lmnet_tpu.data.augment``).  A tiny
thread-pool prefetcher replaces the 10 forked DataLoader workers.

Decode parity: cv2.imread (BGR) converted to RGB; masks are grayscale
binarized at 127 (reference :237-239).  Train images are decoded at
``load_size`` (default 1.125x the crop size) so the on-device
RandomResizedCrop has real headroom; val images are resized straight to
``img_size`` (reference val path: Resize + Normalize).
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass

import numpy as np
import pandas as pd


def _imread(path: str, gray: bool = False):
    import cv2

    flag = cv2.IMREAD_GRAYSCALE if gray else cv2.IMREAD_COLOR
    img = cv2.imread(path, flag)
    if img is None:
        raise FileNotFoundError(path)
    if not gray:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return img


@dataclass
class SegmentationDataset:
    """CSV-manifest dataset yielding (uint8 image HWC, uint8 mask HW)."""

    df: pd.DataFrame
    mode: str  # 'train' | 'val' | 'test'
    img_size: int = 256
    load_size: int | None = None  # decode size for train mode
    root: str | None = None  # optional prefix for relative manifest paths
    mask_mode: str = "binary"  # 'binary' (>127 threshold) | 'index' (VOC-style class ids)

    @classmethod
    def from_csv(cls, csv_path: str, mode: str, **kw) -> "SegmentationDataset":
        return cls(pd.read_csv(csv_path), mode, **kw)

    def __post_init__(self):
        if self.load_size is None:
            self.load_size = int(self.img_size * 9 / 8)

    def __len__(self):
        return len(self.df)

    def shard(self, rank: int, world: int) -> "SegmentationDataset":
        """Per-host manifest sharding (the DistributedSampler analogue):
        process ``rank`` of ``world`` sees rows rank::world."""
        if world <= 1:
            return self
        return SegmentationDataset(
            self.df.iloc[rank::world].reset_index(drop=True),
            self.mode, self.img_size, self.load_size, self.root, self.mask_mode,
        )

    def _resolve(self, row, col):
        p = row[col]
        if "directory" in row and isinstance(row.get("directory"), str):
            import os

            p = os.path.join(row["directory"], p)
        if self.root is not None:
            import os

            p = os.path.join(self.root, p)
        return p

    def __getitem__(self, idx: int):
        import cv2

        row = self.df.iloc[idx]
        img = _imread(self._resolve(row, "images"))
        mask = _imread(self._resolve(row, "masks"), gray=True)
        if self.mask_mode == "binary":
            mask = (mask > 127).astype(np.uint8)
        else:  # 'index': mask already holds class ids (e.g. VOC)
            mask = mask.astype(np.uint8)
        size = self.load_size if self.mode == "train" else self.img_size
        img = cv2.resize(img, (size, size), interpolation=cv2.INTER_LINEAR)
        mask = cv2.resize(mask, (size, size), interpolation=cv2.INTER_NEAREST)
        return img, mask


def make_loader(
    dataset,
    batch_size: int,
    shuffle: bool = False,
    seed: int = 0,
    drop_last: bool = False,
    num_threads: int = 4,
    prefetch: int = 2,
    epoch: int = 0,
):
    """Iterate (images (B,H,W,3) uint8, masks (B,H,W) uint8) numpy batches.

    Deterministic order per (seed, epoch); decode happens in a thread pool
    and batches are prefetched so device work overlaps host IO.
    """
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        order = np.random.RandomState(seed + epoch).permutation(n)
    if drop_last:
        nb = n // batch_size
    else:
        nb = (n + batch_size - 1) // batch_size

    import concurrent.futures as cf

    pool = cf.ThreadPoolExecutor(max(num_threads, 1)) if num_threads > 1 else None

    def load_batch(bi):
        idxs = [int(i) for i in order[bi * batch_size : (bi + 1) * batch_size]]
        if pool is not None:
            items = list(pool.map(dataset.__getitem__, idxs))
        else:
            items = [dataset[i] for i in idxs]
        imgs = np.stack([it[0] for it in items])
        masks = np.stack([it[1] for it in items])
        return imgs, masks

    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    stop = threading.Event()

    def worker():
        try:
            for bi in range(nb):
                if stop.is_set():
                    return
                q.put(load_batch(bi))
        finally:
            q.put(None)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                break
            yield item
    finally:
        stop.set()
        if pool is not None:
            pool.shutdown(wait=False)


class SyntheticDataset:
    """CPU-runnable stand-in for smoke tests and benchmarking: random blobs
    with circle masks (no files needed)."""

    def __init__(self, n: int = 8, img_size: int = 256, mode: str = "train", seed: int = 0):
        self.n = n
        self.img_size = img_size
        self.load_size = int(img_size * 9 / 8) if mode == "train" else img_size
        self.mode = mode
        self.seed = seed

    def __len__(self):
        return self.n

    def shard(self, rank: int, world: int) -> "SyntheticDataset":
        if world <= 1:
            return self
        out = SyntheticDataset(
            (self.n - rank + world - 1) // world, self.img_size, self.mode, self.seed
        )
        out._offset = rank
        out._stride = world
        return out

    _offset = 0
    _stride = 1

    def __getitem__(self, idx: int):
        rng = np.random.RandomState(self.seed + self._offset + idx * self._stride)
        s = self.load_size if self.mode == "train" else self.img_size
        img = rng.randint(0, 256, (s, s, 3), dtype=np.uint8)
        yy, xx = np.mgrid[:s, :s]
        cy, cx = rng.randint(s // 4, 3 * s // 4, 2)
        r = rng.randint(s // 8, s // 4)
        mask = ((yy - cy) ** 2 + (xx - cx) ** 2 < r**2).astype(np.uint8)
        # paint the circle brighter so the task is learnable
        img = np.where(mask[..., None] > 0, np.minimum(img + 60, 255), img).astype(np.uint8)
        return img, mask
