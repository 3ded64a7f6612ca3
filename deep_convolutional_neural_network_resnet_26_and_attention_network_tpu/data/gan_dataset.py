"""Image datasets for GAN pretraining.

Replaces the reference's LMDB-backed MultiResolutionDataset (reference:
style-based-gan-pytorch-master-512/dataset.py:8-40) and the missing
``BCSingleBagDatasetSimple`` streamer (imported at
style-based-gan-pytorch-master-512/train.py:18) with one folder-backed
dataset: images (or tile-cache ``.npy`` stacks) under a directory, resized
per resolution on device, iterated as [B, s, s, 3] float32 batches in
[-1, 1] — the same ``NewResolution(size, batch)`` surface the GAN trainer
calls (reference: train.py:37).
"""

import glob
import os

import numpy as np

import jax.numpy as jnp

from . import transforms


class ImageFolderDataset:
    """All images under root (png/jpg/tif) and/or tile stacks (*.npy)."""

    EXTS = (".png", ".jpg", ".jpeg", ".tif", ".tiff")

    def __init__(self, root: str, *, seed: int | None = None,
                 max_items: int | None = None):
        self.root = root
        self._rng = np.random.default_rng(seed)
        self.files = sorted(
            f for f in glob.glob(os.path.join(root, "**", "*"), recursive=True)
            if f.lower().endswith(self.EXTS + (".npy",)))
        if max_items:
            self.files = self.files[:max_items]
        if not self.files:
            raise FileNotFoundError(f"no images under {root}")
        self.resolution = None
        self.batch_size = 4

    def NewResolution(self, image_size: int, batch_size: int = 4):
        self.resolution = int(image_size)
        self.batch_size = int(batch_size)

    def _load(self, path: str) -> np.ndarray:
        if path.endswith(".npy"):
            arr = np.load(path, mmap_mode="r")
            if arr.ndim == 4:  # tile stack: random tile
                arr = arr[int(self._rng.integers(0, arr.shape[0]))]
            return np.asarray(arr, np.uint8)
        from PIL import Image

        with Image.open(path) as im:
            return np.asarray(im.convert("RGB"), np.uint8)

    def __len__(self):
        return len(self.files)

    def batches(self, *, shuffle: bool = True, drop_last: bool = True):
        """Yield [B, res, res, 3] float32 batches in [-1, 1]."""
        if self.resolution is None:
            raise RuntimeError("call NewResolution(size, batch) first")
        order = np.arange(len(self.files))
        if shuffle:
            self._rng.shuffle(order)
        batch = []
        for idx in order:
            batch.append(self._load(self.files[int(idx)]))
            if len(batch) == self.batch_size:
                yield self._finalize(batch)
                batch = []
        if batch and not drop_last:
            yield self._finalize(batch)

    def _finalize(self, batch):
        shapes = {b.shape for b in batch}
        if len(shapes) == 1:
            # uniform sizes: one batched resize
            return transforms.eval_transform(jnp.asarray(np.stack(batch)),
                                             resolution=self.resolution)
        # mixed sizes: resize each full-frame image individually — padding
        # a smaller image into a larger canvas would leave black borders
        parts = [transforms.eval_transform(jnp.asarray(b[None]),
                                           resolution=self.resolution)
                 for b in batch]
        return jnp.concatenate(parts, axis=0)


# The GAN trainers import this name for the (missing) breast-cancer bag
# streamer (reference: style-based-gan-pytorch-master-512/train.py:18,306);
# the folder dataset provides the same NewResolution/iteration surface.
BCSingleBagDatasetSimple = ImageFolderDataset
