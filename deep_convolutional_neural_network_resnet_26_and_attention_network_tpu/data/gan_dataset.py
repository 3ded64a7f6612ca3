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


def _is_image_array(path: str) -> bool:
    """True unless ``path`` is a .npy that is not image-shaped. RoiBuilder
    caches live next to their ``coor_*.npy`` coordinate arrays ([T, 2]) —
    globbing a tile-cache dir must not ingest those as images. Shape comes
    from the npy header via mmap (no data read)."""
    if not path.lower().endswith(".npy"):
        return True
    try:
        shape = np.load(path, mmap_mode="r").shape
    except Exception:
        return False
    return (len(shape) in (3, 4)) and shape[-1] in (1, 3, 4)


class ImageFolderDataset:
    """All images under root (png/jpg/tif) and/or tile stacks (*.npy)."""

    EXTS = (".png", ".jpg", ".jpeg", ".tif", ".tiff")

    def __init__(self, root: str, *, seed: int | None = None,
                 max_items: int | None = None):
        self.root = root
        self._rng = np.random.default_rng(seed)
        self.files = sorted(
            f for f in glob.glob(os.path.join(root, "**", "*"), recursive=True)
            if f.lower().endswith(self.EXTS + (".npy",))
            and _is_image_array(f))
        if max_items:
            self.files = self.files[:max_items]
        if not self.files:
            raise FileNotFoundError(f"no images under {root}")
        self.resolution = None
        self.batch_size = 4

    def NewResolution(self, image_size: int, batch_size: int = 4):
        self.resolution = int(image_size)
        self.batch_size = int(batch_size)

    def reseed(self, *entropy: int):
        """Pin the shuffle/sampling rng to (entropy...) — the GAN trainer
        calls this per (seed, epoch) so a resumed run replays the exact
        batch order of the uninterrupted run (bit-exact resume)."""
        self._rng = np.random.default_rng(np.random.SeedSequence(
            list(entropy)))

    def _load(self, path: str) -> np.ndarray:
        if path.lower().endswith(".npy"):
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


class MultiResolutionStore:
    """Prebuilt per-resolution tile store — the reference's LMDB
    ``MultiResolutionDataset`` (reference:
    style-based-gan-pytorch-master-512/dataset.py:8-40, keys
    ``{resolution}-{index:05d}``) re-shaped for TPU input pipelines: one
    memory-mapped ``res_{s:04d}.npy`` uint8 array of shape [N, s, s, 3] per
    resolution plus a ``meta.json`` index. Progressive training switches
    resolution by switching memmaps; no per-fetch decode or resize, and
    batches reach the device as contiguous uint8 slabs.

    Exposes the same ``NewResolution(size, batch)`` / ``batches()`` surface
    as :class:`ImageFolderDataset`, so the GAN trainer takes either.
    """

    META = "meta.json"

    def __init__(self, path: str, *, seed: int | None = None):
        import json

        self.root = path
        with open(os.path.join(path, self.META)) as f:
            meta = json.load(f)
        self.length = int(meta["length"])
        self.resolutions = sorted(int(r) for r in meta["resolutions"])
        self._rng = np.random.default_rng(seed)
        self._maps = {}
        self.resolution = None
        self.batch_size = 4

    # ---------------------------------------------------------------- build
    @classmethod
    def build(cls, src_root: str, out_dir: str, *,
              resolutions=(4, 8, 16, 32, 64, 128, 256, 512),
              seed: int | None = None, max_items: int | None = None,
              chunk: int = 64) -> "MultiResolutionStore":
        """Prebuild the store from a folder of images / ``.npy`` tile stacks.

        Every image — and every tile of every ``.npy`` tile stack — is
        loaded once and resized to every resolution (device-batched, the
        same anti-aliased bilinear the eval transform uses), stored as
        uint8. Mirrors the reference's prepare step that fills LMDB with
        pre-resized encodings. Resolutions start at 4: progressive
        training begins at the 4x4 step (train.py's ``init_size``), so a
        store missing it would crash epoch 0.
        """
        import json

        src = ImageFolderDataset(src_root, seed=seed)

        def iter_items():
            """Yield every uint8 image: plain files as-is, tile stacks
            expanded to ALL their tiles (ImageFolderDataset samples one
            random tile per fetch; a prebuilt store must not collapse a
            2000-tile stack to one frozen tile)."""
            count = 0
            for path in src.files:
                if path.lower().endswith(".npy"):
                    arr = np.load(path, mmap_mode="r")
                    stack = arr if arr.ndim == 4 else arr[None]
                    for i in range(stack.shape[0]):
                        if max_items and count >= max_items:
                            return
                        yield np.asarray(stack[i], np.uint8)
                        count += 1
                else:
                    if max_items and count >= max_items:
                        return
                    yield src._load(path)
                    count += 1

        # count from metadata only (npy headers via mmap, +1 per image
        # file) — a counting pass through iter_items would fully decode
        # every image twice
        n = 0
        for path in src.files:
            if path.lower().endswith(".npy"):
                arr = np.load(path, mmap_mode="r")
                n += int(arr.shape[0]) if arr.ndim == 4 else 1
            else:
                n += 1
        if max_items:
            n = min(n, max_items)
        if n == 0:
            raise FileNotFoundError(f"no images under {src_root}")
        os.makedirs(out_dir, exist_ok=True)
        outs = {
            r: np.lib.format.open_memmap(
                os.path.join(out_dir, f"res_{r:04d}.npy"), mode="w+",
                dtype=np.uint8, shape=(n, r, r, 3))
            for r in resolutions
        }
        start, imgs = 0, []

        def flush(start, imgs):
            uniform = len({im.shape for im in imgs}) == 1
            for r in resolutions:
                if uniform:
                    batch = transforms.resize_u8(
                        jnp.asarray(np.stack(imgs)), resolution=r)
                else:
                    batch = jnp.concatenate([
                        transforms.resize_u8(jnp.asarray(im[None]),
                                             resolution=r)
                        for im in imgs], axis=0)
                outs[r][start:start + len(imgs)] = np.asarray(batch)

        for img in iter_items():
            imgs.append(img)
            if len(imgs) == chunk:
                flush(start, imgs)
                start, imgs = start + len(imgs), []
        if imgs:
            flush(start, imgs)
        for mm in outs.values():
            mm.flush()
        with open(os.path.join(out_dir, cls.META), "w") as f:
            json.dump({"length": n,
                       "resolutions": sorted(int(r) for r in resolutions)},
                      f)
        return cls(out_dir, seed=seed)

    # ----------------------------------------------------------------- read
    def NewResolution(self, image_size: int, batch_size: int = 4):
        image_size = int(image_size)
        if image_size not in self.resolutions:
            raise KeyError(
                f"resolution {image_size} not in store {self.resolutions}; "
                "rebuild with MultiResolutionStore.build(...)")
        self.resolution = image_size
        self.batch_size = int(batch_size)

    def reseed(self, *entropy: int):
        """Pin the shuffle/sampling rng to (entropy...) — the GAN trainer
        calls this per (seed, epoch) so a resumed run replays the exact
        batch order of the uninterrupted run (bit-exact resume)."""
        self._rng = np.random.default_rng(np.random.SeedSequence(
            list(entropy)))

    def _memmap(self, res: int):
        if res not in self._maps:
            self._maps[res] = np.load(
                os.path.join(self.root, f"res_{res:04d}.npy"), mmap_mode="r")
        return self._maps[res]

    def __len__(self):
        return self.length

    def batches(self, *, shuffle: bool = True, drop_last: bool = True):
        """Yield [B, res, res, 3] float32 batches in [-1, 1] — pre-resized,
        so the only device work is the uint8 -> [-1, 1] normalize."""
        if self.resolution is None:
            raise RuntimeError("call NewResolution(size, batch) first")
        mm = self._memmap(self.resolution)
        order = np.arange(self.length)
        if shuffle:
            self._rng.shuffle(order)
        B = self.batch_size
        for start in range(0, self.length, B):
            idx = np.sort(order[start:start + B])  # sorted = faster memmap IO
            if len(idx) < B and drop_last:
                return
            raw = jnp.asarray(mm[idx])
            yield transforms.normalize_u8(raw)


# The GAN trainers import this name for the (missing) breast-cancer bag
# streamer (reference: style-based-gan-pytorch-master-512/train.py:18,306);
# the folder dataset provides the same NewResolution/iteration surface.
BCSingleBagDatasetSimple = ImageFolderDataset


def _main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(
        description="Prebuild a resolution-keyed GAN tile store "
                    "(the reference's LMDB prepare step).")
    ap.add_argument("--src", required=True, help="image / tile-stack folder")
    ap.add_argument("--out", required=True, help="store output directory")
    ap.add_argument("--max-size", type=int, default=512)
    ap.add_argument("--min-size", type=int, default=4,
                    help="progressive training starts at 4x4 — keep 4 "
                         "unless --init_size is raised to match")
    ap.add_argument("--max-items", type=int, default=None)
    ap.add_argument("--seed", type=int, default=None)
    args = ap.parse_args(argv)
    res = []
    r = args.min_size
    while r <= args.max_size:
        res.append(r)
        r *= 2
    store = MultiResolutionStore.build(
        args.src, args.out, resolutions=tuple(res), seed=args.seed,
        max_items=args.max_items)
    print(f"built {args.out}: {len(store)} items @ {store.resolutions}")


if __name__ == "__main__":
    _main()
