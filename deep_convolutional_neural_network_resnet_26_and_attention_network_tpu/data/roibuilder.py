"""RoiBuilder: whole-slide-image -> filtered tile cache -> transformed bags.

API and cache layout mirror the reference class (reference:
RoiBuilder.py:24-284): same constructor shape ``RoiBuilder(path, params)``,
same status machine INIT -> CACHE MISSING -> VALID -> VALID-READY, same cache
filenames ``$CACHE_DIR/{data,coor}_<basename>_rois_size<roi>_hsvcut_v3.npy``
so existing caches are interchangeable, same methods
``build / update_resolution_and_buffer / get_train_data /
get_validation_data / get_inference_data / getsize / getname / getmeta``.

TPU-native differences (behavior preserved):
  * tiles are HWC uint8 in the cache and bags come back as [T, res, res, 3]
    float32 NHWC device arrays in [-1, 1] — already resident for the
    extractor;
  * tissue filtering during ``build`` runs batched on the accelerator
    (data.tissue.tissue_mask_batch) instead of per-tile PIL/cv2;
  * augmentation runs as one jitted batched program (data.transforms)
    instead of torchvision per-tile CPU loops.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from . import slide_io, tissue, transforms

ROI_SIZE = 1200          # reference: RoiBuilder.py:51
TRAIN_TILE_CAP = 2500    # reference: RoiBuilder.py:230
# zeros fallback for tile-less slides: the reference returns a fixed
# zeros(20, 3, 128, 128) (RoiBuilder.py:236); here the spatial size follows
# the ARMED resolution — a 128px bag among 300px bags would force a fresh
# jit compile and break mesh-sharded batches (deviation noted in PARITY.md)
EMPTY_BAG_TILES = 20
EMPTY_BAG_FALLBACK_RES = 128  # when no resolution armed yet


class RoiBuilder:
    """Tile extraction, caching, and bag generation for one slide.

    Arguments:
        path: full WSI path.
        params: dict of user parameters (caMicroscope ids, outcome labels,
            ...); enriched in-place with cache/status metadata exactly like
            the reference so downstream manifest writers keep working.
    """

    def __init__(self, path: str, params: dict, *, loud: bool = False,
                 rng: np.random.Generator | None = None):
        self.params = params
        self.params["fullpath"] = path
        self.params["basename"] = os.path.split(path)[1].split(".")[0]
        self.params["root_cache_dir"] = os.path.expandvars("$CACHE_DIR")
        # 1200 like the reference; a pre-set params['roi_size'] wins so small
        # fixtures/tests can use tiny tiles (cache filenames encode the size)
        self.params["roi_size"] = params.get("roi_size", ROI_SIZE)
        self.params["padding"] = 0
        self.params["ntiles"] = -1
        self.params["status"] = "INIT"
        self.params["coor_cache"] = "{0}/coor_{1}_rois_size{2}_hsvcut_v3.npy".format(
            self.params["root_cache_dir"], self.params["basename"],
            self.params["roi_size"])
        self.params["data_cache"] = "{0}/data_{1}_rois_size{2}_hsvcut_v3.npy".format(
            self.params["root_cache_dir"], self.params["basename"],
            self.params["roi_size"])
        self.loud = loud
        self._rng = rng or np.random.default_rng()
        self._resolution = None
        # jax.random.PRNGKey initializes a backend client, so the key is
        # built lazily on the first get_train_data() — cache-only builds
        # (data.build_caches workers, N spawned processes) must never open
        # a device client just by constructing a RoiBuilder
        self._train_seed = int(self._rng.integers(0, 2**31 - 1))
        self._train_rng = None

        if os.path.isfile(self.params["data_cache"]):
            raster = np.load(self.params["coor_cache"])
            self.params["ntiles"] = len(raster)
            self.params["status"] = "VALID"
        else:
            self.params["status"] = "CACHE MISSING"

        self.params["caMIC_eligable"] = slide_io.openslide_eligible(path)
        if self.loud:
            print(f"RoiBuilder[{self.params['basename']}] "
                  f"status={self.params['status']} ntiles={self.params['ntiles']}")

    def reseed_augment(self, *entropy: int):
        """Pin BOTH training rng streams (tile-cap subsample + crop/flip
        augmentation) to the given entropy. The live driver calls this per
        (seed, epoch, builder) so a run resumed from a checkpoint replays
        the exact augmentation stream of the uninterrupted run —
        bit-exact elastic resume."""
        ss = np.random.SeedSequence(list(entropy))
        self._rng = np.random.default_rng(ss)
        self._train_seed = int(ss.generate_state(1)[0] & 0x7FFFFFFF)
        self._train_rng = None  # rebuilt lazily from the new seed

    # ------------------------------------------------------------------
    # Generic accessors (reference: RoiBuilder.py:89-102)
    def getsize(self) -> int:
        return self.params["ntiles"]

    def getname(self) -> str:
        return self.params["basename"]

    def getmeta(self) -> dict:
        return self.params

    # kept as staticmethods for API parity
    sliding_window = staticmethod(tissue.sliding_window)

    @staticmethod
    def array_read_region(arr, coord, downsample, size):
        """Pull one tile out of a full-slide array (row, col indexing)."""
        raw = np.asarray(
            arr[coord[0]:coord[0] + size[0], coord[1]:coord[1] + size[1], :])
        return raw, raw

    # ------------------------------------------------------------------
    def build(self) -> bool:
        """Raster-scan the slide, keep tissue tiles, persist the cache.

        (reference: RoiBuilder.py:128-177; the tissue rule lives in
        data.tissue and runs batched on the accelerator)
        """
        if "VALID" in self.params["status"]:
            return True
        if os.path.isfile(self.params["data_cache"]):
            self.params["ntiles"] = len(np.load(self.params["coor_cache"]))
            self.params["status"] = "VALID"
            return True

        img = slide_io.read_slide(self.params["fullpath"])
        from . import native

        if native.available():
            # C++ filter+gather (OpenMP over tiles) for the host hot loop
            tiles, coords = native.extract_tissue_tiles_native(
                img, self.params["roi_size"], self.params["padding"])
        else:
            # host_filter=True keeps the build off the accelerator — set
            # by parallel cache builders (data.build_caches --workers N)
            # whose worker processes must not each open a device client
            tiles, coords = tissue.extract_tissue_tiles(
                img, self.params["roi_size"], self.params["padding"],
                use_device=not self.params.get("host_filter", False))
        # atomic (tmp + os.replace), COOR before DATA: __init__ treats the
        # data cache as the cache-hit marker and immediately reads the
        # coor cache, so a kill between the two writes must leave either
        # nothing or a complete pair — never data-without-coor
        for path, arr in ((self.params["coor_cache"], coords),
                          (self.params["data_cache"], tiles)):
            tmp = "{0}.{1}.tmp.npy".format(path, os.getpid())
            try:
                np.save(tmp, arr)
                os.replace(tmp, path)
            except OSError:
                if os.path.isfile(tmp):
                    os.unlink(tmp)
                raise
        self.params["ntiles"] = len(coords)
        self.params["status"] = "VALID"
        return True

    # ------------------------------------------------------------------
    def update_resolution_and_buffer(self, resolution: int):
        """Set the network input resolution; arms the transforms
        (reference: RoiBuilder.py:182-212)."""
        if "VALID" not in self.params["status"]:
            raise RuntimeError(
                "updating transforms for an uncached slide; call build() first")
        self._resolution = int(resolution)
        self.params["resolution"] = self._resolution
        self.params["status"] = "VALID-READY"

    def _load_cache(self, with_coords: bool = False, mmap: bool = False):
        """``mmap=True`` memory-maps the tile stack — the train path only
        touches <= TRAIN_TILE_CAP of the rows, so a multi-GB cache reads
        only the selected tiles' pages."""
        if not os.path.isfile(self.params["data_cache"]):
            raise RuntimeError(
                f"RoiBuilder has no cache: {self.params['data_cache']}")
        data = np.load(self.params["data_cache"],
                       mmap_mode="r" if mmap else None)
        if with_coords:
            return data, np.load(self.params["coor_cache"])
        return data

    def readahead(self):
        """Hint the kernel to prefetch the raw tile cache's pages.

        The serving daemon's IO pipeline (train/serve.py --io_depth)
        calls this from the producer thread so the NEXT slide's disk
        reads overlap the CURRENT slide's device compute.
        POSIX_FADV_WILLNEED is asynchronous and bounded by the kernel's
        readahead budget, so a 40 GB cache cannot thrash the page cache
        the way an eager read would. Best-effort: no-op off Linux or on
        a missing file."""
        if not hasattr(os, "posix_fadvise"):  # pragma: no cover
            return
        try:
            fd = os.open(self.params["data_cache"], os.O_RDONLY)
            try:
                os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_WILLNEED)
            finally:
                os.close(fd)
        except OSError:
            pass

    def _empty_bag(self):
        res = self._resolution or EMPTY_BAG_FALLBACK_RES
        return jnp.zeros((EMPTY_BAG_TILES, res, res, 3), jnp.float32)

    def _require_ready(self):
        if "VALID-READY" not in self.params["status"]:
            raise RuntimeError(
                "transform not armed (status=[{0}]); call "
                "update_resolution_and_buffer() first".format(
                    self.params["status"]))

    def get_train_data(self):
        """Augmented bag [T<=2500, res, res, 3] float32 in [-1, 1]
        (reference: RoiBuilder.py:215-238)."""
        self._require_ready()
        data = self._load_cache(mmap=True)
        if data.shape[0] > TRAIN_TILE_CAP:
            idx = self._rng.choice(data.shape[0], TRAIN_TILE_CAP, replace=False)
            # sorted gather from the memmap reads only the chosen pages
            data = np.asarray(data[np.sort(idx)])
        else:
            data = np.asarray(data)
        if len(data) == 0:
            return self._empty_bag()
        if self._train_rng is None:
            self._train_rng = jax.random.PRNGKey(self._train_seed)
        self._train_rng, sub = jax.random.split(self._train_rng)
        # Pad(100) at roi 1200 like the reference (RoiBuilder.py:195); for
        # other tile sizes the jitter scales proportionally — a fixed 100px
        # pad on small tiles would make crops mostly zero padding. A
        # params['train_pad'] override (driver --train_pad) wins; 0 turns
        # the pad/crop jitter off entirely (flips still apply), which keeps
        # train and eval tile distributions identical — needed on synthetic
        # tasks where the zero-pad border itself admits a degenerate
        # optimum the eval path can never satisfy (PROFILE.md).
        pad = self.params.get("train_pad")
        if pad is None:
            pad = max(1, round(self.params["roi_size"] * 100 / 1200))
        return transforms.apply_chunked(
            transforms.train_transform, data, rng=sub,
            roi_size=self.params["roi_size"], resolution=self._resolution,
            pad=pad)

    # resolution-keyed eval-tile cache: the eval transform is deterministic,
    # so its output is cached per (slide, roi_size, resolution) — the
    # reference re-resized every validation pass (RoiBuilder.py:240-259),
    # paying full-res IO + resize each of the ~68 validation sweeps of a
    # 340-epoch run. The cache stores the transform's f32 output, so the
    # cached and uncached paths are bitwise identical. Only engaged when
    # actually downsizing (at roi_size == resolution the f32 copy would be
    # 4x LARGER than the raw uint8 cache).
    eval_cache_enabled = True

    def _eval_cache_path(self) -> str:
        # derived from the RAW cache's filename so the tissue-filter
        # version tag (hsvcut_v3) invalidates this cache along with it
        raw = os.path.splitext(
            os.path.basename(self.params["data_cache"]))[0]
        return "{0}/eval_{1}_res{2}_v1.npy".format(
            self.params["root_cache_dir"], raw[len("data_"):],
            self._resolution)

    def _raw_cache_fingerprint(self) -> str:
        """Content identity of the raw tile cache: size + mtime_ns. Used
        instead of mtime ORDERING for eval-cache staleness — a raw cache
        rebuilt within the same timestamp tick with an unchanged tile
        count (e.g. a re-tile with a tweaked filter threshold) would pass
        an `mtime >=` check but changes the fingerprint (mtime_ns is the
        full-resolution stamp of the NEW file, and size shifts with
        content for npy)."""
        st = os.stat(self.params["data_cache"])
        return "{0}:{1}".format(st.st_size, st.st_mtime_ns)

    def _eval_tiles(self, data):
        """Transformed eval bag for the raw stack, via the f32 cache.

        Staleness guards: a fingerprint of the raw tile cache
        (size + mtime_ns) is stored alongside the eval cache and must
        match exactly — deleting / rebuilding data_*.npy therefore
        invalidates it transparently, even when the rebuild lands in the
        same coarse-mtime tick with the same tile count. The write is
        tmp-file + os.replace so an interrupted save can never leave a
        truncated cache behind."""
        use_cache = (self.eval_cache_enabled
                     and self.params["roi_size"] > self._resolution)
        path = self._eval_cache_path() if use_cache else None
        fp_path = path + ".fp" if path else None
        if path and os.path.isfile(path):
            try:
                with open(fp_path) as f:
                    fresh = f.read() == self._raw_cache_fingerprint()
                cached = np.load(path, mmap_mode="r") if fresh else None
                if cached is not None and cached.shape[0] == len(data):
                    return jnp.asarray(np.array(cached))
            except (OSError, ValueError):
                pass  # unreadable/corrupt cache: fall through and rewrite
        out = transforms.apply_chunked(
            transforms.eval_transform, data, resolution=self._resolution)
        if path:
            # ends in .npy so np.save writes exactly this name; the
            # fingerprint lands AFTER the data (a kill between the two
            # leaves a fingerprint-less cache, which reads as stale)
            tmp = "{0}.{1}.tmp.npy".format(path, os.getpid())
            tmp_fp = "{0}.{1}.tmp".format(fp_path, os.getpid())
            try:
                np.save(tmp, np.asarray(out))
                os.replace(tmp, path)
                with open(tmp_fp, "w") as f:
                    f.write(self._raw_cache_fingerprint())
                os.replace(tmp_fp, fp_path)
            except OSError:
                for t in (tmp, tmp_fp):
                    if os.path.isfile(t):
                        os.unlink(t)
        return out

    def get_validation_data(self):
        """Deterministic bag [T, res, res, 3] (reference: RoiBuilder.py:240-259)."""
        self._require_ready()
        data = self._load_cache()
        if len(data) == 0:
            return self._empty_bag()
        return self._eval_tiles(data)

    def get_inference_data(self):
        """(tiles [T, res, res, 3], coords [T, 2], raw uint8 tiles) — no
        randomization or capping (reference: RoiBuilder.py:261-284)."""
        self._require_ready()
        img_data, coords = self._load_cache(with_coords=True)
        if len(img_data) == 0:
            # same zeros fallback as the other getters — one degenerate
            # slide must not sink an interface/heatmap sweep
            return self._empty_bag(), np.zeros((0, 2), np.int64), img_data
        return self._eval_tiles(img_data), coords, img_data
