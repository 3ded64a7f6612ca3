"""ctypes bindings for the native (C++) data-path kernels.

Builds ``native/tissue_filter.cpp`` with g++ on first use (cached next to
the source; OpenMP when available) and exposes:

  tissue_mask_native(img, coords, roi)   -> bool[n] keep flags
  gather_tiles_native(img, coords, roi)  -> uint8 [n, roi, roi, 3]

Both match the Python/JAX tissue rule exactly (tests compare against
data.tissue). ``available()`` gates callers: environments without a C++
toolchain fall back to the JAX batched filter transparently.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

from . import tissue

_SRC = os.path.join(os.path.dirname(__file__), "..", "native",
                    "tissue_filter.cpp")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build_and_load():
    src = os.path.abspath(_SRC)
    out_dir = os.environ.get("GBMNET_NATIVE_DIR",
                             os.path.dirname(src))
    so_path = os.path.join(out_dir, "libtissue_filter.so")
    if not os.path.exists(so_path) or (
            os.path.getmtime(so_path) < os.path.getmtime(src)):
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-fopenmp", src, "-o", so_path]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            # retry without OpenMP (toolchains missing libgomp)
            cmd = ["g++", "-O3", "-shared", "-fPIC", src, "-o", so_path]
            subprocess.run(cmd, check=True, capture_output=True)
    lib = ctypes.CDLL(so_path)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.tissue_mask.argtypes = [
        u8p, ctypes.c_int64, ctypes.c_int64, i64p, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_int64, u8p]
    lib.tissue_mask.restype = None
    lib.gather_tiles.argtypes = [
        u8p, ctypes.c_int64, ctypes.c_int64, i64p, ctypes.c_int64,
        ctypes.c_int64, u8p]
    lib.gather_tiles.restype = None
    return lib


def _get_lib():
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is None and not _TRIED:
            _TRIED = True
            try:
                _LIB = _build_and_load()
            except Exception:
                _LIB = None
    return _LIB


def available() -> bool:
    return _get_lib() is not None


def _as_c(img, coords):
    img = np.ascontiguousarray(img, np.uint8)
    coords = np.ascontiguousarray(coords, np.int64)
    return img, coords


def tissue_mask_native(img: np.ndarray, coords: np.ndarray,
                       roi: int) -> np.ndarray:
    """keep flags for roi-sized tiles at (row, col) coords of img [H,W,3]."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native tissue filter unavailable (no g++?)")
    img, coords = _as_c(img, coords)
    n = coords.shape[0]
    keep = np.zeros((n,), np.uint8)
    lib.tissue_mask(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        img.shape[0], img.shape[1],
        coords.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n, roi,
        tissue.STDDEV_MIN, tissue.HUE_MIN, tissue.VAL_MIN, tissue.VAL_MAX,
        tissue.MIN_TISSUE_PIXELS,
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return keep.astype(bool)


def gather_tiles_native(img: np.ndarray, coords: np.ndarray,
                        roi: int) -> np.ndarray:
    """Contiguous [n, roi, roi, 3] gather of tiles at (row, col) coords."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native tile gather unavailable (no g++?)")
    img, coords = _as_c(img, coords)
    n = coords.shape[0]
    out = np.empty((n, roi, roi, 3), np.uint8)
    lib.gather_tiles(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        img.shape[0], img.shape[1],
        coords.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n, roi,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


def extract_tissue_tiles_native(img: np.ndarray, roi_size: int,
                                padding: int = 0):
    """Native end-to-end raster scan: filter then gather survivors.
    Drop-in for data.tissue.extract_tissue_tiles."""
    raster = np.asarray(tissue.sliding_window(img.shape, roi_size, padding),
                        np.int64).reshape(-1, 2)
    if raster.size == 0:
        return (np.zeros((0, roi_size, roi_size, 3), np.uint8),
                np.zeros((0, 2), np.int64))
    keep = tissue_mask_native(img, raster, roi_size)
    coords = raster[keep]
    tiles = gather_tiles_native(img, coords, roi_size)
    return tiles, coords
