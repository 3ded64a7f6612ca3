"""Raster-scan tiling and tissue (foreground) detection.

Reproduces the reference's ROI identification rule (reference:
RoiBuilder.py:104-114 and :156-167): a tile is tissue when

  * the population stddev of its red channel exceeds 5 (contrast check,
    PIL ``ImageStat.Stat(roi).stddev[0]``), AND
  * more than 1000 pixels pass the HSV mask h > 120 AND 50 < v < 210,
    where h/v follow PIL's 0..255 'HSV' convention.

Two implementations: a numpy one for host-side cache building, and a
jit-compiled batched JAX one (``tissue_mask_batch``) that filters whole
stacks of candidate tiles on the TPU — the VPU evaluates the mask for
hundreds of tiles in one fused pass, which is where the cache-build
hot loop (reference: RoiBuilder.py:156) goes fast.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

STDDEV_MIN = 5.0
HUE_MIN = 120.0
VAL_MIN = 50.0
VAL_MAX = 210.0
MIN_TISSUE_PIXELS = 1000


def sliding_window(dimensions, step_size: int, padding: int = 0):
    """Raster coordinates over an image of ``dimensions`` (rows, cols, ...).

    Coordinate tuples are (row, col); iteration order and bounds match the
    reference exactly (reference: RoiBuilder.py:104-114) so cached raster
    files are interchangeable.
    """
    return [
        (x, y)
        for y in range(padding, dimensions[1] - step_size - padding - 1, step_size)
        for x in range(padding, dimensions[0] - step_size - padding - 1, step_size)
    ]


def _rgb_to_hv(r, g, b, xp):
    """Hue and value channels in PIL's 0..255 'HSV' convention.

    Mirrors PIL's C converter: v = max(r,g,b); h = 255 * hue_fraction.
    Saturation is not needed by the filter. Works for numpy and jnp.
    """
    maxc = xp.maximum(xp.maximum(r, g), b)
    minc = xp.minimum(xp.minimum(r, g), b)
    delta = maxc - minc
    safe = xp.where(delta == 0, 1.0, delta)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = xp.where(
        r == maxc, bc - gc, xp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = (h / 6.0) % 1.0
    h = xp.where(delta == 0, 0.0, h)
    return xp.floor(h * 255.0), maxc


def is_tissue(tile_u8: np.ndarray) -> bool:
    """Host-side single-tile filter. tile_u8: [H, W, 3] uint8."""
    t = tile_u8.astype(np.float32)
    r = t[..., 0]
    n = r.size
    var = (r * r).sum() / n - (r.sum() / n) ** 2
    if np.sqrt(max(var, 0.0)) <= STDDEV_MIN:
        return False
    h, v = _rgb_to_hv(r, t[..., 1], t[..., 2], np)
    mask = (h > HUE_MIN) & (v > VAL_MIN) & (v < VAL_MAX)
    return int(mask.sum()) > MIN_TISSUE_PIXELS


@partial(jax.jit, static_argnames=())
def tissue_mask_batch(tiles_u8: jax.Array) -> jax.Array:
    """Batched on-device filter. tiles_u8: [N, H, W, 3] uint8 -> [N] bool."""
    t = tiles_u8.astype(jnp.float32)
    r = t[..., 0]
    n = r.shape[1] * r.shape[2]
    mean = jnp.sum(r, axis=(1, 2)) / n
    var = jnp.sum(r * r, axis=(1, 2)) / n - mean**2
    contrast = jnp.sqrt(jnp.maximum(var, 0.0)) > STDDEV_MIN

    h, v = _rgb_to_hv(r, t[..., 1], t[..., 2], jnp)
    mask = (h > HUE_MIN) & (v > VAL_MIN) & (v < VAL_MAX)
    n_pass = jnp.sum(mask, axis=(1, 2))
    return contrast & (n_pass > MIN_TISSUE_PIXELS)


def extract_tissue_tiles(img: np.ndarray, roi_size: int, padding: int = 0,
                         *, device_batch: int = 64, use_device: bool = True):
    """img [H, W, 3] uint8 -> (tiles [T, roi, roi, 3] uint8, coords [T, 2]).

    Scans the raster, then filters candidates in device batches (falls back
    to the host filter when ``use_device`` is False).
    """
    raster = sliding_window(img.shape, roi_size, padding)
    tiles, coords = [], []
    if not use_device:
        for (x, y) in raster:
            tile = np.asarray(img[x:x + roi_size, y:y + roi_size, :])
            if is_tissue(tile):
                tiles.append(tile)
                coords.append((x, y))
    else:
        for start in range(0, len(raster), device_batch):
            chunk = raster[start:start + device_batch]
            batch = np.stack([
                np.asarray(img[x:x + roi_size, y:y + roi_size, :])
                for (x, y) in chunk
            ])
            keep = np.asarray(tissue_mask_batch(jnp.asarray(batch)))
            for tile, coord, k in zip(batch, chunk, keep):
                if k:
                    tiles.append(tile)
                    coords.append(coord)
    if tiles:
        return np.stack(tiles), np.asarray(coords)
    return (np.zeros((0, roi_size, roi_size, 3), np.uint8),
            np.zeros((0, 2), np.int64))
