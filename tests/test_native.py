"""Native C++ tissue filter/gather vs the Python/JAX reference rule."""

import numpy as np
import pytest

import conftest  # noqa: F401

from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.data import (
    native,
    tissue,
)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def _slide(rng, size=300):
    base = np.array([140, 60, 170], np.int16)
    img = np.full((size, size, 3), 255, np.uint8)          # white half
    img[: size // 2] = np.clip(
        base + rng.integers(-40, 40, (size // 2, size, 3)), 0, 255)
    # a flat gray stripe (fails contrast) and a noisy gray stripe
    img[size // 2: size // 2 + 40] = 128
    return img


def test_native_mask_matches_python():
    rng = np.random.default_rng(0)
    img = _slide(rng)
    roi = 64
    raster = np.asarray(tissue.sliding_window(img.shape, roi, 0), np.int64)
    got = native.tissue_mask_native(img, raster, roi)
    want = np.asarray([tissue.is_tissue(
        img[r:r + roi, c:c + roi]) for (r, c) in raster])
    np.testing.assert_array_equal(got, want)
    assert want.any() and not want.all()  # the fixture exercises both sides


def test_native_gather_matches_slicing():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (200, 200, 3), np.uint8)
    coords = np.asarray([[0, 0], [50, 64], [136, 100]], np.int64)
    tiles = native.gather_tiles_native(img, coords, 64)
    for tile, (r, c) in zip(tiles, coords):
        np.testing.assert_array_equal(tile, img[r:r + 64, c:c + 64])


def test_native_end_to_end_matches_device_path():
    rng = np.random.default_rng(2)
    img = _slide(rng, size=260)
    t_native, c_native = native.extract_tissue_tiles_native(img, 64)
    t_jax, c_jax = tissue.extract_tissue_tiles(img, 64)
    np.testing.assert_array_equal(c_native, c_jax)
    np.testing.assert_array_equal(t_native, t_jax)


def test_native_border_coords_are_safe():
    """Coords whose roi overruns the image edge must not read past the
    buffer: the mask evaluates the short tile (numpy-slice semantics) and
    the gather zero-fills the out-of-range region."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.data import (
        native,
        tissue,
    )

    if not native.available():
        import pytest

        pytest.skip("no native toolchain")
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (100, 90, 3)).astype(np.uint8)
    roi = 32
    coords = np.asarray([[80, 70], [90, 0], [0, 85], [-5, 0], [200, 0]],
                        np.int64)
    keep = native.tissue_mask_native(img, coords, roi)
    assert keep.shape == (5,)
    assert keep[3] == 0 and keep[4] == 0  # fully out of range -> reject

    tiles = native.gather_tiles_native(img, coords, roi)
    assert tiles.shape == (5, roi, roi, 3)
    # in-range region matches the image; overrun region is zero
    np.testing.assert_array_equal(tiles[0, :20, :20], img[80:100, 70:90])
    assert (tiles[0, 20:, :] == 0).all() and (tiles[0, :, 20:] == 0).all()
    assert (tiles[3] == 0).all() and (tiles[4] == 0).all()
    # short-tile mask semantics match the Python rule on the clipped slice
    short = img[80:100, 70:90]
    assert bool(keep[0]) == bool(tissue.is_tissue(short))
