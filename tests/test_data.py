"""Data layer tests: tissue filter parity vs PIL, transforms, RoiBuilder
cache lifecycle, dataset split/labels, and the padded-bag loader."""

import json
import os

import numpy as np
import pytest
from PIL import Image, ImageStat

import conftest  # noqa: F401  (forces the 8-device CPU mesh)
import jax
import jax.numpy as jnp

from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.data import (
    accessors,
    dataset as ds,
    loader,
    roibuilder,
    slide_io,
    tissue,
    transforms,
)


# ---------------------------------------------------------------- tissue
def _pil_reference_filter(tile_u8):
    """The reference's exact per-tile rule via PIL/numpy
    (RoiBuilder.py:159-167 semantics, re-derived independently)."""
    roi = Image.fromarray(tile_u8)
    if ImageStat.Stat(roi).stddev[0] <= 5:
        return False
    hsv = np.asarray(roi.convert("HSV")).astype(np.int32)
    h, v = hsv[..., 0], hsv[..., 2]
    o = (h > 120) & (v > 50) & (v < 210)
    return int(o.sum()) > 1000


def _tissue_like(rng, shape=(64, 64, 3)):
    """Purple-ish H&E-looking noise that passes the HSV gate."""
    base = np.array([140, 60, 170], np.int16)  # R,G,B purple
    noise = rng.integers(-40, 40, shape).astype(np.int16)
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def test_tissue_filter_matches_pil_semantics():
    rng = np.random.default_rng(0)
    tiles = []
    tiles.append(np.full((64, 64, 3), 255, np.uint8))          # white: reject
    tiles.append(np.full((64, 64, 3), 128, np.uint8))          # flat: reject
    tiles.append(_tissue_like(rng))                            # tissue: accept
    for _ in range(12):                                        # random tiles
        tiles.append(rng.integers(0, 256, (64, 64, 3), np.uint8))
    got_host = [tissue.is_tissue(t) for t in tiles]
    got_dev = np.asarray(tissue.tissue_mask_batch(jnp.asarray(np.stack(tiles))))
    want = [_pil_reference_filter(t) for t in tiles]
    assert got_host == want
    assert got_dev.tolist() == want
    assert want[0] is False and want[2] is True


def test_sliding_window_layout():
    coords = tissue.sliding_window((130, 70, 3), 30, padding=0)
    # rows iterate fastest (reference raster order), (row, col) tuples
    assert coords[0] == (0, 0) and coords[1] == (30, 0)
    for (x, y) in coords:
        assert x + 30 <= 130 and y + 30 <= 70


# ------------------------------------------------------------ transforms
def test_eval_transform_range_and_shape():
    rng = np.random.default_rng(1)
    tiles = rng.integers(0, 256, (5, 48, 48, 3), np.uint8)
    out = transforms.eval_transform(jnp.asarray(tiles), resolution=24)
    assert out.shape == (5, 24, 24, 3)
    assert float(out.min()) >= -1.0 and float(out.max()) <= 1.0
    # identity resolution: exact normalize
    same = transforms.eval_transform(jnp.asarray(tiles), resolution=48)
    np.testing.assert_allclose(
        np.asarray(same), tiles.astype(np.float32) / 127.5 - 1.0, atol=1e-5)


def test_train_transform_statistics():
    rng = np.random.default_rng(2)
    tiles = rng.integers(0, 256, (8, 40, 40, 3), np.uint8)
    out1 = transforms.train_transform(jnp.asarray(tiles), jax.random.PRNGKey(0),
                                      roi_size=40, resolution=20, pad=4)
    out2 = transforms.train_transform(jnp.asarray(tiles), jax.random.PRNGKey(1),
                                      roi_size=40, resolution=20, pad=4)
    assert out1.shape == (8, 20, 20, 3)
    # different rng -> different augmentation
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_apply_chunked_matches_single_shot():
    rng = np.random.default_rng(3)
    tiles = rng.integers(0, 256, (11, 32, 32, 3), np.uint8)
    full = transforms.eval_transform(jnp.asarray(tiles), resolution=16)
    chunked = transforms.apply_chunked(transforms.eval_transform, tiles,
                                       chunk=4, resolution=16)
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked), atol=1e-6)


# ------------------------------------------------------------ RoiBuilder
@pytest.fixture
def cache_dir(tmp_path, monkeypatch):
    d = tmp_path / "cache"
    d.mkdir()
    monkeypatch.setenv("CACHE_DIR", str(d))
    return d


def _synthetic_slide(rng, size=400):
    """Half tissue-like, half white background."""
    img = np.full((size, size, 3), 255, np.uint8)
    img[: size // 2] = _tissue_like(rng, (size // 2, size, 3))
    return img


def test_roibuilder_lifecycle(tmp_path, cache_dir):
    rng = np.random.default_rng(4)
    slide = _synthetic_slide(rng, size=400)
    path = slide_io.write_synthetic_slide(str(tmp_path / "GHP_1_A_HE.npy"), slide)

    params = {"roi_size": 64, "outcome_item": 1}
    b = roibuilder.RoiBuilder(path, params)
    assert b.params["status"] == "CACHE MISSING"
    assert "rois_size64_hsvcut_v3.npy" in b.params["data_cache"]

    assert b.build()
    assert b.params["status"] == "VALID"
    assert b.getsize() > 0
    # only tiles from the tissue half survive
    coords = np.load(b.params["coor_cache"])
    assert (coords[:, 0] < 200).all()

    with pytest.raises(RuntimeError):
        b.get_train_data()  # transform not armed yet

    b.update_resolution_and_buffer(32)
    bag = b.get_train_data()
    assert bag.shape[1:] == (32, 32, 3)
    val = b.get_validation_data()
    assert val.shape[0] == b.getsize()
    stacks, cords, raw = b.get_inference_data()
    assert stacks.shape[0] == len(cords) == len(raw)

    # a second builder on the same path hits the cache
    b2 = roibuilder.RoiBuilder(path, {"roi_size": 64})
    assert b2.params["status"] == "VALID"
    assert b2.getsize() == b.getsize()


# ------------------------------------------------------------- accessors
def _write_cluster_csv(path):
    rows = [
        ["id", "junk"],
        ["header-row", "Actual Cluster Designation"],
        ["GHP_1_A", "A"],
        ["GHP_2_B", "B"],
        ["GHP_3_C", "C"],
        ["GHP_4_D", ""],
    ]
    import csv

    with open(path, "w", newline="") as f:
        csv.writer(f).writerows(rows)


def test_cluster_index_lookup(tmp_path):
    sheet = tmp_path / "clusters.csv"
    _write_cluster_csv(sheet)
    dt = [str, int, str]
    assert accessors.getClusterIndex(("GHP", 1, "A"),
                                     "Actual Cluster Designation",
                                     str(sheet), dtypes=dt) == "A"
    assert accessors.getClusterIndex(("GHP", 3, "C"),
                                     "Actual Cluster Designation",
                                     str(sheet), dtypes=dt) == "C"
    # empty cell -> -1 sentinel, missing -> -9
    assert accessors.getClusterIndex(("GHP", 4, "D"),
                                     "Actual Cluster Designation",
                                     str(sheet), dtypes=dt) == "-1"
    assert accessors.getClusterIndex(("GHP", 9, "Z"),
                                     "Actual Cluster Designation",
                                     str(sheet), dtypes=dt) == "-9"


def test_split_ghp_convention():
    assert accessors.split_GHP_convention("GHP_12_B", [str, int, str]) == (
        "GHP", 12, "B")
    assert accessors.split_GHP_convention("GHP-12-B", [str, int, str]) == (
        "GHP", 12, "B")
    assert accessors.split_GHP_convention("garbage", [str, int, str]) == (
        "-99", -99, "-99")


# -------------------------------------------------------------- dataset
def _fake_cached_slide(img_dir, cache_dir, name, n_tiles, rng, roi=32):
    """Touch a slide file and pre-populate its tile cache."""
    path = os.path.join(img_dir, name)
    with open(path, "wb") as f:
        f.write(b"fake")
    base = os.path.split(path)[1].split(".")[0]
    tiles = np.stack([_tissue_like(rng, (roi, roi, 3)) for _ in range(n_tiles)])
    coords = np.stack([np.array([i * roi, 0]) for i in range(n_tiles)])
    np.save(os.path.join(cache_dir, f"data_{base}_rois_size{roi}_hsvcut_v3.npy"), tiles)
    np.save(os.path.join(cache_dir, f"coor_{base}_rois_size{roi}_hsvcut_v3.npy"), coords)
    return path


@pytest.fixture
def slide_tree(tmp_path, cache_dir):
    rng = np.random.default_rng(5)
    img_dir = tmp_path / "slides"
    img_dir.mkdir()
    sheet = tmp_path / "clusters.csv"
    _write_cluster_csv(sheet)
    for name, n in [("GHP_1_A_H&E.scn", 24), ("GHP_2_B_H&E.scn", 30),
                    ("GHP_3_C_H&E.scn", 25)]:
        _fake_cached_slide(str(img_dir), str(cache_dir), name, n, rng)
    # too few tiles -> dropped
    _fake_cached_slide(str(img_dir), str(cache_dir), "GHP_4_D_H&E.scn", 5, rng)
    # super-normal .svs -> forced label 1
    _fake_cached_slide(str(img_dir), str(cache_dir), "SN_77.svs", 22, rng)
    return tmp_path, img_dir, sheet


def _make_dataset(slide_tree, out_dir, seed=0):
    tmp_path, img_dir, sheet = slide_tree
    return ds.GHPSingleBagDatasetSimple(
        bag=True, output_dir=str(out_dir),
        root_dir=str(tmp_path), image_dir="slides",
        label_sheet=str(sheet), seed=seed)


def test_dataset_load_new_and_modes(slide_tree, tmp_path):
    out = tmp_path / "out"
    out.mkdir()
    d = _make_dataset(slide_tree, out)
    # fixture caches hold 32px tiles -> builders must use roi_size=32
    import deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.data.dataset as dmod

    orig_rb = dmod.RoiBuilder

    def rb32(file, params):
        params = dict(params)
        params["roi_size"] = 32
        return orig_rb(file, params)

    dmod.RoiBuilder = rb32
    try:
        d.load_new(n_folds=4, n_fold_selection=0)
    finally:
        dmod.RoiBuilder = orig_rb

    # GHP_4 dropped (5 < 20 tiles); 3 scn + 1 svs remain
    assert len(d.all_builders) == 4
    # svs got label 1
    svs = [b for b in d.all_builders if "SN_77" in b.getname()]
    assert svs and svs[0].params["outcome_item"] == 1
    # split JSON exists with the reference schema
    files = [f for f in os.listdir(out)
             if f.startswith("training_validation_testing_data")]
    assert files
    with open(out / files[0]) as f:
        split = json.load(f)
    assert set(split) >= {"train_paths", "train_outcomes",
                          "validation_paths", "validation_outcomes"}
    assert len(d.train_slide_builders) + len(d.test_slide_builders) == 4

    w = d.GetClassWeights()
    # always length n_classes; absent-in-fold classes get weight 0
    assert w.shape == (3,) and (w >= 0).all() and (w > 0).any()
    present = [c for c in range(3) if d.train_slide_record.count(c)]
    assert all(w[c] > 0 for c in present)

    d.NewResolution(16)
    d.train()
    tiles, label = d[0]
    assert tiles.shape[1:] == (16, 16, 3)
    d.eval()
    tiles, label = d[0]
    assert tiles.shape[1:] == (16, 16, 3)
    d.interface()
    tiles, label, coords, params = d[0]
    assert len(coords) == tiles.shape[0]
    assert "data_cache" in params

    # checkpoint restore round-trips the same paths
    d2 = ds.GHPSingleBagDatasetSimple(output_dir=str(out))
    dmod.RoiBuilder = rb32
    try:
        d2.load_from_checkpoint(str(out / files[0]))
    finally:
        dmod.RoiBuilder = orig_rb
    assert d2.train_slide_path == split["train_paths"]
    assert d2.test_slide_path == split["validation_paths"]


# ---------------------------------------------------------------- loader
def test_pad_bag_and_buckets():
    assert loader.bucket_for(20) == 32
    assert loader.bucket_for(33) == 64
    tiles = jnp.ones((20, 4, 4, 3))
    padded, mask = loader.pad_bag(tiles)
    assert padded.shape[0] == 32
    assert float(mask.sum()) == 20
    # multiple_of for tile-axis sharding
    padded8, mask8 = loader.pad_bag(jnp.ones((33, 2)), multiple_of=8)
    assert padded8.shape[0] % 8 == 0 and float(mask8.sum()) == 33
    # an explicit target below the bag size must fail at the boundary,
    # not as a shape error deep inside the jitted forward
    with pytest.raises(ValueError, match="cannot pad"):
        loader.pad_bag(jnp.ones((33, 2)), n_tiles=32)


class _ToyDataset:
    def __init__(self, sizes):
        self.sizes = sizes

    def __len__(self):
        return len(self.sizes)

    def __getitem__(self, i):
        t = self.sizes[i]
        return np.full((t, 2, 2, 3), i, np.float32), np.asarray([i % 3])


def test_prefetcher_yields_padded_bags():
    data = _ToyDataset([5, 40, 17])
    seen = list(loader.BagPrefetcher(data, shuffle=False))
    assert len(seen) == 3
    tiles, mask, label = seen[1]
    assert tiles.shape[0] == 64 and float(mask.sum()) == 40 and label == 1


def test_prefetcher_propagates_errors():
    class Boom(_ToyDataset):
        def __getitem__(self, i):
            raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        list(loader.BagPrefetcher(Boom([1]), shuffle=False))


def test_resize_parity_with_pil_within_probability_budget():
    """jax.image.resize(antialias) vs PIL BILINEAR: small per-pixel diffs
    that stay ~1e-6 at the slide-probability level — far inside the 1e-3
    parity budget (BASELINE.md)."""
    from PIL import Image as PILImage

    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.models import (
        attention_mil as amil,
    )

    rng = np.random.default_rng(0)
    tile = rng.integers(0, 256, (240, 240, 3), np.uint8)
    pil = PILImage.fromarray(tile).resize((60, 60), PILImage.BILINEAR)
    ref = (np.asarray(pil, np.float32) / 255.0 - 0.5) / 0.5
    ours = np.asarray(transforms.eval_transform(jnp.asarray(tile[None]),
                                                resolution=60))[0]
    assert np.abs(ours - ref).max() < 0.02  # per-pixel: close, not identical

    cfg = amil.MILConfig(widths=(8, 8, 8, 8), blocks=(1, 1, 1, 1))
    params = amil.init_attention_mil(jax.random.PRNGKey(0), cfg)
    bag_ref, bag_ours = [], []
    for _ in range(8):
        t = rng.integers(0, 256, (240, 240, 3), np.uint8)
        p = PILImage.fromarray(t).resize((60, 60), PILImage.BILINEAR)
        bag_ref.append((np.asarray(p, np.float32) / 255.0 - 0.5) / 0.5)
        bag_ours.append(np.asarray(transforms.eval_transform(
            jnp.asarray(t[None]), resolution=60))[0])
    o_ref = amil.apply_attention_mil(params, jnp.asarray(np.stack(bag_ref)),
                                     0, cfg, train=False)
    o_ours = amil.apply_attention_mil(params, jnp.asarray(np.stack(bag_ours)),
                                      0, cfg, train=False)
    d = np.abs(np.asarray(o_ref["y_pred"]) - np.asarray(o_ours["y_pred"])).max()
    assert d < 1e-3, d


def test_prefetcher_early_exit_stops_producer():
    """Breaking out of iteration must release the producer thread."""
    import threading
    import time as _time

    data = _ToyDataset([4] * 50)
    before = threading.active_count()
    for _ in range(5):
        for item in loader.BagPrefetcher(data, shuffle=False):
            break  # early exit every time
    _time.sleep(0.5)  # let producers observe the closed flag
    assert threading.active_count() <= before + 1


def test_train_data_pad_scales_with_roi(tmp_path, monkeypatch):
    """Small-tile training crops must stay mostly real content — a fixed
    100px pad at roi 32 made them mostly zero padding."""
    monkeypatch.setenv("CACHE_DIR", str(tmp_path))
    rng = np.random.default_rng(0)
    tiles = np.full((8, 32, 32, 3), 200, np.uint8)
    base = "padprobe"
    np.save(tmp_path / f"data_{base}_rois_size32_hsvcut_v3.npy", tiles)
    np.save(tmp_path / f"coor_{base}_rois_size32_hsvcut_v3.npy",
            np.stack([[i * 32, 0] for i in range(8)]))
    path = tmp_path / f"{base}.npy"
    path.write_bytes(b"x")
    b = roibuilder.RoiBuilder(str(path), {"roi_size": 32})
    b.update_resolution_and_buffer(16)
    bag = np.asarray(b.get_train_data())
    # constant-200 tiles normalize to ~0.57; zero padding shows up as -1.0
    frac_padding = float((bag < -0.9).mean())
    assert frac_padding < 0.3, frac_padding


def test_train_pad_zero_disables_crop_jitter(tmp_path, monkeypatch):
    """params['train_pad']=0 (driver --train_pad 0) must yield train bags
    that match the eval bags tile-for-tile up to H/V flips — no zero-pad
    border anywhere. Guards the convergence-run configuration (a border-
    keyed degenerate optimum exists on synthetic tasks; PROFILE.md)."""
    monkeypatch.setenv("CACHE_DIR", str(tmp_path))
    rng = np.random.default_rng(3)
    tiles = rng.integers(10, 245, (6, 16, 16, 3)).astype(np.uint8)
    base = "nopad"
    np.save(tmp_path / f"data_{base}_rois_size16_hsvcut_v3.npy", tiles)
    np.save(tmp_path / f"coor_{base}_rois_size16_hsvcut_v3.npy",
            np.stack([[i * 16, 0] for i in range(6)]))
    path = tmp_path / f"{base}.npy"
    path.write_bytes(b"x")
    b = roibuilder.RoiBuilder(str(path), {"roi_size": 16, "train_pad": 0})
    b.update_resolution_and_buffer(16)
    train = np.asarray(b.get_train_data())
    ev = np.asarray(b.get_validation_data())
    assert train.shape == ev.shape
    assert not (train < -0.99).any()  # no injected zero-pad border
    for i in range(train.shape[0]):
        variants = [ev[i], ev[i][::-1], ev[i][:, ::-1], ev[i][::-1, ::-1]]
        assert any(np.allclose(train[i], v, atol=1e-5) for v in variants), i


def test_prefetcher_stall_instrumentation():
    """BagPrefetcher reports device-idle (wait) time and bag counts."""
    import time as _time

    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.data.loader import (
        BagPrefetcher,
    )

    class Slow:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            _time.sleep(0.02)  # slow producer -> consumer must wait
            return np.ones((3, 4, 4, 3), np.float32), i % 3

    pf = BagPrefetcher(Slow(), buckets=(4,))
    mid = []
    for _ in pf:
        # mid-epoch reads must be live (consume_s alone only updates at
        # iteration end — a naive implementation reads 0.0 all epoch 1)
        mid.append(pf.stall_fraction())
    assert pf.stats["bags"] == 4
    assert pf.stats["produce_s"] > 0
    assert 0.0 <= pf.stall_fraction() <= 1.0
    assert pf.stats["wait_s"] > 0  # nothing overlaps a 0-work consumer
    assert mid[-1] > 0.0 and all(0.0 <= f <= 1.0 for f in mid)


def test_prefetcher_early_break_stops_parallel_producers():
    """Breaking out of a workers>1 iteration must join the pool threads
    before control returns: no dataset reads may land afterwards (they
    would race the next epoch's rng, breaking bit-exact resume)."""
    import time as _time

    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.data.loader import (
        BagPrefetcher,
    )

    reads = []

    class Counting:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            reads.append(i)
            _time.sleep(0.01)
            return np.ones((3, 4, 4, 3), np.float32), 0

    pf = BagPrefetcher(Counting(), shuffle=True, workers=4, seed=0,
                       buckets=(4,))
    for _ in pf:
        break  # early exit mid-epoch
    n_at_return = len(reads)
    _time.sleep(0.3)
    assert len(reads) == n_at_return  # nothing read after the join


def test_eval_tile_cache_roundtrip(tmp_path, monkeypatch):
    """The resolution-keyed eval cache returns bitwise-identical bags and
    skips the transform on the second call."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.data import (
        roibuilder,
        slide_io,
        transforms,
    )

    monkeypatch.setenv("CACHE_DIR", str(tmp_path))
    rng = np.random.default_rng(0)
    base = np.array([140, 60, 170], np.int16)
    img = np.clip(base + rng.integers(-40, 40, (256, 256, 3)), 0,
                  255).astype(np.uint8)
    path = slide_io.write_synthetic_slide(str(tmp_path / "s.npy"), img)
    b = roibuilder.RoiBuilder(path, {"roi_size": 64})
    b.build()
    b.update_resolution_and_buffer(16)  # downsizing -> cache engages

    first = np.asarray(b.get_validation_data())
    cache_file = b._eval_cache_path()
    assert os.path.isfile(cache_file)

    # second call must come from the cache (transform forbidden)...
    def boom(*a, **k):
        raise AssertionError("transform ran despite eval cache")

    monkeypatch.setattr(transforms, "apply_chunked", boom)
    second = np.asarray(b.get_validation_data())
    np.testing.assert_array_equal(first, second)  # ...and be bitwise equal
    monkeypatch.undo()

    # at roi_size == resolution the cache must NOT engage (f32 copy would
    # be 4x larger than the raw uint8 cache)
    monkeypatch.setenv("CACHE_DIR", str(tmp_path))
    b2 = roibuilder.RoiBuilder(path, {"roi_size": 64})
    b2.update_resolution_and_buffer(64)
    b2.get_validation_data()
    assert not os.path.isfile(b2._eval_cache_path())


def test_prefetcher_multiworker_delivers_all_bags():
    """workers>1 parallelizes production; every bag arrives exactly once
    (order-free, hence train/shuffle only)."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.data.loader import (
        BagPrefetcher,
    )

    class DS:
        def __len__(self):
            return 12

        def __getitem__(self, i):
            return np.full((2, 4, 4, 3), i, np.float32), i % 3

    pf = BagPrefetcher(DS(), shuffle=True, workers=4, buckets=(2,), seed=0)
    seen = sorted(int(tiles[0, 0, 0, 0]) for tiles, _, _ in pf)
    assert seen == list(range(12))
    assert pf.stats["bags"] == 12

    with pytest.raises(ValueError, match="shuffle"):
        BagPrefetcher(DS(), shuffle=False, workers=2)


def test_eval_tile_cache_invalidates_on_rebuild(tmp_path, monkeypatch):
    """Rebuilding the raw tile cache (different tile count / newer mtime)
    must transparently invalidate the derived eval cache — stale cached
    tiles paired with fresh coords would mis-place heatmap attention."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.data import (
        roibuilder,
        slide_io,
    )

    monkeypatch.setenv("CACHE_DIR", str(tmp_path))
    rng = np.random.default_rng(1)
    base = np.array([140, 60, 170], np.int16)
    img = np.clip(base + rng.integers(-40, 40, (256, 256, 3)), 0,
                  255).astype(np.uint8)
    path = slide_io.write_synthetic_slide(str(tmp_path / "s2.npy"), img)
    b = roibuilder.RoiBuilder(path, {"roi_size": 64})
    b.build()
    b.update_resolution_and_buffer(16)
    first = np.asarray(b.get_validation_data())
    assert os.path.isfile(b._eval_cache_path())

    # simulate a re-tile that changed the tile count: shrink the raw cache
    raw = np.load(b.params["data_cache"])
    assert raw.shape[0] > 1
    np.save(b.params["data_cache"], raw[:-1])
    np.save(b.params["coor_cache"],
            np.load(b.params["coor_cache"])[:-1])
    os.utime(b.params["data_cache"])  # newer than the eval cache

    second = np.asarray(b.get_validation_data())
    assert second.shape[0] == first.shape[0] - 1  # fresh, not stale

    # the filter-version tag from the raw cache name is part of the eval
    # cache name, so a hsvcut bump cannot serve old-era tiles
    assert "hsvcut_v3" in os.path.basename(b._eval_cache_path())


def test_eval_tile_cache_invalidates_same_tick_same_count(tmp_path,
                                                          monkeypatch):
    """A raw cache rebuilt with the SAME tile count and an mtime equal to
    the eval cache's (the same-filesystem-tick race a mtime>=

    ordering check cannot see) must still invalidate: staleness compares
    the stored size+mtime_ns fingerprint of the raw cache, not timestamp
    ordering."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.data import (
        roibuilder,
        slide_io,
    )

    monkeypatch.setenv("CACHE_DIR", str(tmp_path))
    rng = np.random.default_rng(2)
    base = np.array([140, 60, 170], np.int16)
    img = np.clip(base + rng.integers(-40, 40, (256, 256, 3)), 0,
                  255).astype(np.uint8)
    path = slide_io.write_synthetic_slide(str(tmp_path / "s3.npy"), img)
    b = roibuilder.RoiBuilder(path, {"roi_size": 64})
    b.build()
    b.update_resolution_and_buffer(16)
    first = np.asarray(b.get_validation_data())
    eval_path = b._eval_cache_path()

    # re-tile with unchanged tile COUNT but different content (e.g. a
    # tweaked filter threshold keeping the same tiles, different pixels),
    # then pin the raw cache's mtime to the eval cache's exact timestamp
    # so any ordering-based check calls it fresh
    raw = np.load(b.params["data_cache"])
    np.save(b.params["data_cache"], 255 - raw)
    st = os.stat(eval_path)
    os.utime(b.params["data_cache"], ns=(st.st_atime_ns, st.st_mtime_ns))

    second = np.asarray(b.get_validation_data())
    assert second.shape == first.shape
    assert not np.array_equal(second, first)  # recomputed, not stale


def test_outcome_grade_mrn_lookups(tmp_path):
    """getOutcome (ids col 0, headers row 4), getGrade (ids col 1, headers
    row 1), getMRN (ids col 1, value col 0) with the reference's sentinel
    codes: -9 missing/empty, -99 bad dtype (DataAccessors.py:13-117)."""
    import csv as _csv

    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.data import (
        accessors,
    )

    rows = [
        ["", "Grade", "Other"],          # row 0: grade headers
        ["", "", ""],                     # row 1 (cluster headers elsewhere)
        ["", "", ""],
        ["", "Survival", "Status"],       # row 3: outcome headers
        ["", "", ""],
        ["GHP_7", "777", ""],             # outcome row: id col 0
        ["12345", "GHP_8", "IV"],         # grade/MRN row: id col 1
        ["", "GHP_9", "not-a-number"],
    ]
    sheet = tmp_path / "clinical.csv"
    with open(sheet, "w", newline="") as f:
        _csv.writer(f).writerows(rows)

    assert accessors.getOutcome("GHP_7", "Survival", str(sheet)) == 777.0
    assert accessors.getOutcome("GHP_7", "Status", str(sheet)) == -9.0  # empty
    assert accessors.getOutcome("NOPE", "Survival", str(sheet)) == -9.0

    assert accessors.getGrade("GHP_8", "Other", str(sheet), dtype=str) == "IV"
    assert accessors.getGrade("GHP_9", "Other", str(sheet)) == -99.0  # dtype
    assert accessors.getGrade("GHP_8", "Missing", str(sheet)) == -9.0

    assert accessors.getMRN("GHP_8", None, str(sheet)) == 12345.0
    assert accessors.getMRN("GHP_9", None, str(sheet)) == -9.0  # empty col 0
    assert accessors.getMRN("NOPE", None, str(sheet)) == -9.0


def test_bucket_for_oversized_bags_round_to_granule():
    """Bags beyond the top bucket round to a coarse 1024 granule so every
    oversized slide does not compile a fresh program (eval is uncapped)."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.data.loader import (
        bucket_for,
    )

    assert bucket_for(2561) == 3072
    assert bucket_for(5000) == 5120
    assert bucket_for(5000) == bucket_for(4100)  # same compiled shape
    assert bucket_for(2561, multiple_of=8) % 8 == 0
    assert bucket_for(5000, multiple_of=6) % 6 == 0
    assert bucket_for(5000, multiple_of=6) >= 5000


def test_build_caches_cli(tmp_path, monkeypatch):
    """The offline cache-builder CLI scans a slide dir and persists the
    standard caches; a second run reports them as cached."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.data import (
        build_caches,
        slide_io,
    )

    cache = tmp_path / "cache"
    cache.mkdir()
    monkeypatch.setenv("CACHE_DIR", str(cache))
    slides = tmp_path / "imgs"
    slides.mkdir()
    rng = np.random.default_rng(0)
    base = np.array([140, 60, 170], np.int16)
    for name in ("GHP_1_A_H&E.scn", "GHP_2_B_H&E.scn"):
        img = np.clip(base + rng.integers(-40, 40, (200, 200, 3)), 0,
                      255).astype(np.uint8)
        slide_io.write_synthetic_slide(str(slides / name), img)

    # no tifffile in this image: the synthetic writer falls back to .npy
    argv = ["--data_root", str(tmp_path), "--image_dir", "imgs",
            "--roi_size", "64", "--glob", "*H&E.npy"]
    assert build_caches.main(argv) == 0
    built = sorted(os.listdir(cache))
    assert sum(f.startswith("data_") for f in built) == 2
    assert sum(f.startswith("coor_") for f in built) == 2
    assert build_caches.main(argv) == 0  # idempotent: all cached


@pytest.mark.slow
def test_build_caches_cli_parallel_matches_serial(tmp_path, monkeypatch):
    """--workers N builds the cohort in spawned processes; the caches it
    writes must be byte-identical to the serial builder's (same filter
    rule on host, atomic writes, order-independent)."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.data import (
        build_caches,
        slide_io,
    )

    slides = tmp_path / "imgs"
    slides.mkdir()
    rng = np.random.default_rng(3)
    base = np.array([140, 60, 170], np.int16)
    for name in ("GHP_1_A_H&E.scn", "GHP_2_B_H&E.scn", "GHP_3_C_H&E.scn"):
        img = np.clip(base + rng.integers(-40, 40, (200, 200, 3)), 0,
                      255).astype(np.uint8)
        slide_io.write_synthetic_slide(str(slides / name), img)

    argv = ["--data_root", str(tmp_path), "--image_dir", "imgs",
            "--roi_size", "64", "--glob", "*H&E.npy"]
    serial, parallel = tmp_path / "cache_s", tmp_path / "cache_p"
    serial.mkdir(), parallel.mkdir()
    monkeypatch.setenv("CACHE_DIR", str(serial))
    assert build_caches.main(argv) == 0
    monkeypatch.setenv("CACHE_DIR", str(parallel))
    assert build_caches.main(argv + ["--workers", "2"]) == 0

    s_files, p_files = (sorted(os.listdir(d)) for d in (serial, parallel))
    assert s_files == p_files and len(s_files) == 6  # data_+coor_ x3
    for f in s_files:
        np.testing.assert_array_equal(np.load(serial / f),
                                      np.load(parallel / f))

    # a pre-warmed cache is reported, not rebuilt, under --workers too
    assert build_caches.main(argv + ["--workers", "2"]) == 0


def test_bucket_for_non_pow2_multiple_stays_on_ladder():
    """A mesh multiple with an odd factor (6-device tile axis) must round
    the smallest adequate ladder bucket up (32 -> 36), not jump to the
    3072 lcm granule for a 17-tile bag."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.data.loader import (
        bucket_for,
    )

    assert bucket_for(17, multiple_of=6) == 36
    assert bucket_for(100, multiple_of=6) == 132  # 128 -> 132
    assert bucket_for(17, multiple_of=8) == 32    # divisible: unchanged
    assert bucket_for(17) == 32


# ------------------------------------------------------- WSI containers
def test_multipage_pyramidal_tiff_reads_largest_plane(tmp_path):
    """A real multi-page pyramidal TIFF container (full-res plane NOT on
    page 0, as in downsample-first exports) must yield the largest plane
    from read_slide, and RoiBuilder.build on the container must produce
    the exact cache the equivalent raw array produces (reference picks
    the largest series, assumed 40x: RoiBuilder.py:139-147)."""
    rng = np.random.default_rng(3)
    base = np.array([140, 60, 170], np.int16)
    full = np.clip(base + rng.integers(-40, 40, (256, 256, 3)), 0,
                   255).astype(np.uint8)
    # pyramid levels: 2x and 4x downsamples of the full-res plane
    half = full[::2, ::2]
    quarter = full[::4, ::4]
    tif_path = str(tmp_path / "pyramid.tif")
    Image.fromarray(half).save(
        tif_path, save_all=True,
        append_images=[Image.fromarray(full), Image.fromarray(quarter)])

    plane = slide_io.read_slide(tif_path)
    np.testing.assert_array_equal(plane, full)  # largest, not page 0

    # container and raw array must build identical tile caches
    cache_a = tmp_path / "cache_tif"
    cache_b = tmp_path / "cache_npy"
    cache_a.mkdir()
    cache_b.mkdir()
    npy_path = str(tmp_path / "pyramid_equiv.npy")
    np.save(npy_path, full)
    os.environ["CACHE_DIR"] = str(cache_a)
    ba = roibuilder.RoiBuilder(tif_path, {"roi_size": 64})
    ba.build()
    os.environ["CACHE_DIR"] = str(cache_b)
    bb = roibuilder.RoiBuilder(npy_path, {"roi_size": 64})
    bb.build()
    assert ba.getsize() == bb.getsize() > 0
    np.testing.assert_array_equal(
        np.load(ba.params["data_cache"]), np.load(bb.params["data_cache"]))
    np.testing.assert_array_equal(
        np.load(ba.params["coor_cache"]), np.load(bb.params["coor_cache"]))


class _FakeSeries:
    def __init__(self, arr):
        self._arr = arr
        self.shape = arr.shape

    def asarray(self):
        return self._arr


class _FakeTiffModule:
    """Structural stand-in for tifffile (absent in this image): a
    TiffFile context exposing .series, recording handle closure."""

    def __init__(self, series):
        mod = self

        class TiffFile:
            closed = False

            def __init__(self, path):
                self.series = mod.series

            def __enter__(self):
                return self

            def __exit__(self, *exc):
                type(self).closed = True
                return False

        self.series = series
        self.TiffFile = TiffFile


def test_read_tifffile_selects_largest_series_and_closes(monkeypatch):
    """_read_tifffile must pick the series with the most pixels (not the
    first) and release the container handle (a cohort sweep must not
    leak an fd per slide); 2-D grayscale planes come back 3-channel."""
    rng = np.random.default_rng(4)
    small = rng.integers(0, 255, (32, 32, 3), np.uint8)
    big_gray = rng.integers(0, 255, (128, 128), np.uint8)  # most pixels? no
    big = rng.integers(0, 255, (96, 96, 3), np.uint8)
    # sizes: small 3072, big_gray 16384, big 27648 -> big wins
    fake = _FakeTiffModule(
        [_FakeSeries(small), _FakeSeries(big_gray), _FakeSeries(big)])
    monkeypatch.setattr(slide_io, "_tifffile", fake)
    out = slide_io.read_slide("whatever.scn")
    np.testing.assert_array_equal(out, big)
    assert fake.TiffFile.closed

    # grayscale winner: promoted to HWC 3-channel
    fake2 = _FakeTiffModule([_FakeSeries(small), _FakeSeries(big_gray)])
    monkeypatch.setattr(slide_io, "_tifffile", fake2)
    out2 = slide_io.read_slide("whatever.scn")
    assert out2.shape == (128, 128, 3)
    np.testing.assert_array_equal(out2[..., 0], big_gray)


def test_real_tifffile_subifd_container(tmp_path):
    """When tifffile IS available (not in this CI image — importorskip),
    exercise _read_tifffile on an actual pyramidal container written with
    subifds, the format real .scn/.svs exports use."""
    tifffile = pytest.importorskip("tifffile")
    rng = np.random.default_rng(5)
    full = rng.integers(0, 255, (256, 256, 3), np.uint8)
    path = str(tmp_path / "real_pyramid.tif")
    with tifffile.TiffWriter(path) as tw:
        tw.write(full, subifds=2, tile=(64, 64))
        tw.write(full[::2, ::2], subfiletype=1, tile=(64, 64))
        tw.write(full[::4, ::4], subfiletype=1, tile=(64, 64))
    out = slide_io._read_tifffile(path)
    np.testing.assert_array_equal(out, full)


def test_read_pil_multiframe_largest_selection(tmp_path, monkeypatch):
    """_read_pil must pick the LARGEST frame of a multi-page TIFF, not
    frame 0 (largest-series semantics, reference: RoiBuilder.py:139-147).
    PIL is installed everywhere, so this real-container path executes in
    CI even on hosts without tifffile."""
    rng = np.random.default_rng(6)
    small = rng.integers(0, 255, (32, 48, 3), np.uint8)
    big = rng.integers(0, 255, (96, 128, 3), np.uint8)
    mid = rng.integers(0, 255, (64, 64, 3), np.uint8)
    path = str(tmp_path / "multi.tif")
    Image.fromarray(small).save(
        path, save_all=True,
        append_images=[Image.fromarray(big), Image.fromarray(mid)])
    out = slide_io._read_pil(path)
    np.testing.assert_array_equal(out, big)
    # through the public entry with neither tifffile nor openslide
    monkeypatch.setattr(slide_io, "_tifffile", None)
    monkeypatch.setattr(slide_io, "_openslide", None)
    np.testing.assert_array_equal(slide_io.read_slide(path), big)
    # single-frame containers keep working through the same path
    single = str(tmp_path / "single.tif")
    Image.fromarray(mid).save(single)
    np.testing.assert_array_equal(slide_io.read_slide(single), mid)


def test_roibuilder_container_build_equals_npy_build(tmp_path, cache_dir,
                                                     monkeypatch):
    """RoiBuilder.build from a real multi-page TIFF container must emit a
    tile cache IDENTICAL to building from the equivalent .npy dump: the
    reader is the only difference, and the pyramid's smaller levels must
    not leak into the raster scan (reference: RoiBuilder.py:139-167)."""
    monkeypatch.setattr(slide_io, "_tifffile", None)  # exercise PIL path
    monkeypatch.setattr(slide_io, "_openslide", None)
    rng = np.random.default_rng(7)
    slide = _synthetic_slide(rng, size=256)
    pyramid = [slide, slide[::2, ::2], slide[::4, ::4]]

    tif_path = str(tmp_path / "GHP_9_A_HE.tif")
    # full plane deliberately NOT first: largest-frame selection matters
    Image.fromarray(pyramid[1]).save(
        tif_path, save_all=True,
        append_images=[Image.fromarray(pyramid[0]),
                       Image.fromarray(pyramid[2])])
    npy_path = str(tmp_path / "GHP_9_A_HE_npy.npy")
    np.save(npy_path, slide)

    bt = roibuilder.RoiBuilder(tif_path, {"roi_size": 64})
    bn = roibuilder.RoiBuilder(npy_path, {"roi_size": 64})
    assert bt.build() and bn.build()
    assert bt.getsize() == bn.getsize() > 0
    np.testing.assert_array_equal(np.load(bt.params["data_cache"]),
                                  np.load(bn.params["data_cache"]))
    np.testing.assert_array_equal(np.load(bt.params["coor_cache"]),
                                  np.load(bn.params["coor_cache"]))


class _FakeOpenSlideModule:
    class OpenSlideError(Exception):
        pass

    def __init__(self, ok_paths):
        mod = self

        class OpenSlide:
            closes = 0

            def __init__(self, path):
                if path not in mod._ok:
                    raise mod.OpenSlideError(path)

            def close(self):
                type(self).closes += 1

        self._ok = set(ok_paths)
        self.OpenSlide = OpenSlide


def test_openslide_probe_positive_and_negative(monkeypatch):
    """The caMicroscope eligibility probe (reference: RoiBuilder.py:76-84)
    must return True only when openslide opens the file, close the handle
    it opened, and degrade to False when the library is absent."""
    fake = _FakeOpenSlideModule(["/slides/good.svs"])
    monkeypatch.setattr(slide_io, "_openslide", fake)
    assert slide_io.openslide_eligible("/slides/good.svs")
    assert fake.OpenSlide.closes == 1
    assert not slide_io.openslide_eligible("/slides/bad.png")
    monkeypatch.setattr(slide_io, "_openslide", None)
    assert not slide_io.openslide_eligible("/slides/good.svs")
