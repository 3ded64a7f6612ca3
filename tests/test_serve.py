"""Serving daemon (train/serve.py): watch-folder + manifest modes,
idempotent restarts, incremental pickup, and the int8 serving path.

All slides route through classify_slide_streaming (exact for any bag
size), so results must match the interface-mode forward numerics already
pinned in test_pallas_and_inference.py — here we assert the service
semantics: artifacts, durability, no double-processing.
"""

import os

import numpy as np
import pytest


@pytest.fixture
def slide_tree(tmp_path, monkeypatch):
    """Synthetic slides + prebuilt roi_size=32 caches (no labels needed —
    serving is label-free)."""
    cache = tmp_path / "cache"
    cache.mkdir()
    monkeypatch.setenv("CACHE_DIR", str(cache))
    slides = tmp_path / "slides"
    slides.mkdir()
    rng = np.random.default_rng(3)

    def add_slide(name, ntiles=24):
        path = slides / name
        path.write_bytes(b"fake")
        base = name.split(".")[0]
        tiles = np.clip(
            np.array([140, 60, 170], np.int16)
            + rng.integers(-40, 40, (ntiles, 32, 32, 3)),
            0, 255).astype(np.uint8)
        coords = np.stack([[i * 32, 0] for i in range(ntiles)])
        np.save(cache / f"data_{base}_rois_size32_hsvcut_v3.npy", tiles)
        np.save(cache / f"coor_{base}_rois_size32_hsvcut_v3.npy", coords)
        return path

    for i in range(1, 4):
        add_slide(f"GHP_{i}_A_H&E.scn")
    return tmp_path, add_slide


def _run(argv):
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (
        serve,
    )

    return serve.main(argv)


def _rows(out_root):
    with open(os.path.join(out_root, "results.csv")) as f:
        return [ln for ln in f.read().splitlines()[1:] if ln]


COMMON = ["--arch", "tiny", "--resolution", "16", "--roi_size", "32",
          "--f32", "--once", "--settle_secs", "0", "--chunk", "16"]


@pytest.mark.slow
def test_serve_watch_dir_idempotent_and_incremental(slide_tree, tmp_path):
    tree, add_slide = slide_tree
    out = str(tmp_path / "serve_out")
    argv = ["--watch_dir", str(tree / "slides"), "--out_root", out] + COMMON

    assert _run(argv) == 0
    rows = _rows(out)
    assert len(rows) == 3
    # one CSV row per slide: probs sum to 1, tile counts recorded
    for ln in rows:
        parts = ln.split(",")
        assert abs(sum(float(p) for p in parts[1:4]) - 1.0) < 1e-4
        assert int(parts[6]) == 24
    dlas = [f for f in os.listdir(out) if f.endswith(".dla")]
    assert len(dlas) >= 3  # >=1 ATTN map per slide
    # every .dla line is "x y weight" over the slide raster
    with open(os.path.join(out, dlas[0])) as f:
        first = f.readline().split()
    assert len(first) == 3

    # restart with the same backlog: durable processed-set, nothing rerun
    assert _run(argv) == 0
    assert len(_rows(out)) == 3

    # a new slide arriving later is picked up incrementally
    add_slide("GHP_9_B_H&E.scn", ntiles=40)
    assert _run(argv) == 0
    rows = _rows(out)
    assert len(rows) == 4
    assert any(ln.startswith("GHP_9_B_H&E,") and ln.split(",")[6] == "40"
               for ln in rows)


@pytest.mark.slow
def test_serve_prewarm_compiles_ladder_before_first_slide(slide_tree,
                                                         tmp_path, capsys):
    tree, _ = slide_tree
    out = str(tmp_path / "serve_out")
    argv = (["--watch_dir", str(tree / "slides"), "--out_root", out,
             "--prewarm", "64"] + COMMON)
    assert _run(argv) == 0
    captured = capsys.readouterr().out
    assert "prewarm done" in captured
    # prewarm happens before any slide output
    assert captured.index("prewarm done") < captured.index("probs=")
    assert len(_rows(out)) == 3


@pytest.mark.slow
def test_serve_reconciles_missing_marker(slide_tree, tmp_path):
    """Crash between the results.csv append and the processed.txt marker:
    restart must adopt the row (all artifacts were written first) instead
    of re-classifying and duplicating it."""
    tree, _ = slide_tree
    out = str(tmp_path / "serve_out")
    argv = ["--watch_dir", str(tree / "slides"), "--out_root", out] + COMMON
    assert _run(argv) == 0
    assert len(_rows(out)) == 3

    # simulate the crash window: drop one marker, keep its results row
    marker = os.path.join(out, "processed.txt")
    names = open(marker).read().splitlines()
    with open(marker, "w") as f:
        f.write("\n".join(names[1:]) + "\n")

    assert _run(argv) == 0
    rows = _rows(out)
    assert len(rows) == 3  # no duplicate row
    assert len(set(ln.split(",")[0] for ln in rows)) == 3
    assert set(open(marker).read().split()) == set(names)  # marker healed


@pytest.mark.slow
def test_serve_int8_defers_calibration_past_empty_slide(slide_tree,
                                                        tmp_path):
    """A tile-less first slide must not calibrate the int8 scales on the
    zeros fallback (that would floor every scale and corrupt the rest);
    calibration defers to the next real slide."""
    tree, add_slide = slide_tree
    cache = tree / "cache"
    # 0-tile slide, lexically/mtime-first via the manifest order
    (tree / "slides" / "AAA_empty_H&E.scn").write_bytes(b"fake")
    np.save(cache / "data_AAA_empty_H&E_rois_size32_hsvcut_v3.npy",
            np.zeros((0, 32, 32, 3), np.uint8))
    np.save(cache / "coor_AAA_empty_H&E_rois_size32_hsvcut_v3.npy",
            np.zeros((0, 2), np.int64))
    manifest = tmp_path / "m.txt"
    manifest.write_text(
        str(tree / "slides" / "AAA_empty_H&E.scn") + "\n"
        + str(tree / "slides" / sorted(os.listdir(tree / "slides"))[1])
        + "\n")
    out = str(tmp_path / "serve_empty")
    rc = _run(["--manifest", str(manifest), "--out_root", out,
               "--int8", "--int8_calib", "16"] + COMMON)
    assert rc == 0
    rows = _rows(out)
    assert len(rows) == 2
    # the real slide's probabilities are sane (scales not floored)
    real = next(ln for ln in rows if not ln.startswith("AAA_empty"))
    probs = [float(p) for p in real.split(",")[1:4]]
    assert abs(sum(probs) - 1.0) < 1e-4
    assert max(probs) < 0.999  # zero-floored scales would saturate


@pytest.mark.slow
def test_serve_manifest_int8(slide_tree, tmp_path):
    tree, _ = slide_tree
    out = str(tmp_path / "serve_i8")
    manifest = tmp_path / "slides.txt"
    names = sorted(os.listdir(tree / "slides"))[:2]
    manifest.write_text(
        "\n".join(str(tree / "slides" / n) for n in names) + "\n")

    rc = _run(["--manifest", str(manifest), "--out_root", out,
               "--int8", "--int8_calib", "16"] + COMMON)
    assert rc == 0
    rows = _rows(out)
    assert len(rows) == 2
    for ln in rows:
        probs = [float(p) for p in ln.split(",")[1:4]]
        assert abs(sum(probs) - 1.0) < 1e-4
        assert all(np.isfinite(probs))


@pytest.mark.slow
def test_serve_crash_mid_slide_retries_cleanly(slide_tree, tmp_path,
                                               monkeypatch):
    """A failure AFTER classification but BEFORE the results row (e.g.
    the process dies writing .dla) must leave no partial bookkeeping: the
    next run redoes exactly that slide, and the CSV ends with one row per
    slide."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (
        serve,
    )
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.utils import (
        helpers,
    )

    tree, _ = slide_tree
    out = str(tmp_path / "serve_out")
    argv = ["--watch_dir", str(tree / "slides"), "--out_root", out] + COMMON

    victim = sorted(os.listdir(tree / "slides"))[1].split(".")[0]
    real_write_map = helpers.write_map

    def dying_write_map(meta, *a, **k):
        if meta["basename"] == victim:
            raise OSError("disk died mid-.dla")
        return real_write_map(meta, *a, **k)

    monkeypatch.setattr(serve.helpers, "write_map", dying_write_map)
    assert _run(argv) == 1  # the victim failed, others classified
    rows = _rows(out)
    assert len(rows) == 2
    assert victim not in {ln.split(",")[0] for ln in rows}

    monkeypatch.setattr(serve.helpers, "write_map", real_write_map)
    assert _run(argv) == 0  # retry picks up ONLY the victim
    rows = _rows(out)
    assert len(rows) == 3
    names = [ln.split(",")[0] for ln in rows]
    assert sorted(names) == sorted(set(names))  # no duplicates


@pytest.mark.slow
def test_serve_batched_matches_serial(slide_tree, tmp_path):
    """--batch N groups small slides into one batched forward; an
    over-cap slide still streams. Probabilities must match the serial
    (streaming) daemon, and every slide appears exactly once."""
    tree, add_slide = slide_tree
    add_slide("GHP_9_D_H&E.scn", ntiles=40)  # > cap below -> streams
    src = ["--watch_dir", str(tree / "slides")]
    out_s = str(tmp_path / "serial")
    out_b = str(tmp_path / "batched")
    assert _run(src + ["--out_root", out_s] + COMMON) == 0
    assert _run(src + ["--out_root", out_b, "--batch", "3",
                       "--batch_tile_cap", "30"] + COMMON) == 0

    def parse(out):
        return {ln.split(",")[0]: [float(p) for p in ln.split(",")[1:4]]
                for ln in _rows(out)}

    rs, rb = parse(out_s), parse(out_b)
    assert rs.keys() == rb.keys() and len(rs) == 4
    for name in rs:
        np.testing.assert_allclose(rs[name], rb[name], atol=1e-4)
    # batched run writes the same .dla maps per slide
    dlas_b = {f for f in os.listdir(out_b) if f.endswith(".dla")}
    dlas_s = {f for f in os.listdir(out_s) if f.endswith(".dla")}
    assert dlas_b == dlas_s

    # int8 composes with batching
    out_i = str(tmp_path / "batched_i8")
    assert _run(src + ["--out_root", out_i, "--batch", "3",
                       "--batch_tile_cap", "30", "--int8",
                       "--int8_calib", "16"] + COMMON) == 0
    ri = parse(out_i)
    assert ri.keys() == rs.keys()
    for probs in ri.values():
        assert abs(sum(probs) - 1.0) < 1e-4


@pytest.mark.slow
def test_serve_io_pipeline_matches_serial(slide_tree, tmp_path):
    """--io_depth N prepares slides on a background thread while the
    device classifies the current one. Results (rows, probabilities,
    ORDER) must match --io_depth 0 exactly, and a poison slide whose
    cache build fails must hit the same failure accounting (nonzero rc,
    no row) without killing its backlog-mates."""
    tree, _ = slide_tree
    # a slide with no prebuilt cache and unreadable bytes: _prepare's
    # builder.build() raises on the producer thread
    (tree / "slides" / "GHP_0_bad_H&E.scn").write_bytes(b"not a slide")
    src = ["--watch_dir", str(tree / "slides")]
    out0 = str(tmp_path / "depth0")
    out3 = str(tmp_path / "depth3")
    assert _run(src + ["--out_root", out0, "--io_depth", "0"] + COMMON) == 1
    assert _run(src + ["--out_root", out3, "--io_depth", "3"] + COMMON) == 1

    r0, r3 = _rows(out0), _rows(out3)
    assert len(r0) == len(r3) == 3  # poison slide has no row
    # identical slide order (prefetch preserves backlog order) and probs
    assert [ln.split(",")[0] for ln in r0] == [ln.split(",")[0]
                                               for ln in r3]
    for a, b in zip(r0, r3):
        np.testing.assert_allclose([float(p) for p in a.split(",")[1:4]],
                                   [float(p) for p in b.split(",")[1:4]],
                                   atol=1e-6)
    # pipelined prep composes with --batch routing too
    out_b = str(tmp_path / "depth2_batched")
    assert _run(src + ["--out_root", out_b, "--io_depth", "2",
                       "--batch", "2", "--batch_tile_cap", "30"]
                + COMMON) == 1
    rb = _rows(out_b)
    assert {ln.split(",")[0] for ln in rb} == {ln.split(",")[0]
                                               for ln in r0}


@pytest.mark.slow
def test_serve_bundle_matches_streaming(slide_tree, tmp_path):
    """--bundle serves the AOT export (deploy.py): same rows/probs as
    the live streaming daemon with the same (seed-0) weights, model
    builders never called in the daemon path, tile-less slides fail
    loudly instead of silently diverging from the zero-bag fallback."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu import (
        deploy,
    )

    tree, add_slide = slide_tree
    cache = tree / "cache"
    (tree / "slides" / "ZZZ_empty_H&E.scn").write_bytes(b"fake")
    np.save(cache / "data_ZZZ_empty_H&E_rois_size32_hsvcut_v3.npy",
            np.zeros((0, 32, 32, 3), np.uint8))
    np.save(cache / "coor_ZZZ_empty_H&E_rois_size32_hsvcut_v3.npy",
            np.zeros((0, 2), np.int64))
    bundle = str(tmp_path / "bundle")
    assert deploy.main(["export", "--out", bundle, "--arch", "tiny",
                        "--resolution", "16", "--roi_size", "32",
                        "--chunk", "16", "--tiles", "64", "--f32"]) == 0

    src = ["--watch_dir", str(tree / "slides")]
    out_s = str(tmp_path / "serial")
    out_b = str(tmp_path / "aot")
    # streaming daemon classifies the empty slide (zero-bag fallback);
    # bundle daemon must FAIL it (rc 1) and classify everything else
    assert _run(src + ["--out_root", out_s] + COMMON) == 0
    assert _run(src + ["--out_root", out_b, "--bundle", bundle,
                       "--prewarm", "32"] + COMMON) == 1

    def parse(out):
        return {ln.split(",")[0]: [float(p) for p in ln.split(",")[1:4]]
                for ln in _rows(out)}

    rs, rb = parse(out_s), parse(out_b)
    assert set(rs) - set(rb) == {"ZZZ_empty_H&E"}
    for name in rb:
        np.testing.assert_allclose(rb[name], rs[name], atol=1e-4)
    # same .dla artifacts for the slides both served
    dlas_b = {f for f in os.listdir(out_b) if f.endswith(".dla")}
    assert dlas_b and dlas_b <= {f for f in os.listdir(out_s)
                                 if f.endswith(".dla")}
    # incompatible recomposition flags are rejected up-front
    with pytest.raises(SystemExit):
        _run(src + ["--out_root", str(tmp_path / "x"), "--bundle", bundle,
                    "--int8"] + COMMON)


@pytest.mark.slow
def test_serve_batch_mesh_group_padding(slide_tree, tmp_path):
    """--batch 3 on an 8-device mesh (slides axis = 2): odd group sizes
    (3, and the tail of 1) must pad with zero bags instead of crashing
    device_put on the slides-axis sharding, and results match serial."""
    tree, add_slide = slide_tree
    add_slide("GHP_8_C_H&E.scn")  # 4 slides -> groups of 3 + 1
    src = ["--watch_dir", str(tree / "slides")]
    out_s = str(tmp_path / "serial")
    out_m = str(tmp_path / "mesh_batched")
    assert _run(src + ["--out_root", out_s] + COMMON) == 0
    assert _run(src + ["--out_root", out_m, "--batch", "3",
                       "--mesh", "8"] + COMMON) == 0

    def parse(out):
        return {ln.split(",")[0]: [float(p) for p in ln.split(",")[1:4]]
                for ln in _rows(out)}

    rs, rm = parse(out_s), parse(out_m)
    assert rs.keys() == rm.keys() and len(rs) == 4
    for name in rs:
        np.testing.assert_allclose(rs[name], rm[name], atol=1e-4)


@pytest.mark.slow
def test_serve_mesh_int8_matches_single_device(slide_tree, tmp_path):
    """All three serving axes compose: chunks stream in time, each
    chunk's tile axis shards over the 8-device mesh, and the per-chunk
    program is the quantized int8 forward — probabilities must match the
    single-device daemon bit-for-bit at f32 pooling tolerance."""
    tree, _ = slide_tree
    manifest = tmp_path / "slides.txt"
    names = sorted(os.listdir(tree / "slides"))[:2]
    manifest.write_text(
        "\n".join(str(tree / "slides" / n) for n in names) + "\n")

    out1 = str(tmp_path / "serve_1dev")
    out8 = str(tmp_path / "serve_8dev")
    assert _run(["--manifest", str(manifest), "--out_root", out1,
                 "--int8", "--int8_calib", "16"] + COMMON) == 0
    assert _run(["--manifest", str(manifest), "--out_root", out8,
                 "--int8", "--int8_calib", "16", "--mesh", "8"]
                + COMMON) == 0
    r1 = {ln.split(",")[0]: [float(p) for p in ln.split(",")[1:4]]
          for ln in _rows(out1)}
    r8 = {ln.split(",")[0]: [float(p) for p in ln.split(",")[1:4]]
          for ln in _rows(out8)}
    assert r1.keys() == r8.keys()
    for name in r1:
        np.testing.assert_allclose(r1[name], r8[name], atol=1e-5)


@pytest.mark.slow
def test_serve_graceful_stop_finishes_inflight_slide(slide_tree, tmp_path,
                                                     monkeypatch):
    """A stop request (the SIGTERM handler's action) must finish the
    slide in flight, record it durably, exit 0 — and leave the rest of
    the backlog for the next start, which resumes it exactly."""
    import threading

    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (
        serve,
    )

    tree, _ = slide_tree
    out = str(tmp_path / "serve_out")

    # request stop from inside the first slide's processing — the drain
    # loop must still complete that slide, then abandon the backlog
    orig = serve.SlideServer.process

    def stop_after_first(self, path, builder=None):
        ok = orig(self, path, builder=builder)
        self.request_stop()
        return ok

    monkeypatch.setattr(serve.SlideServer, "process", stop_after_first)

    argv = ["--watch_dir", str(tree / "slides"), "--out_root", out] + [
        a for a in COMMON if a != "--once"]
    args = serve.build_argparser().parse_args(argv)
    server = serve.SlideServer(args)
    # backstop: a regression that never processes a slide must fail the
    # test via this timer instead of hanging the (once-less) daemon loop
    backstop = threading.Timer(300, server.request_stop)
    backstop.start()
    try:
        rc = server.run()
    finally:
        backstop.cancel()
    assert rc == 0
    rows = _rows(out)
    assert len(rows) == 1  # in-flight slide finished and recorded
    with open(os.path.join(out, "processed.txt")) as f:
        assert len(f.read().split()) == 1

    # restart drains exactly the remaining backlog, no double-processing
    monkeypatch.setattr(serve.SlideServer, "process", orig)
    assert _run(argv + ["--once"]) == 0
    assert len(_rows(out)) == 3
