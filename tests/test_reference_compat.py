"""Compatibility contract, proven against the reference's OWN tooling.

ARCHITECTURE.md promises that a reference user's plot/eval scripts run
unchanged on a run directory our driver produces. These tests import the
reference's actual, unmodified plot scripts —

  /root/reference/plot_gbm_metrics.py      (root metric curves)
  /root/reference/gbm/plot_roc.py          (ROC/AUC over *predictions.json)
  /root/reference/gbm/plot_coef_metrics.py (gate coefficients + pred bars)
  /root/reference/plot_layer_metrics.py    (model_max_weights trajectories)

— and execute them on a run dir produced by ``train/classify.py``. All
four are torch-free (json/glob/numpy/sklearn/pandas/matplotlib only), so
this runs on a CPU-only host. The only scaffolding applied is test-side:
``plt.savefig`` is redirected when a script targets a hardcoded absolute
directory that does not exist on this machine (the author's Dropbox,
e.g. plot_gbm_metrics.py:80), and ``plt.show`` is a no-op under Agg.
The scripts' code is never modified.

Skipped when the reference tree is absent (REFERENCE_DIR env var,
default /root/reference).
"""

import csv
import glob
import importlib.util
import json
import os
import runpy
import sys

import numpy as np
import pytest

REFERENCE_DIR = os.environ.get("REFERENCE_DIR", "/root/reference")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REFERENCE_DIR),
                       reason="reference tree not mounted"),
]


def _load_reference_module(relpath: str, name: str):
    """Import a reference script file as a module, unmodified."""
    path = os.path.join(REFERENCE_DIR, relpath)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    """A real run directory: 6 epochs of the live CLI driver on a tiny
    synthetic cohort with BINARY labels (A/B only) so the reference's
    ``roc_curve(labels, predictions)`` call is well-posed — the
    reference's own ROC scripts come from its binary-label era
    (plot_roc.py:12 points at a 2019 two-class run).

    Validation + savestats fire at epochs 0 and 5 (the reference's
    every-5-epochs cadence), so the run dir holds two ``*summary.json``
    and two ``*predictions.json`` artifacts.
    """
    mp = pytest.MonkeyPatch()
    try:
        yield from _build_run_dir(mp, tmp_path_factory)
    finally:
        # if setup or the rc/summary assertions fail, the CACHE_DIR env
        # and RoiBuilder patch must still be undone or they leak into
        # every later test in the session
        mp.undo()


def _build_run_dir(mp, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("refcompat")
    cache = tmp / "cache"
    cache.mkdir()
    mp.setenv("CACHE_DIR", str(cache))
    img_dir = tmp / "slides"
    img_dir.mkdir()
    rng = np.random.default_rng(11)

    # 12 slides alternating A/B: fold 0 of a contiguous 6-fold split
    # holds one slide of each class, keeping ROC well-defined
    designations = [(i, "A" if i % 2 else "B") for i in range(1, 13)]
    sheet = tmp / "clusters.csv"
    with open(sheet, "w", newline="") as f:
        csv.writer(f).writerows(
            [["id", ""], ["hdr", "Actual Cluster Designation"]]
            + [[f"GHP_{i}_{c}", c] for i, c in designations])

    def tissue_tile(shape=(32, 32, 3)):
        base = np.array([140, 60, 170], np.int16)
        return np.clip(base + rng.integers(-40, 40, shape),
                       0, 255).astype(np.uint8)

    for i, c in designations:
        name = f"GHP_{i}_{c}_H&E.scn"
        (img_dir / name).write_bytes(b"fake")
        base = name.split(".")[0]
        tiles = np.stack([tissue_tile() for _ in range(24)])
        coords = np.stack([[k * 32, 0] for k in range(24)])
        np.save(cache / f"data_{base}_rois_size32_hsvcut_v3.npy", tiles)
        np.save(cache / f"coor_{base}_rois_size32_hsvcut_v3.npy", coords)

    import deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.data.dataset as dmod
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (
        classify,
    )

    orig_rb = dmod.RoiBuilder

    def rb32(file, params):
        params = dict(params)
        params["roi_size"] = 32
        return orig_rb(file, params)

    mp.setattr(dmod, "RoiBuilder", rb32)

    out_root = tmp / "runs"
    out_root.mkdir()
    rc = classify.main([
        "--tag", "REFCOMPAT", "--arch", "tiny", "--resolution", "16",
        "--epoch_start", "0", "--epoch_end", "5", "--accum", "2",
        "--data_root", str(tmp), "--image_dir", "slides",
        "--label_sheet", str(sheet),
        "--output_root", str(out_root), "--f32",
        "--seed", "1",  # seed 1's KFold draw puts one slide of EACH class
        # in fold 0, so roc_curve sees both a positive and a negative
    ])
    assert rc == 0
    run = out_root / "run_REFCOMPAT"
    assert sorted(run.glob("*summary.json")), "driver produced no summaries"
    yield run


@pytest.fixture
def fig_redirect(tmp_path, monkeypatch):
    """Redirect savefig calls whose target directory does not exist on
    this host (the reference hardcodes the author's Dropbox) into a tmp
    dir; chdir there so CWD-relative saves land in the same place."""
    import matplotlib.pyplot as plt

    figdir = tmp_path / "figs"
    figdir.mkdir()
    saved = []
    real_savefig = plt.savefig

    def redirected(fname, *args, **kwargs):
        p = str(fname)
        d = os.path.dirname(p)
        if d and not os.path.isdir(d):
            p = os.path.join(str(figdir), os.path.basename(p))
        saved.append(p)
        return real_savefig(p, *args, **kwargs)

    monkeypatch.setattr(plt, "savefig", redirected)
    monkeypatch.setattr(plt, "show", lambda *a, **k: None)
    monkeypatch.chdir(figdir)
    return figdir, saved


def test_reference_plot_gbm_metrics_runs_unchanged(run_dir, fig_redirect):
    """/root/reference/plot_gbm_metrics.py:13-81 — reads train/valid loss,
    acc, per-class f1, wsum/sum/temp keys from every *summary.json."""
    figdir, saved = fig_redirect
    mod = _load_reference_module("plot_gbm_metrics.py", "ref_plot_gbm_metrics")
    mod.plot_gbm_metrics(str(run_dir) + "/")
    assert (figdir / "gbm_progress.pdf").exists()


def test_reference_plot_roc_runs_unchanged(run_dir, fig_redirect):
    """/root/reference/gbm/plot_roc.py:12-38 — roc_curve + auc over every
    *predictions.json {predictions, labels} artifact."""
    figdir, saved = fig_redirect
    mod = _load_reference_module("gbm/plot_roc.py", "ref_gbm_plot_roc")
    mod.plot_roc(str(run_dir))
    assert (figdir / "roc_test.pdf").exists()
    assert (figdir / "auc_test.pdf").exists()
    # sanity: the artifacts it consumed were really produced by our driver
    preds = sorted(glob.glob(os.path.join(str(run_dir),
                                          "*predictions.json")))
    assert len(preds) == 2  # validation at epochs 0 and 5
    with open(preds[0]) as f:
        d = json.load(f)
    assert set(d) == {"predictions", "labels"}
    # the ROC must be well-posed, not a degenerate single-class curve
    assert {0.0, 1.0} <= set(d["labels"])


def test_reference_plot_coef_metrics_runs_unchanged(run_dir, fig_redirect):
    """/root/reference/gbm/plot_coef_metrics.py:31-92 — coef_a1..3 curves
    plus the per-slide prediction-bar summary."""
    figdir, saved = fig_redirect
    mod = _load_reference_module("gbm/plot_coef_metrics.py",
                                 "ref_plot_coef_metrics")
    mod.plot_gbm_metrics(str(run_dir), tag="REFCOMPAT")
    assert (figdir / "gbm_coef_tagREFCOMPAT.pdf").exists()

    with open(sorted(run_dir.glob("*predictions.json"))[-1]) as f:
        d = json.load(f)
    labels = np.asarray(d["labels"], np.int64)
    # the reference calls this with [N,3] per-class probabilities
    # (classify_combined.py:351); one-hot of the driver's hard
    # predictions exercises the same shape contract
    probs = np.eye(3)[np.asarray(d["predictions"], np.int64)]
    mod.plot_prediction_summary(5, str(run_dir), probs, labels)
    assert (figdir / "validation_performance-005.pdf").exists()


def test_reference_plot_layer_metrics_runs_unchanged(run_dir, fig_redirect,
                                                     monkeypatch):
    """/root/reference/plot_layer_metrics.py:13-44 — module-level script:
    reads model_max_weights from every summary, plots trajectories."""
    figdir, saved = fig_redirect
    script = os.path.join(REFERENCE_DIR, "plot_layer_metrics.py")
    monkeypatch.setattr(sys, "argv", [script, str(run_dir) + "/"])
    runpy.run_path(script, run_name="not_main")
    assert (figdir / "gbm_layer_progress.pdf").exists()


def test_summary_schema_carries_every_key_the_scripts_read(run_dir):
    """Belt-and-braces: enumerate the exact keys the four scripts index
    so a schema regression names the missing key directly instead of
    failing deep inside matplotlib."""
    with open(sorted(run_dir.glob("*summary.json"))[0]) as f:
        s = json.load(f)
    for key in ("train_loss", "valid_loss", "train_wsum", "valid_wsum",
                "train_sum", "model_temp", "coef_a1", "coef_a2", "coef_a3",
                "model_max_weights"):
        assert key in s, key
    for split in ("train_acc", "valid_acc"):
        assert "accuracy" in s[split], split
        for cls in ("A", "B", "C"):
            assert "f1-score" in s[split][cls], (split, cls)
