"""Metric/report plotting over the training JSON artifacts.

Rebuilds the reference's five plot entry points against the same artifact
formats (``*summary.json`` per epoch, ``*predictions.json``):

  plot_gbm_metrics        (reference: plot_gbm_metrics.py:13-81 — loss/acc/F1
                           curves; gbm/plot_coef_metrics.py:31-59 — the
                           coef_a1..3 gate-coefficient variant)
  plot_prediction_summary (reference: gbm/plot_coef_metrics.py:61-92)
  plot_roc                (reference: gbm/plot_roc.py:12-38, plot_roc.py)
  plot_layer_metrics      (reference: plot_layer_metrics.py:19-44)

Outputs land inside the run's output_dir (the reference wrote to hardcoded
Dropbox paths; reference: plot_gbm_metrics.py:80, gbm/plot_coef_metrics.py:57).
"""

import glob
import json
import os

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
from matplotlib import cm  # noqa: E402


def _load_summaries(path: str):
    files = sorted(glob.glob(os.path.join(path, "*summary.json")))
    out = []
    for file in files:
        with open(file) as f:
            out.append(json.load(f))
    return out


def plot_gbm_metrics(path: str, tag: str = "TEST", show: bool = False):
    """Training curves: losses, accuracy, per-class F1, regularizers, and
    the gate coefficients. Returns the saved figure paths."""
    summaries = _load_summaries(path)
    if not summaries:
        return []
    saved = []

    def series(key, sub=None, cls=None):
        vals = []
        for d in summaries:
            try:
                v = d[key]
                if cls is not None:
                    v = v[cls][sub] if sub else v[cls]
                vals.append(v)
            except (KeyError, TypeError):
                vals.append(np.nan)
        return vals

    plt.figure(figsize=(8, 8))
    plt.plot(series("train_loss"), "C1--", label="Train Loss")
    plt.plot(series("valid_loss"), "C1", label="Valid Loss")
    plt.plot(series("train_wsum"), "C6--", label="Train Regularization")
    plt.plot(series("valid_wsum"), "C6", label="Valid Regularization")
    plt.plot(series("train_acc", cls="accuracy"), "k--", label="Train Accuracy")
    plt.plot(series("valid_acc", cls="accuracy"), "k", label="Validation Accuracy")
    for cls, color in zip("ABC", "rgb"):
        plt.plot(series("valid_acc", "f1-score", cls), color,
                 label=f"Validation {cls} F1-Score")
        plt.plot(series("train_acc", "f1-score", cls), color + "--",
                 label=f"Train {cls} F1-Score")
    plt.ylabel("Value")
    plt.xlabel("Epoch")
    plt.legend(loc="upper left")
    fig_path = os.path.join(path, f"gbm_progress_tag{tag}.pdf")
    plt.savefig(fig_path)
    plt.close()
    saved.append(fig_path)

    # gate-coefficient curves (gbm/plot_coef_metrics.py variant)
    plt.figure(figsize=(8, 8))
    for i, color in zip((1, 2, 3), "rgb"):
        plt.plot(series(f"coef_a{i}"), color, label=f"Coefficent {i}")
    plt.ylabel("Value")
    plt.xlabel("Epoch")
    plt.legend(loc="upper left")
    coef_path = os.path.join(path, f"gbm_coef_tag{tag}.pdf")
    plt.savefig(coef_path)
    plt.close()
    saved.append(coef_path)
    return saved


def plot_prediction_summary(epoch: int, output_dir: str, preds, labels):
    """Per-slide class-probability bars; each slide's TRUE-class bar is
    green, the others red — so a tall green bar reads as a correct
    confident prediction (exact coloring of the reference,
    gbm/plot_coef_metrics.py:74-76: np.where(labels == k, 'g', 'r'))."""
    preds = np.asarray(preds)
    labels = np.asarray(labels)
    plt.figure(figsize=(24, 4))
    bar_width = 0.2
    r1 = np.arange(preds.shape[0])
    for k, label_name in enumerate(["Pred A", "Pred B", "Pred C"]):
        colors = np.where(labels == k, "g", "r")
        plt.bar(r1 + k * bar_width, preds[:, k], color=colors,
                width=bar_width, edgecolor="white",
                label=f"{label_name} (r/g correct)")
    plt.legend()
    path = os.path.join(output_dir,
                        f"validation_performance-{epoch:03d}.pdf")
    plt.savefig(path)
    plt.close()
    return path


def save_predictions(output_dir: str, epoch: int, predictions, labels):
    """Write ``<epoch>predictions.json`` — the plot_roc input artifact
    (globbed at gbm/plot_roc.py:14)."""
    path = os.path.join(output_dir, f"{epoch:04d}predictions.json")
    with open(path, "w") as f:
        json.dump({"predictions": [float(p) for p in predictions],
                   "labels": [float(l) for l in labels]}, f)
    return path


def plot_roc(path: str, tag: str = "TEST", show: bool = False,
             describe: bool = False):
    """ROC curves + AUC trajectory over ``*predictions.json`` artifacts
    (reference: gbm/plot_roc.py:12-38)."""
    from sklearn import metrics

    files = sorted(glob.glob(os.path.join(path, "*predictions.json")))
    if not files:
        return [], []  # same 2-tuple shape as the non-empty return
    cmap_lin = cm.rainbow(np.linspace(0, 1, len(files)))
    aucs = []
    plt.figure(figsize=(8, 8))
    for i, file in enumerate(files):
        with open(file) as f:
            d = json.load(f)
        fpr, tpr, _ = metrics.roc_curve(d["labels"], d["predictions"])
        roc_auc = metrics.auc(fpr, tpr)
        plt.plot(fpr, tpr, color=cmap_lin[i], label="AUC = %0.2f" % roc_auc)
        aucs.append(roc_auc)
    plt.legend(loc="lower right")
    plt.plot([0, 1], [0, 1], "r--")
    plt.xlim([0, 1])
    plt.ylim([0, 1])
    plt.ylabel("True Positive Rate")
    plt.xlabel("False Positive Rate")
    roc_path = os.path.join(path, f"roc_tag{tag}.pdf")
    plt.savefig(roc_path)
    plt.close()

    plt.figure()
    plt.plot(aucs)
    auc_path = os.path.join(path, f"auc_tag{tag}.pdf")
    plt.savefig(auc_path)
    plt.close()
    return [roc_path, auc_path], aucs


def plot_layer_metrics(path: str, tag: str = "TEST"):
    """Per-layer max-|w| trajectories from the summary JSONs
    (reference: plot_layer_metrics.py:19-44)."""
    summaries = _load_summaries(path)
    if not summaries or "model_max_weights" not in summaries[0]:
        return None
    results = {k: [] for k in summaries[0]["model_max_weights"]
               if "b" != k.rsplit("/", 1)[-1]}
    for d in summaries:
        for k in results:
            results[k].append(d.get("model_max_weights", {}).get(k, np.nan))
    colors = iter(cm.rainbow(np.linspace(0, 1, len(results))))
    plt.figure(figsize=(8, 8))
    for k, vals in results.items():
        plt.plot(vals, c=next(colors), label=k)
    plt.ylabel("Value")
    plt.xlabel("Epoch")
    plt.legend(loc="best", fontsize=5)
    fig_path = os.path.join(path, f"gbm_layer_progress_tag{tag}.pdf")
    plt.savefig(fig_path)
    plt.close()
    return fig_path


def main(argv=None):
    """CLI: regenerate all plots for a run directory (the reference ships
    plot_gbm_metrics.py / plot_roc.py / plot_layer_metrics.py as scripts)."""
    import argparse

    ap = argparse.ArgumentParser(description="Plot training artifacts")
    ap.add_argument("path", help="run directory with *summary.json")
    ap.add_argument("--tag", default="TEST")
    args = ap.parse_args(argv)
    print("metrics:", plot_gbm_metrics(args.path, args.tag))
    roc = plot_roc(args.path, args.tag)
    if roc:
        print("roc:", roc[0])
    layers = plot_layer_metrics(args.path, args.tag)
    if layers:
        print("layers:", layers)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
