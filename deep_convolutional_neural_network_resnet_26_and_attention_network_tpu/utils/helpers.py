"""Driver helper surface — the reconstruction of the reference's missing
``PyTorchHelpers`` module (imported at gbm/classify_combined.py:31 and
gbm/model.py:7 but absent from the repo; interface reconstructed from call
sites, see SURVEY.md §2.4). Provides:

  savestats, get_layer_weight_summary_mean/max, named_parameters,
  prime_activation_summary (-> activation_summary), prime_activation_vis
  (-> activation_grids) + plot_activations, plot_kernels, write_map,
  plot_grad_flow, model_summary, RandomCrop2X, sample_data (re-export).

Hook-based capture becomes explicit intermediate returns (resnet taps);
everything else is pure numpy/matplotlib over host copies.
"""

import json
import os

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from ..data.loader import sample_data  # noqa: F401 (public re-export)
from ..models import resnet

# ---------------------------------------------------------------- stats


def savestats(args, output_dir: str, epoch: int, epoch_stats: dict) -> str:
    """Persist the per-epoch stats dict as ``<epoch>summary.json`` — the
    artifact consumed by plot_gbm_metrics/plot_layer_metrics (call site:
    gbm/classify_combined.py:570; globbed as '*summary.json')."""
    path = os.path.join(output_dir, f"{epoch:04d}summary.json")
    payload = dict(epoch_stats)
    payload["epoch"] = epoch
    if args is not None:
        payload["args"] = {k: v for k, v in vars(args).items()
                           if isinstance(v, (str, int, float, bool, type(None)))}
    with open(path, "w") as f:
        json.dump(payload, f, indent=2, sort_keys=True, default=float)
    return path


def named_parameters(params, prefix=""):
    """Yield ('/'-joined name, numpy array) like torch named_parameters.

    Delegates to the checkpoint flattener so summary/plot layer names stay
    identical to checkpoint keys (the transfer filter matches on them).
    """
    from ..train.checkpoint import _flatten

    for name, value in _flatten(params, prefix).items():
        yield name, value


def get_layer_weight_summary_mean(params) -> dict:
    """Per-layer mean |w| (call site: gbm/classify_combined.py:484)."""
    return {name: float(np.abs(w).mean())
            for name, w in named_parameters(params)}


def get_layer_weight_summary_max(params) -> dict:
    """Per-layer max |w| (call site: gbm/classify_combined.py:485)."""
    return {name: float(np.abs(w).max())
            for name, w in named_parameters(params)}


# ----------------------------------------------------------- activations


def activation_summary(cnn_params, tiles, *, compute_dtype=None,
                       acts=None) -> dict:
    """Layer -> activation stats for a stack of tiles: the explicit-return
    replacement for prime_activation_summary's forward hooks. ``acts``
    reuses a previous forward's taps dict (see activation_grids)."""
    if acts is None:
        _, acts = resnet.apply_resnet26(cnn_params, tiles,
                                        compute_dtype=compute_dtype,
                                        taps=True)
    out = {}
    for name, a in acts.items():
        a = np.asarray(a, np.float32)
        out[name] = {
            "shape": list(a.shape),
            "mean": float(a.mean()),
            "std": float(a.std()),
            "min": float(a.min()),
            "max": float(a.max()),
            "frac_nonzero": float((a != 0).mean()),
        }
    return out


def activation_grids(cnn_params, tiles, *, compute_dtype=None,
                     acts=None) -> dict:
    """Layer -> [C, h, w] mean-over-batch feature maps (prime_activation_vis
    equivalent); feed to plot_activations. Pass ``acts`` (the taps dict
    from a previous forward) to avoid re-running the extractor when
    activation_summary already ran on the same tiles."""
    if acts is None:
        _, acts = resnet.apply_resnet26(cnn_params, tiles,
                                        compute_dtype=compute_dtype,
                                        taps=True)
    grids = {}
    for name, a in acts.items():
        a = np.asarray(a, np.float32)
        if a.ndim == 4:  # [N, H, W, C] -> [C, H, W]
            grids[name] = a.mean(axis=0).transpose(2, 0, 1)
    return grids


def plot_activations(grid, path=None, max_channels: int = 16):
    """Render a [C, H, W] activation grid (plot_activations call site:
    gbm/classify_combined.py:381)."""
    c = min(grid.shape[0], max_channels)
    cols = int(np.ceil(np.sqrt(c)))
    rows = int(np.ceil(c / cols))
    fig, axes = plt.subplots(rows, cols, figsize=(2 * cols, 2 * rows))
    axes = np.atleast_1d(axes).ravel()
    for i in range(c):
        axes[i].imshow(grid[i], cmap="viridis")
        axes[i].axis("off")
    for ax in axes[c:]:
        ax.axis("off")
    plt.tight_layout()
    if path:
        plt.savefig(path)
    plt.close(fig)
    return path


def plot_kernels(params, epoch: int, step, *, output_dir: str = ".",
                 max_kernels: int = 20):
    """First-layer conv kernel grid (call site: gbm/classify_combined.py:541)."""
    for name, w in named_parameters(params):
        if w.ndim == 4:  # HWIO conv kernel
            k = w.transpose(3, 0, 1, 2)  # [O, H, W, I]
            n = min(k.shape[0], max_kernels)
            cols = int(np.ceil(np.sqrt(n)))
            rows = int(np.ceil(n / cols))
            fig, axes = plt.subplots(rows, cols, figsize=(2 * cols, 2 * rows))
            axes = np.atleast_1d(axes).ravel()
            for i in range(n):
                img = k[i, :, :, :3] if k.shape[-1] >= 3 else k[i, :, :, 0]
                lo, hi = img.min(), img.max()
                axes[i].imshow((img - lo) / (hi - lo + 1e-9))
                axes[i].axis("off")
            for ax in axes[n:]:
                ax.axis("off")
            path = os.path.join(
                output_dir,
                f"kernels-{name.replace('/', '.')}-ep{epoch:03d}.png")
            plt.tight_layout()
            plt.savefig(path)
            plt.close(fig)
            return path  # reference plots the stem kernels; first conv wins
    return None


def plot_layer_summary(params, path=None):
    """Per-layer weight mean/max bar chart (plot_layer_summary call site:
    gbm/classify.py:324)."""
    names, means, maxes = [], [], []
    for name, w in named_parameters(params):
        names.append(name)
        means.append(float(np.abs(w).mean()))
        maxes.append(float(np.abs(w).max()))
    fig = plt.figure(figsize=(max(6, len(names) * 0.4), 4))
    xs = np.arange(len(names))
    plt.bar(xs - 0.2, means, width=0.4, label="mean |w|")
    plt.bar(xs + 0.2, maxes, width=0.4, label="max |w|")
    plt.xticks(xs, names, rotation=90, fontsize=5)
    plt.legend()
    plt.tight_layout()
    if path:
        plt.savefig(path)
    plt.close(fig)
    return dict(zip(names, zip(means, maxes)))


def plot_attn_flow(attention_weights, path=None):
    """Per-map attention-weight distributions over tiles (plot_attn_flow
    call site: gbm/classify.py:325). attention_weights: [K, T]."""
    a = np.asarray(attention_weights)
    fig, axes = plt.subplots(1, a.shape[0], figsize=(4 * a.shape[0], 3))
    for k, ax in enumerate(np.atleast_1d(axes)):
        ax.hist(a[k], bins=40)
        ax.set_title(f"map {k}")
        ax.set_xlabel("attention weight")
    plt.tight_layout()
    if path:
        plt.savefig(path)
    plt.close(fig)
    return path


def plot_bag_flow(bag_sizes, losses=None, path=None):
    """Bag-size (tiles/slide) trajectory with optional loss overlay
    (plot_bag_flow call site: gbm/classify.py:327)."""
    fig, ax1 = plt.subplots(figsize=(8, 3))
    ax1.plot(bag_sizes, "C0")
    ax1.set_ylabel("tiles/bag", color="C0")
    ax1.set_xlabel("step")
    if losses is not None:
        ax2 = ax1.twinx()
        ax2.plot(losses, "C1")
        ax2.set_ylabel("loss", color="C1")
    plt.tight_layout()
    if path:
        plt.savefig(path)
    plt.close(fig)
    return path


def plot_grad_flow(grads, path=None):
    """Mean |grad| per layer bar chart (plot_grad_flow call site:
    gbm/classify.py:326)."""
    names, means = [], []
    for name, g in named_parameters(grads):
        names.append(name)
        means.append(float(np.abs(g).mean()))
    fig = plt.figure(figsize=(max(6, len(names) * 0.4), 4))
    plt.bar(range(len(means)), means)
    plt.xticks(range(len(names)), names, rotation=90, fontsize=5)
    plt.ylabel("mean |grad|")
    plt.tight_layout()
    if path:
        plt.savefig(path)
    plt.close(fig)
    return means


# -------------------------------------------------------------- heatmaps


def _minmax_normalize(x):
    x = np.asarray(x, np.float64)
    if x.size == 0:  # degenerate slide: empty raster -> empty .dla,
        return x     # not a zero-size-reduction crash mid-sweep
    lo, hi = x.min(), x.max()
    return (x - lo) / (hi - lo) if hi > lo else np.zeros_like(x)


def write_map(meta: dict, epoch: int, raster, attn, manifest=None,
              output_dir: str = "."):
    """Emit per-tile heatmap annotations as ``.dla`` text files.

    Format (one line per tile): ``x y weight`` with x=col, y=row — the
    caMicroscope annotation export (reference: gbm/classify.py:207-225;
    interface-mode call site: gbm/classify_combined.py:289). attn: [K, T]
    attention maps; map 0 is written as ATTN (min-max normalized) and each
    map k as ACTF<k+1>. Appends a manifest row when a file handle is given.
    """
    name = meta["basename"]
    attn = np.asarray(attn)
    if attn.ndim == 1:
        attn = attn[None, :]
    files = []
    norm = _minmax_normalize(attn[0])
    path = os.path.join(output_dir, f"prediction-AGMIL-ATTN.{name}.dla")
    with open(path, "w") as f:
        for i, coord in enumerate(raster):
            f.write(f"{coord[1]} {coord[0]} {norm[i]}\n")
    files.append(path)
    for k in range(attn.shape[0]):
        path = os.path.join(output_dir,
                            f"prediction-AGMIL-ACTF{k + 1}.{name}.dla")
        with open(path, "w") as f:
            for i, coord in enumerate(raster):
                f.write(f"{coord[1]} {coord[0]} {attn[k, i]}\n")
        files.append(path)
    if manifest is not None:
        manifest.write("{0},{1},{2},{3}\n".format(
            files[0], meta.get("caMIC_study", meta.get("studyid", "na")),
            meta.get("caMIC_id_name", name), meta.get("caMIC_id_name", name)))
    return files


# ----------------------------------------------------------------- misc


def model_summary(params, header: str = "AttentionMIL") -> str:
    """Structure dump string (model_structure.txt, call site:
    gbm/classify_combined.py:546-549)."""
    lines = [header]
    total = 0
    for name, w in named_parameters(params):
        lines.append(f"  {name:60s} {str(w.shape):20s} {w.size}")
        total += w.size
    lines.append(f"  total parameters: {total}")
    return "\n".join(lines)


class RandomCrop2X:
    """Identical random crop applied to two paired images
    (PyTorchHelpers.RandomCrop2X call sites: Datasets.py:171,242,331).

    Execute(imgA, imgB) -> (cropA, cropB, (row, col)). Images are HWC
    numpy arrays; pad_if_needed zero-pads smaller inputs like torchvision.
    """

    def __init__(self, size: int, pad_if_needed: bool = True, seed=None):
        self.size = size
        self.pad_if_needed = pad_if_needed
        self._rng = np.random.default_rng(seed)

    def _pad(self, img):
        h, w = img.shape[:2]
        ph, pw = max(0, self.size - h), max(0, self.size - w)
        if ph or pw:
            pad = [(0, ph), (0, pw)] + [(0, 0)] * (img.ndim - 2)
            img = np.pad(img, pad)
        return img

    def Execute(self, img_a, img_b):
        if self.pad_if_needed:
            img_a, img_b = self._pad(img_a), self._pad(img_b)
        h, w = img_a.shape[:2]
        r = int(self._rng.integers(0, h - self.size + 1))
        c = int(self._rng.integers(0, w - self.size + 1))
        crop_a = img_a[r:r + self.size, c:c + self.size]
        crop_b = img_b[r:r + self.size, c:c + self.size]
        return crop_a, crop_b, (r, c)
