"""Attention heatmap panel rendering.

Rebuilds the reference's ``visualize``/``create_map`` figure (reference:
gbm/classify_combined.py:142-218): a 2x3 panel with (0,0) the tissue mosaic
under the mean-attention overlay, (1,0..2) the three per-map attention
overlays as colored rectangles at tile raster coordinates, (0,1) the
per-tile feature embedding strips, and (0,2) the slide-embedding vector
with the inter-class-vector angle in the title. Output paths land in the
run directory instead of the reference's hardcoded Dropbox folder
(reference: gbm/classify_combined.py:217).
"""

import os

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
from matplotlib import cm  # noqa: E402


def embedding_angle(M: np.ndarray) -> float:
    """Mean pairwise angle (degrees) between slide-embedding vectors
    (reference: gbm/classify_combined.py:157-161)."""
    M = np.asarray(M, np.float64)
    angles = []
    for i in range(M.shape[0]):
        for j in range(i + 1, M.shape[0]):
            v1, v2 = M[i], M[j]
            cosine = v1.dot(v2) / (np.linalg.norm(v1) * np.linalg.norm(v2) + 1e-5)
            angles.append(np.arccos(np.clip(cosine, -1.0, 1.0)))
    return float(np.degrees(np.mean(angles))) if angles else 0.0


def attention_overlay(w, rows, cols, roi_size, n_rows, n_cols, alpha,
                      cmap_lin) -> np.ndarray:
    """[n_rows, n_cols, 4] RGBA grid coloring EVERY tile like the
    reference's per-tile rectangle loop (gbm/classify_combined.py:186-203):
    cell (r//roi_size, c//roi_size) gets jet(min(int(w), 104)) at the given
    alpha; cells with no tile stay fully transparent. The global-minimum
    tile has w == 0 after min-max normalization and jet(0) is dark blue —
    coloring only w > 0 would leave transparent holes (and a
    uniform-attention slide would render no tiles at all)."""
    colors = cmap_lin[np.minimum(np.asarray(w).astype(int), 104)]
    overlay = np.zeros((n_rows, n_cols, 4), np.float32)
    gr, gc = rows // roi_size, cols // roi_size
    overlay[gr, gc, :3] = colors[:, :3]
    overlay[gr, gc, 3] = alpha
    return overlay


def create_map(name, epoch, step, img_data, raster, A, F, M, *,
               roi_size: int = 1200, output_dir: str = ".",
               show: bool = False, downsample_tissue: int = 8):
    """Render and save the 2x3 attention panel; returns the file path.

    A: [K>=3, T] per-map attention (wROIs), F: [T, L] per-tile features,
    M: [K, O] slide embedding, raster: [T, 2] (row, col) tile coords.
    """
    A = np.asarray(A, np.float64)
    F = np.asarray(F, np.float64)
    M = np.asarray(M, np.float64).reshape(A.shape[0], -1)
    angle = embedding_angle(M)

    # min-max normalize like the reference's A1 (gbm/classify_combined.py:163)
    lo, hi = A.min(), A.max()
    A1 = (A - lo) / (hi - lo) if hi > lo else np.zeros_like(A)

    plt.ioff()
    fig, ax = plt.subplots(figsize=(12, 8), nrows=2, ncols=3)
    cmap_lin = cm.jet(np.linspace(0, 1, 105))
    fig.suptitle(f"Epoch = {epoch}")

    a_all = A1.mean(axis=0)
    weights = [100 * a_all, 100 * A1[0], 100 * A1[1], 100 * A1[2]]
    panels = [ax[0, 0], ax[1, 0], ax[1, 1], ax[1, 2]]
    alphas = [0.3, 0.9, 0.9, 0.9]

    # Composite the tissue mosaic and feature strips each into ONE canvas
    # + one imshow, and batch the attention rectangles into PatchCollections
    # — per-tile imshow/add_patch calls make 2500-tile slides take minutes
    # (the reference loops per tile; gbm/classify_combined.py:186-203).
    s = roi_size
    rows = np.asarray(raster)[:, 0].astype(int)
    cols = np.asarray(raster)[:, 1].astype(int)
    x_locs = cols.tolist()
    y_locs = rows.tolist()
    ts = max(4, min(32, s // max(downsample_tissue, 1)))  # thumb px/tile
    n_rows = (int(rows.max()) // s + 1) if len(rows) else 1
    n_cols = (int(cols.max()) // s + 1) if len(cols) else 1
    mosaic = np.full((n_rows * ts, n_cols * ts, 3), 255, np.uint8)
    # feature canvas at its intrinsic [side, 10] per-tile resolution
    side = F.shape[1] // 10 if F.ndim == 2 else 8
    featmap = np.zeros((n_rows * side, n_cols * 10), np.float32)
    for i, roi in enumerate(img_data):
        gr, gc = rows[i] // s, cols[i] // s
        roi = np.asarray(roi)
        step_r = max(1, roi.shape[0] // ts)
        thumb = roi[::step_r, ::step_r][:ts, :ts]
        mosaic[gr * ts:gr * ts + thumb.shape[0],
               gc * ts:gc * ts + thumb.shape[1]] = thumb[..., :3]
        featmap[gr * side:(gr + 1) * side, gc * 10:(gc + 1) * 10] = \
            np.asarray(F[i]).ravel()[: side * 10].reshape(side, 10)
    # slide-coordinate extent matching the rectangles' [row-s, row] spans:
    # canvas top row (slide row 0) renders at y in [-s, 0]
    extent = (0, n_cols * s, n_rows * s - s, -s)
    ax[0, 0].imshow(mosaic, origin="upper", extent=extent,
                    interpolation="nearest")
    ax[0, 1].imshow(featmap, origin="upper", extent=extent,
                    interpolation="nearest")

    for panel, w, alpha in zip(panels, weights, alphas):
        # Tiles sit on the roi_size raster grid (sliding_window stride ==
        # roi_size), so the colored squares render as ONE RGBA image over
        # the same extent as the mosaic — equivalent to per-tile Rectangle
        # patches but O(1) artists instead of O(T) PDF paths per map.
        overlay = attention_overlay(w, rows, cols, s, n_rows, n_cols,
                                    alpha, cmap_lin)
        panel.imshow(overlay, origin="upper", extent=extent,
                     interpolation="nearest", zorder=2)

    chan_min, chan_max = M.min(), M.max()
    span = (chan_max - chan_min) if chan_max > chan_min else 1.0
    ax[0, 2].imshow((M.reshape(1, 1, -1)[..., :3] - chan_min) / span,
                    origin="upper", extent=(0, 1, 0, -1))
    ax[0, 2].title.set_text(
        f"Angle = {angle:.2f}, Chan = {chan_min:.2f},{chan_max:.2f}")

    for a in [ax[0, 0], ax[0, 1], ax[1, 0], ax[1, 1], ax[1, 2]]:
        a.set_ylim(0 - s, max(y_locs) if y_locs else s)
        a.set_xlim(0, (max(x_locs) + s) if x_locs else s)
        a.set_aspect("equal")

    # fixed margins instead of tight_layout(): tight_layout needs a full
    # renderer pass (every image composited, every tick laid out) BEFORE
    # savefig renders again — measurably half the panel's wall time at
    # production tile counts, for a layout that is static here anyway
    fig.subplots_adjust(left=0.06, right=0.98, bottom=0.06, top=0.90,
                        wspace=0.25, hspace=0.25)
    path = os.path.join(
        output_dir, f"gbm_status-{str(epoch).zfill(3)}_sample-{name}-heatmap.pdf")
    if show:
        plt.show()
    plt.savefig(path)
    plt.close(fig)
    return path
