"""End-to-end demo on synthetic data — no slides or spreadsheets needed.

Builds a synthetic slide tree (tile caches + label sheet), trains the tiny
model for a few epochs through the real CLI driver, runs interface mode,
and lists the artifacts. Runs on CPU in ~2 minutes:

    python examples/synthetic_demo.py --workdir /tmp/gbmnet_demo
"""

import argparse
import csv
import os
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_tree(workdir: str, *, n_per_class=2, tiles_per_slide=24, roi=32):
    """Slide files + pre-built tile caches + cluster label sheet."""
    cache = os.path.join(workdir, "cache")
    slides = os.path.join(workdir, "slides")
    os.makedirs(cache, exist_ok=True)
    os.makedirs(slides, exist_ok=True)
    rng = np.random.default_rng(0)
    colors = {0: (150, 60, 170), 1: (80, 150, 90), 2: (70, 90, 180)}
    rows = [["id", ""], ["hdr", "Actual Cluster Designation"]]
    i = 0
    for cls in range(3):
        for _ in range(n_per_class):
            i += 1
            name = f"GHP_{i}_X_H&E.scn"
            open(os.path.join(slides, name), "wb").write(b"synthetic")
            base = name.split(".")[0]
            color = np.array(colors[cls], np.int16)
            tiles = np.clip(color + rng.integers(-30, 30,
                                                 (tiles_per_slide, roi, roi, 3)),
                            0, 255).astype(np.uint8)
            np.save(os.path.join(cache,
                                 f"data_{base}_rois_size{roi}_hsvcut_v3.npy"),
                    tiles)
            np.save(os.path.join(cache,
                                 f"coor_{base}_rois_size{roi}_hsvcut_v3.npy"),
                    np.stack([[j * roi, 0] for j in range(tiles_per_slide)]))
            rows.append([f"GHP_{i}_X", "ABC"[cls]])
    sheet = os.path.join(workdir, "clusters.csv")
    with open(sheet, "w", newline="") as f:
        csv.writer(f).writerows(rows)
    return cache, slides, sheet


def run_cli(args_list, cache):
    env = dict(os.environ, CACHE_DIR=cache,
               PYTHONPATH=ROOT + os.pathsep + os.environ.get("PYTHONPATH", ""))
    cmd = [sys.executable, "-m",
           "deep_convolutional_neural_network_resnet_26_and_attention_network_tpu"
           ".train.classify"] + args_list
    print("+", " ".join(args_list))
    subprocess.run(cmd, check=True, env=env)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/gbmnet_demo")
    ap.add_argument("--epochs", type=int, default=2)
    args = ap.parse_args()

    cache, slides, sheet = build_tree(args.workdir)
    common = ["--arch", "tiny", "--resolution", "16", "--roi_size", "32",
              "--accum", "2", "--f32",
              "--data_root", args.workdir, "--image_dir", "slides",
              "--label_sheet", sheet,
              "--output_root", os.path.join(args.workdir, "runs")]

    run_cli(["--tag", "DEMO", "--epoch_start", "0",
             "--epoch_end", str(args.epochs)] + common, cache)
    run_cli(["--interface", "--ckpt",
             os.path.join(args.workdir, "runs", "run_DEMO",
                          "train_step-000.model")] + common, cache)

    print("\nArtifacts:")
    for root, _, files in os.walk(os.path.join(args.workdir, "runs")):
        for f in sorted(files)[:50]:
            print("  ", os.path.relpath(os.path.join(root, f), args.workdir))


if __name__ == "__main__":
    main()
