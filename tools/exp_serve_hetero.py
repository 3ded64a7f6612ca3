"""Heterogeneous-cohort serving A/B: does the bucketed masked pool pay?

The round-3 change made `classify_slide_streaming`'s pooling step take
the tile count as a traced scalar over a BUCKETED feature matrix
(`parallel/inference.py::_cached_pool`). Before it, every DISTINCT
slide size compiled a fresh pool program — invisible on homogeneous
smoke cohorts, expensive on real mixed-size cohorts. This experiment
drains the SAME mixed-size cohort (every slide a distinct tile count,
spanning several ladder buckets) through the daemon at different code
states / flags and reports the COMPILE COUNT (JAX_LOG_COMPILES, the
deterministic throttle-immune signal) plus drain wall / worst-slide /
warm latency.

Variants (each a subprocess so compiles don't leak across; the
persistent compilation cache is DISABLED inside the variants so every
run pays its honest compile bill):
  * ``--old_tree PATH``: a git worktree of the pre-fix commit — pool
    compiles per distinct slide size
  * current tree — pool compiles per bucket
  * current tree ``--prewarm N`` — ladder compiled before slide 1

Usage (TPU):
    git worktree add /tmp/repo_prepool <pre-fix sha>
    python tools/exp_serve_hetero.py --old_tree /tmp/repo_prepool
    git worktree remove /tmp/repo_prepool
CPU smoke: python tools/exp_serve_hetero.py --arch tiny --res 16 --roi 32
"""

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.exp_serve import build_cohort  # noqa: E402  (same cache layout)

PKG = "deep_convolutional_neural_network_resnet_26_and_attention_network_tpu"


def build_hetero_cohort(root, sizes, roi, seed=0):
    """One slide per entry of ``sizes`` — every tile count distinct."""
    slides = build_cohort(root, 0, 0, roi)  # ensure dirs + CACHE_DIR
    cache = os.path.join(root, "cache")
    for i, n in enumerate(sizes):
        rng = np.random.default_rng(seed + i)
        name = f"GHP_{i:03d}_A_H&E.scn"
        with open(os.path.join(slides, name), "wb") as f:
            f.write(b"synthetic")
        base = name.split(".")[0]
        tiles = np.clip(np.array([140, 60, 170], np.int16)
                        + rng.integers(-40, 40, (n, roi, roi, 3)),
                        0, 255).astype(np.uint8)
        coords = np.stack([[(j % 8) * roi, (j // 8) * roi]
                           for j in range(n)])
        np.save(os.path.join(cache,
                             f"data_{base}_rois_size{roi}_hsvcut_v3.npy"),
                tiles)
        np.save(os.path.join(cache,
                             f"coor_{base}_rois_size{roi}_hsvcut_v3.npy"),
                coords)
    return slides


def run_variant(tag, tree, slides_dir, cache_dir, out_root, args, extra):
    base_pp = os.environ.get("PYTHONPATH", "")
    # PREPEND: the base PYTHONPATH carries the device-plugin site dir.
    # JAX_LOG_COMPILES: wall-clock deltas between variants are dominated
    # by tunnel throttle drift (PROFILE.md); the compile COUNT is the
    # deterministic, throttle-immune signal the pool-bucketing change is
    # actually about (per-distinct-size programs vs per-bucket programs)
    env = dict(os.environ,
               PYTHONPATH=f"{tree}:{base_pp}" if base_pp else tree,
               CACHE_DIR=cache_dir, JAX_DISABLE_PERSISTENT_CACHE="1",
               JAX_LOG_COMPILES="1")
    argv = [sys.executable, "-m", f"{PKG}.train.serve",
            "--watch_dir", slides_dir, "--out_root", out_root,
            "--arch", args.arch, "--resolution", str(args.res),
            "--roi_size", str(args.roi), "--chunk", str(args.chunk),
            "--once", "--settle_secs", "0", "--seed", "0"] + extra
    t0 = time.perf_counter()
    # cwd=tree: `python -m` puts the child's cwd at sys.path[0], AHEAD of
    # PYTHONPATH — launched from the repo root, the current tree would
    # silently shadow the old-tree worktree and the A/B would measure
    # new-vs-new (this bug invalidated the first committed old-tree row)
    proc = subprocess.run(argv, env=env, capture_output=True, text=True,
                          timeout=args.timeout, cwd=tree)
    wall = time.perf_counter() - t0
    rows = []
    csv_path = os.path.join(out_root, "results.csv")
    if os.path.exists(csv_path):
        with open(csv_path) as f:
            rows = [ln.split(",") for ln in f.read().splitlines()[1:] if ln]
    if proc.returncode != 0 or not rows:
        print(proc.stdout[-2000:], proc.stderr[-2000:], sep="\n",
              file=sys.stderr)
        res = {"variant": tag, "rc": proc.returncode, "n_slides": len(rows)}
        print(json.dumps(res), flush=True)
        return res
    secs = [float(r[-1]) for r in rows]
    # dedup exact duplicates: each log record can surface twice (root
    # handler + timestamped handler); durations carry 9 decimals so two
    # DISTINCT compiles never collide
    compiles = {m for m in re.findall(
        r"Finished XLA compilation of (.*? in ([0-9.]+) sec)",
        proc.stderr)}
    compiles = sorted(float(d) for _, d in compiles)
    res = {
        "variant": tag, "rc": 0, "n_slides": len(rows),
        "distinct_sizes": len({r[6] for r in rows}),
        "n_compiles": len(compiles),
        "compile_secs": round(sum(compiles), 1),
        "drain_wall_secs": round(wall, 1),
        "sum_slide_secs": round(sum(secs), 1),
        "max_slide_secs": round(max(secs), 2),
        "warm_last5_median_secs": round(float(np.median(secs[-5:])), 3),
    }
    print(json.dumps(res), flush=True)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--old_tree", default=None,
                    help="worktree of the pre-bucketed-pool commit")
    ap.add_argument("--arch", default="full", choices=["full", "tiny"])
    ap.add_argument("--res", default=300, type=int)
    ap.add_argument("--roi", default=300, type=int)
    ap.add_argument("--chunk", default=256, type=int)
    ap.add_argument("--max_tiles", default=250, type=int,
                    help="largest slide (capped to keep tunnel H2D off "
                         "the critical path)")
    ap.add_argument("--timeout", default=3600, type=int)
    ap.add_argument("--settle_between", default=75, type=int,
                    help="seconds between variants: a freshly "
                         "exited device client can hold the "
                         "tunnel lease for ~1-2 min, stalling "
                         "the next variant's first dispatch")
    ap.add_argument("--keep", default=None)
    args = ap.parse_args()

    # every slide a distinct size, 6 per ladder bucket class up to the cap
    sizes = [s for s in (17, 21, 26, 29, 24, 31,
                         40, 52, 57, 61, 48, 63,
                         70, 90, 101, 120, 96, 127,
                         130, 170, 201, 240, 150, 250) if s <= args.max_tiles]
    # absolute: the variant subprocesses run with cwd=tree
    workdir = (os.path.abspath(args.keep) if args.keep
               else tempfile.mkdtemp(prefix="serve_hetero_"))
    slides = build_hetero_cohort(workdir, sizes, args.roi)
    cache = os.path.join(workdir, "cache")
    print(f"# cohort: {len(sizes)} slides, sizes {min(sizes)}..{max(sizes)}"
          f" ({workdir})")

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    variants = []
    if args.old_tree:
        variants.append(("old_per_size_pool", args.old_tree, []))
    variants += [("new_bucketed_pool", here, []),
                 ("new_prewarm", here,
                  ["--prewarm", str(args.max_tiles)])]
    for k, (tag, tree, extra) in enumerate(variants):
        if k:
            time.sleep(args.settle_between)
        out = os.path.join(workdir, f"out_{tag}")
        shutil.rmtree(out, ignore_errors=True)
        run_variant(tag, tree, slides, cache, out, args, extra)
    return 0


if __name__ == "__main__":
    sys.exit(main())
