"""Offline tile-cache builder CLI.

The reference built tile caches lazily inside the first training run
(RoiBuilder.build() on a cache miss mid-epoch, reference:
RoiBuilder.py:128-177) — a multi-hour surprise on a fresh cohort. This
makes the preprocessing stage explicit: scan a slide directory, run the
tissue filter (C++ OpenMP fast path when built, else the batched
on-device rule), and persist the same ``{data,coor}_*_rois_size*_
hsvcut_v3.npy`` caches the datasets consume.

    CACHE_DIR=/path/to/cache python -m ...data.build_caches \
        --data_root /slides_root --image_dir All_HE_scans_GBM_AN
"""

import argparse
import glob
import os
import sys
import time

from .roibuilder import RoiBuilder


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Prebuild RoiBuilder tile caches for a slide directory")
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--image_dir", default="All_HE_scans_GBM_AN")
    ap.add_argument("--glob", default="*H&E.scn,*.svs",
                    help="comma-separated slide patterns "
                         "(reference: gbm/GlioblastomaDS.py:130,177)")
    ap.add_argument("--roi_size", default=None, type=int,
                    help="tile size on the slide (default: RoiBuilder's "
                         "1200; cache filenames encode it)")
    args = ap.parse_args(argv)

    root = os.path.join(args.data_root, args.image_dir)
    files = sorted(f for pat in args.glob.split(",")
                   for f in glob.glob(os.path.join(root, pat.strip())))
    if not files:
        print(f"no slides match {args.glob} under {root}", file=sys.stderr)
        return 2

    params = {}
    if args.roi_size:
        params["roi_size"] = args.roi_size
    built = cached = failed = 0
    for i, path in enumerate(files):
        t0 = time.perf_counter()
        b = RoiBuilder(path, dict(params))
        was_cached = "VALID" in b.params["status"]
        try:
            b.build()
        except Exception as e:  # a corrupt slide must not sink the cohort
            failed += 1
            print(f"[{i + 1}/{len(files)}] FAILED {b.getname()}: {e}")
            continue
        cached += was_cached
        built += not was_cached
        print(f"[{i + 1}/{len(files)}] {b.getname()}: "
              f"{b.getsize()} tiles "
              f"({'cached' if was_cached else f'{time.perf_counter() - t0:.1f}s'})")
    print(f"done: {built} built, {cached} already cached, {failed} failed")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
