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

``--workers N`` builds N slides concurrently in spawned worker
processes — the cohort cold-start is decode + tissue-filter bound on
the host, and every slide is independent (cache writes are atomic
tmp+os.replace, so concurrent builders can never interleave a torn
pair). Workers force the HOST tissue filter (or the C++ fast path when
built): N processes must not each open an accelerator client to fight
over one chip.
"""

import argparse
import glob
import os
import sys
import time

from .roibuilder import RoiBuilder


def _build_one(path: str, params: dict):
    """Build one slide's cache; returns (name, ntiles, was_cached, secs,
    err). Module-level so spawned pool workers can pickle it; must not
    raise (a corrupt slide must not sink the cohort)."""
    t0 = time.perf_counter()
    try:
        b = RoiBuilder(path, dict(params))
        was_cached = "VALID" in b.params["status"]
        b.build()
        return (b.getname(), b.getsize(), was_cached,
                time.perf_counter() - t0, None)
    except Exception as e:  # noqa: BLE001 - reported per slide
        return (os.path.basename(path), 0, False,
                time.perf_counter() - t0, f"{type(e).__name__}: {e}")


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
    ap.add_argument("--workers", default=1, type=int,
                    help="parallel slide builders (spawned processes; "
                         "slides are independent and cache writes are "
                         "atomic). Workers use the host/C++ tissue "
                         "filter, never a device client")
    args = ap.parse_args(argv)
    if args.workers < 1:
        ap.error(f"--workers must be >= 1, got {args.workers}")

    root = os.path.join(args.data_root, args.image_dir)
    files = sorted(f for pat in args.glob.split(",")
                   for f in glob.glob(os.path.join(root, pat.strip())))
    if not files:
        print(f"no slides match {args.glob} under {root}", file=sys.stderr)
        return 2

    # This CLI is a host preprocessing tool: force the host/C++ tissue
    # filter in BOTH the serial and parallel paths, so (a) the prebuild
    # never opens an accelerator client, and (b) serial and parallel
    # builds run the same filter arithmetic and stay byte-identical.
    params = {"host_filter": True}
    if args.roi_size:
        params["roi_size"] = args.roi_size

    built = cached = failed = 0
    if args.workers == 1:
        results = (_build_one(p, params) for p in files)
    else:
        import multiprocessing as mp

        # spawn, not fork: the parent may hold an initialized jax client,
        # which does not survive fork. Workers import the package fresh
        # (imports are device-free by contract — test_import_purity) and
        # keep filtering on host/C++ via host_filter.
        ctx = mp.get_context("spawn")
        pool = ctx.Pool(min(args.workers, len(files)))
        results = pool.imap_unordered(
            _StarBuild(dict(params)), files, chunksize=1)

    done = 0
    for name, ntiles, was_cached, secs, err in results:
        done += 1
        if err:
            failed += 1
            print(f"[{done}/{len(files)}] FAILED {name}: {err}")
            continue
        cached += was_cached
        built += not was_cached
        print(f"[{done}/{len(files)}] {name}: {ntiles} tiles "
              f"({'cached' if was_cached else f'{secs:.1f}s'})")
    if args.workers > 1:
        pool.close()
        pool.join()
    print(f"done: {built} built, {cached} already cached, {failed} failed")
    return 1 if failed else 0


class _StarBuild:
    """Picklable single-arg adapter binding the worker params for
    Pool.imap_unordered (a lambda would not pickle under spawn)."""

    def __init__(self, params: dict):
        self.params = params

    def __call__(self, path: str):
        return _build_one(path, self.params)


if __name__ == "__main__":
    sys.exit(main())
