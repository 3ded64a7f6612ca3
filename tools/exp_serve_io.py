"""Serving IO-pipeline A/B: does --io_depth pay on cold slides?

The daemon change under test (train/serve.py::SlideServer._prepare +
--io_depth) moves per-slide host prep — RoiBuilder cache build (full
slide decode + tissue filter), transform arming, raw-cache readahead —
onto a background producer thread (data.loader.prefetch_iter) so it
overlaps the PREVIOUS slide's device compute. On prebuilt-cache cohorts
(tools/exp_serve.py, exp_serve_hetero.py) prep is nearly free, so this
experiment drains a cohort of COLD full-slide ``.npy`` files: every
slide pays decode + tissue filter before it can classify, the case the
pipeline exists for (BASELINE config 3 measured build 1.45 s vs infer
5.38 s per 6000 px slide — a ~1.2x serial overhead the overlap should
recover).

Method: in-process (variants share warm compiled programs — compile
noise excluded by a warmup slide), page cache pre-touched for every
slide file, interleaved A/B (0, N, 0, N) so tunnel/host drift cannot
masquerade as a win. Each variant gets a FRESH cache dir, so every run
pays its builds.

TPU:      python tools/exp_serve_io.py
CPU smoke: python tools/exp_serve_io.py --arch tiny --res 16 --roi 64 \
               --px 320 --n 3
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PKG = "deep_convolutional_neural_network_resnet_26_and_attention_network_tpu"


def build_slides(root: str, n: int, px: int, seed: int = 0) -> str:
    """n cold full-slide .npy files (tissue-colored noise, no caches)."""
    slides = os.path.join(root, "slides")
    os.makedirs(slides, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n):
        img = np.clip(np.array([150, 90, 160], np.int16)
                      + rng.integers(-50, 50, (px, px, 3)),
                      0, 255).astype(np.uint8)
        np.save(os.path.join(slides, f"GHP_{i:03d}_A_H&E.npy"), img)
        # numpy appends .npy if missing; our name already ends in it
    return slides


def make_server(slides_dir: str, out_root: str, cache_dir: str, args,
                io_depth: int):
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (  # noqa: E501
        serve,
    )

    os.makedirs(cache_dir, exist_ok=True)
    os.environ["CACHE_DIR"] = cache_dir
    argv = ["--watch_dir", slides_dir, "--out_root", out_root,
            "--arch", args.arch, "--resolution", str(args.res),
            "--roi_size", str(args.roi), "--settle_secs", "0",
            "--io_depth", str(io_depth), "--once"]
    return serve.SlideServer(serve.build_argparser().parse_args(argv))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=6, help="cohort size")
    ap.add_argument("--px", type=int, default=6000, help="slide side")
    ap.add_argument("--roi", type=int, default=1200)
    ap.add_argument("--res", type=int, default=300)
    ap.add_argument("--arch", default="full")
    ap.add_argument("--io_depth", type=int, default=2,
                    help="pipelined variant's depth")
    ap.add_argument("--reps", type=int, default=2,
                    help="interleaved repetitions per variant")
    args = ap.parse_args()

    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.utils import (  # noqa: E501
        compcache,
    )

    compcache.enable()
    root = tempfile.mkdtemp(prefix="exp_serve_io_")
    try:
        slides_dir = build_slides(root, args.n, args.px)
        # page-cache pre-touch: neither variant pays cold disk reads of
        # the slide files themselves (that cost is order-dependent and
        # would shadow the A/B)
        for f in sorted(os.listdir(slides_dir)):
            np.load(os.path.join(slides_dir, f), mmap_mode="r").sum()

        # warmup: one slide end-to-end so both variants run fully warm
        # programs (same roi/res -> same chunk/pool buckets)
        warm_dir = os.path.join(root, "warm_slides")
        build_slides(os.path.join(root, "warm"), 1, args.px, seed=99)
        os.rename(os.path.join(root, "warm", "slides"), warm_dir)
        srv = make_server(warm_dir, os.path.join(root, "warm_out"),
                          os.path.join(root, "warm_cache"), args, 0)
        t0 = time.perf_counter()
        srv._drain(srv.pending())
        print(f"# warmup drain (compiles): {time.perf_counter() - t0:.1f}s",
              flush=True)

        results = []
        order = [0, args.io_depth] * args.reps
        for rep, depth in enumerate(order):
            out = os.path.join(root, f"out_{rep}")
            cache = os.path.join(root, f"cache_{rep}")
            srv = make_server(slides_dir, out, cache, args, depth)
            # decompose each drain: prep_s = host prep the pipeline can
            # overlap (cache build/decode/arm); classify_s = consumer-side
            # per-slide classify wall (the daemon's CSV secs column).
            # Serial wall ~= prep + classify; pipelined wall ~= the max —
            # the decomposition makes the overlap visible even when the
            # tunnel throttle moves absolute walls between reps.
            prep_box = [0.0]
            inner = srv._prepare

            def timed_prepare(path, _inner=inner, _box=prep_box):
                t = time.perf_counter()
                try:
                    return _inner(path)
                finally:
                    _box[0] += time.perf_counter() - t

            srv._prepare = timed_prepare
            t0 = time.perf_counter()
            done, failed = srv._drain(srv.pending())
            wall = time.perf_counter() - t0
            assert done == args.n and failed == 0, (done, failed)
            with open(os.path.join(out, "results.csv")) as f:
                classify_s = sum(float(ln.rsplit(",", 1)[1])
                                 for ln in f.read().splitlines()[1:] if ln)
            results.append({"io_depth": depth, "wall_s": round(wall, 2),
                            "prep_s": round(prep_box[0], 2),
                            "classify_s": round(classify_s, 2),
                            "slides_per_min": round(60 * args.n / wall, 2)})
            print(json.dumps(results[-1]), flush=True)
            shutil.rmtree(cache)  # next run must rebuild

        base = [r for r in results if r["io_depth"] == 0]
        pipe = [r for r in results if r["io_depth"] > 0]

        def med(xs):
            return round(float(np.median(xs)), 2)

        summary = {
            "experiment": "serve_io_pipeline",
            "n_slides": args.n, "px": args.px, "roi": args.roi,
            "res": args.res, "arch": args.arch,
            "serial_wall_s": [r["wall_s"] for r in base],
            "pipelined_wall_s": [r["wall_s"] for r in pipe],
            "median_speedup": round(med([r["wall_s"] for r in base])
                                    / med([r["wall_s"] for r in pipe]), 3),
            # throttle-robust overlap signal: how much of the host prep
            # disappeared from the critical path (wall - classify)
            "serial_overhead_s": med([r["wall_s"] - r["classify_s"]
                                      for r in base]),
            "pipelined_overhead_s": med([r["wall_s"] - r["classify_s"]
                                         for r in pipe]),
            "prep_s_median": med([r["prep_s"] for r in results]),
        }
        print(json.dumps(summary), flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
