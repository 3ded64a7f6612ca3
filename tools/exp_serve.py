"""Serving-daemon steady-state throughput on the current device.

Builds a synthetic cohort of pre-cached slides (same cache layout the
daemon consumes in production, cf. tests/test_serve.py), then drains it
through ``train.serve --once`` in each requested variant and reports the
WARM per-slide latency — the median of the per-slide ``secs`` column in
results.csv, excluding the first slide of each variant, which carries
jit compile. This is the number the PROFILE.md serving section quotes
from CPU smoke runs; here it's measured on whatever jax.devices() says
(TPU via tools/tpu_r3_sweep.sh step 5).

Usage:
  python tools/exp_serve.py                      # full arch, 300px, TPU
  python tools/exp_serve.py --arch tiny --res 16 --roi 32 --tiles 24 \
      --slides 6   # CPU smoke (~1 min)

One JSON line per variant: warm_secs_per_slide, warm_slides_per_min,
cold_first_slide_secs, plus cohort geometry.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_cohort(root: str, n_slides: int, ntiles: int, roi: int,
                 seed: int = 0) -> str:
    """Synthetic slides + prebuilt roi caches (tissue-like RGB noise)."""
    cache = os.path.join(root, "cache")
    slides = os.path.join(root, "slides")
    os.makedirs(cache, exist_ok=True)
    os.makedirs(slides, exist_ok=True)
    os.environ["CACHE_DIR"] = cache
    rng = np.random.default_rng(seed)
    for i in range(n_slides):
        name = f"GHP_{i:03d}_A_H&E.scn"
        with open(os.path.join(slides, name), "wb") as f:
            f.write(b"synthetic")
        base = name.split(".")[0]
        tiles = np.clip(
            np.array([140, 60, 170], np.int16)
            + rng.integers(-40, 40, (ntiles, roi, roi, 3)),
            0, 255).astype(np.uint8)
        coords = np.stack(
            [[(j % 8) * roi, (j // 8) * roi] for j in range(ntiles)])
        np.save(os.path.join(
            cache, f"data_{base}_rois_size{roi}_hsvcut_v3.npy"), tiles)
        np.save(os.path.join(
            cache, f"coor_{base}_rois_size{roi}_hsvcut_v3.npy"), coords)
    return slides


_PKG = "deep_convolutional_neural_network_resnet_26_and_attention_network_tpu"
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_variant(tag: str, slides_dir: str, out_root: str, args,
                extra: list[str], group: int = 1,
                subproc_env: dict | None = None) -> dict:
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (  # noqa: E501
        serve,
    )

    argv = ["--watch_dir", slides_dir, "--out_root", out_root,
            "--arch", args.arch, "--resolution", str(args.res),
            "--roi_size", str(args.roi), "--chunk", str(args.chunk),
            "--once", "--settle_secs", "0", "--seed", "0"] + extra
    t0 = time.perf_counter()
    if subproc_env is not None:
        # fresh-host variants run in their OWN interpreter: in-process
        # runs would share jit program caches with earlier variants and
        # understate the live path's fresh-host trace+lower cost (the
        # exact cost AOT bundles exist to remove)
        import subprocess

        env = dict(os.environ, **subproc_env)
        env["PYTHONPATH"] = _ROOT + os.pathsep + env.get("PYTHONPATH", "")
        proc = subprocess.run(
            [sys.executable, "-m", f"{_PKG}.train.serve"] + argv, env=env)
        rc = proc.returncode
    else:
        rc = serve.main(argv)
    wall = time.perf_counter() - t0
    csv_path = os.path.join(out_root, "results.csv")
    rows = []
    if os.path.exists(csv_path):
        with open(csv_path) as f:
            rows = [ln.split(",") for ln in f.read().splitlines()[1:] if ln]
    if not rows:
        # a failed variant still reports its rc instead of crashing the
        # sweep (results.csv absent/empty when serve.main bails early)
        res = {"variant": tag, "rc": rc, "n_slides": 0,
               "error": "no results.csv rows"}
        print(json.dumps(res), flush=True)
        return res
    secs = [float(r[-1]) for r in rows]
    # Rows append in processing order; the first slide (or, batched, the
    # whole first group — its members share one amortized figure) rides
    # the jit compile. Warm = median of everything after it.
    cold = secs[0]
    warm = secs[group:] or secs
    warm_med = float(np.median(warm))
    res = {
        "variant": tag, "rc": rc, "n_slides": len(rows),
        "tiles_per_slide": args.tiles, "resolution": args.res,
        # serve.py's secs column has 3 decimals, so a batched per-slide
        # figure under 0.5 ms rounds to 0.000 — report null rather than
        # divide by zero after the cohort already drained
        "cold_first_slide_secs": round(cold, 3),
        "warm_secs_per_slide": round(warm_med, 4),
        "warm_slides_per_min": (round(60.0 / warm_med, 2)
                                if warm_med > 0 else None),
        "drain_wall_secs": round(wall, 2),
        "device": str(__import__("jax").devices()[0].platform),
    }
    print(json.dumps(res), flush=True)
    return res


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--slides", default=24, type=int)
    p.add_argument("--tiles", default=64, type=int,
                   help="tiles per slide (biopsy-sized default)")
    p.add_argument("--res", default=300, type=int)
    p.add_argument("--roi", default=300, type=int)
    p.add_argument("--arch", default="full", choices=["full", "tiny"])
    p.add_argument("--chunk", default=1024, type=int)
    p.add_argument("--batch", default=8, type=int,
                   help="group size for the batched variant (0 = skip)")
    p.add_argument("--skip_int8", action="store_true")
    p.add_argument("--bundle", action="store_true",
                   help="add the fresh-host A/B: export an AOT bundle, "
                        "then drain the cohort via `serve --bundle` and "
                        "via the live jit path, each in its own "
                        "interpreter with the persistent compilation "
                        "cache disabled — measures exactly the "
                        "trace/lower cost AOT serving claims to remove")
    p.add_argument("--skip_live", action="store_true",
                   help="with --bundle: skip the live fresh-host variant "
                        "(the full-width live compile costs minutes)")
    p.add_argument("--keep", default=None,
                   help="reuse/keep this cohort+output dir")
    p.add_argument("--cpu", action="store_true",
                   help="pin the CPU backend (the surrounding env "
                        "pre-pins the TPU platform; JAX_PLATFORMS alone "
                        "is ignored — must go through jax.config)")
    args = p.parse_args(argv)

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    root = args.keep or tempfile.mkdtemp(prefix="exp_serve_")
    slides_dir = build_cohort(root, args.slides, args.tiles, args.roi)
    if args.batch and args.slides % args.batch:
        print(f"WARNING: {args.slides} slides not divisible by batch "
              f"{args.batch} — the tail group compiles a second program "
              "and pollutes the batched warm median", file=sys.stderr)
    results = []
    if args.bundle:
        from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu import (  # noqa: E501
            deploy,
        )

        bundle_dir = os.path.join(root, "bundle")
        t0 = time.perf_counter()
        rc = deploy.main([
            "export", "--out", bundle_dir, "--arch", args.arch,
            "--resolution", str(args.res), "--roi_size", str(args.roi),
            "--chunk", str(args.chunk),
            "--tiles", str(max(args.tiles, args.chunk))])
        export_secs = time.perf_counter() - t0
        print(json.dumps({"variant": "bundle_export", "rc": rc,
                          "export_secs": round(export_secs, 2)}),
              flush=True)
        fresh = {"JAX_DISABLE_PERSISTENT_CACHE": "1"}
        fresh_variants = [("bundle_fresh_host",
                           ["--bundle", bundle_dir], 1)]
        if not args.skip_live:
            # prewarm doesn't remove the fresh-host jit cost, it moves it
            # ahead of slide 1 — measuring both live variants shows how
            # much of the cold_first_slide figure is compile (prewarm
            # shifts it into drain_wall) vs genuine slide work, and what
            # the bundle actually saves
            fresh_variants.append(("live_fresh_host", [], 1))
            fresh_variants.append(
                ("live_fresh_host_prewarm",
                 ["--prewarm", str(max(args.tiles, args.chunk))], 1))
        for tag, extra, group in fresh_variants:
            out_root = os.path.join(root, f"out_{tag}")
            results.append(run_variant(tag, slides_dir, out_root, args,
                                       extra, group, subproc_env=fresh))
    variants = [("serial_bf16", [], 1)]
    if args.batch:
        variants.append((f"batched_x{args.batch}",
                         ["--batch", str(args.batch)], args.batch))
    if not args.skip_int8:
        variants.append(("serial_int8", ["--int8"], 1))
    for tag, extra, group in variants:
        out_root = os.path.join(root, f"out_{tag}")
        results.append(
            run_variant(tag, slides_dir, out_root, args, extra, group))
    if not args.keep:
        shutil.rmtree(root, ignore_errors=True)
    return 0 if all(r["rc"] == 0 for r in results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
