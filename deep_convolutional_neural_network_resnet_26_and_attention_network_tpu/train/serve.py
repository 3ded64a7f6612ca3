"""Persistent slide-inference service (serving daemon).

Beyond-reference serving surface for production deployment: a
long-running process that watches a directory (or reads a manifest file)
for whole-slide images, builds or reuses the RoiBuilder tile cache, runs
the attention-MIL classifier, and appends one ``results.csv`` row plus
caMicroscope ``.dla`` attention maps per slide. The reference's closest
surface is the one-shot caMicroscope interface mode
(gbm/classify_combined.py:221-298); this reshapes it into a restartable
service with the same artifact formats.

TPU-serving design points:

  * **one default code path** — every slide goes through
    ``parallel.inference.classify_slide_streaming``: exact for any bag
    size (MIL pooling is linear over tiles), bounded device memory (one
    chunk + the [T, L] features resident), mesh-composable
    (``--mesh N`` shards each chunk's tile axis), and extractor-swappable
    (``--int8`` serves the W8A8 path, ops/quant.py). ``--batch N`` adds a
    throughput mode: up to N small slides (``--batch_tile_cap``) group
    into ONE batched forward — per-dispatch overhead is multi-ms on
    remote devices, so biopsy-sized slides arriving in bulk amortize it
    N-fold; over-cap slides still stream;
  * **compiled programs stay warm** — chunk shapes come off the bucket
    ladder, so steady-state latency after the first few slides is pure
    compute + IO, never compile;
  * **host IO pipelines with device compute** — ``--io_depth N``
    prepares up to N slides ahead (cache build/decode, transform
    arming, kernel readahead on the raw cache) on a background thread
    while the device classifies the current slide, the serving analog
    of the training input prefetcher (data/loader.py);
  * **AOT mode** — ``--bundle DIR`` serves a deploy.py export: programs
    and weights come from the serialized bundle, no model is built in
    the daemon process, and ``--prewarm`` warms every bundle program
    before slide 1;
  * **idempotent restarts** — processed basenames persist to
    ``processed.txt`` (append + fsync per slide), and startup reconciles
    it against ``results.csv`` rows: a slide with a results row is never
    re-classified or double-written; a crash mid-slide (before its CSV
    row landed) redoes only that slide, overwriting its own ``.dla``.

Run::

    python -m ...train.serve --ckpt run_R1/train_step-340.model \
        --watch_dir /incoming/slides --out_root serve_out [--int8]
    python -m ...train.serve --ckpt ... --manifest slides.txt --once
"""

import argparse
import glob as globmod
import os
import sys
import time

import numpy as np

import jax.numpy as jnp

from ..data.roibuilder import RoiBuilder
from ..models import attention_mil as amil
from ..parallel import inference
from ..train import checkpoint
from ..utils import helpers
from .classify import make_config

SLIDE_EXTS = (".scn", ".svs", ".tif", ".tiff", ".npy")
CSV_HEADER = ("name,prob_0,prob_1,prob_2,pred,Aterm_var,ntiles,secs\n")


def build_argparser():
    p = argparse.ArgumentParser(
        description="watch-folder / manifest slide classification service")
    p.add_argument("--ckpt", default=None,
                   help="train_step-NNN.model checkpoint (random init with "
                        "a warning if unset — smoke tests only)")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--watch_dir",
                     help="directory to poll for new slide files")
    src.add_argument("--manifest",
                     help="text file of slide paths (one per line); "
                          "re-read every poll, so it may grow")
    p.add_argument("--out_root", default="serve_data")
    p.add_argument("--resolution", default=300, type=int)
    p.add_argument("--roi_size", default=None, type=int)
    p.add_argument("--arch", default="full", choices=["full", "tiny"])
    p.add_argument("--stem", default="conv7", choices=["conv7", "s2d"])
    p.add_argument("--f32", action="store_true")
    p.add_argument("--int8", action="store_true",
                   help="serve the W8A8 int8 extractor (ops/quant.py); "
                        "activation scales calibrate on the first slide")
    p.add_argument("--bundle", default=None,
                   help="serve from an AOT deployment bundle (deploy.py "
                        "export): programs and weights come from the "
                        "bundle, no model is built and --ckpt is ignored; "
                        "resolution/roi_size follow the bundle manifest. "
                        "Mutually exclusive with --int8/--batch/--mesh "
                        "(those recompose the live program)")
    p.add_argument("--int8_calib", default=256, type=int)
    p.add_argument("--chunk", default=1024, type=int,
                   help="streaming chunk (tiles per dispatch)")
    p.add_argument("--batch", default=1, type=int,
                   help="group up to N small slides into ONE batched "
                        "forward per dispatch (amortizes per-dispatch "
                        "overhead when many biopsy-sized slides arrive); "
                        "slides over --batch_tile_cap still stream "
                        "individually")
    p.add_argument("--batch_tile_cap", default=1024, type=int,
                   help="slides with more tiles than this are too big to "
                        "batch (the batch pads every bag to the largest "
                        "member's bucket) and take the streaming path")
    p.add_argument("--mesh", default=0, type=int,
                   help="shard each chunk's tile axis over N devices")
    p.add_argument("--io_depth", default=1, type=int,
                   help="prepare (cache build / decode / readahead) up "
                        "to N slides ahead on a background thread while "
                        "the device classifies the current one — the "
                        "serving analog of the training input pipeline; "
                        "0 disables the overlap")
    p.add_argument("--poll_secs", default=5.0, type=float)
    p.add_argument("--settle_secs", default=2.0, type=float,
                   help="skip files modified more recently than this "
                        "(mid-copy uploads)")
    p.add_argument("--prewarm", default=0, type=int, metavar="TILES",
                   help="compile the streaming extractor and pool for "
                        "every ladder bucket up to TILES tiles BEFORE "
                        "watching, so the first slide of each size class "
                        "pays compute, not compile (each bucket is a "
                        "separate program — budget ~1-2 min per bucket "
                        "at full width on a fresh TPU host; restarts hit "
                        "the persistent cache). Shapes follow "
                        "--roi_size/--resolution; the --int8 programs "
                        "still compile after first-slide calibration")
    p.add_argument("--once", action="store_true",
                   help="process the current backlog, then exit")
    p.add_argument("--seed", default=0, type=int)
    return p


class SlideServer:
    def __init__(self, args):
        self.args = args
        self.cfg = make_config(args)
        self.compute_dtype = None if args.f32 else jnp.bfloat16
        os.makedirs(args.out_root, exist_ok=True)
        self.results_path = os.path.join(args.out_root, "results.csv")
        self.processed_path = os.path.join(args.out_root, "processed.txt")
        import threading

        # graceful-stop latch (SIGTERM from a supervisor, see main()):
        # finish the slide in flight, record it, exit 0 — instead of
        # dying mid-slide and re-paying that slide's work on restart
        # (the crash path stays safe either way: processed.txt is
        # append+fsync and unrecorded slides simply retry)
        self._stop_event = threading.Event()

        import jax

        self.bundle = None
        if args.bundle:
            if args.int8 or args.batch > 1 or args.mesh:
                raise SystemExit(
                    "serve: --bundle serves the exported programs as-is; "
                    "--int8/--batch/--mesh recompose the live program and "
                    "cannot apply — re-export a bundle with the variant "
                    "you need")
            from .. import deploy

            self.bundle = deploy.DeployedClassifier(args.bundle)
            m = self.bundle.manifest
            # builder prep (tiling, eval transform resolution) must match
            # what the exported extractor program was traced for
            args.resolution = int(m["resolution"])
            args.roi_size = int(m["roi_size"])
            params = None
            print(f"serve: AOT bundle {args.bundle} "
                  f"({len(m['programs'])} programs, res {m['resolution']}, "
                  f"roi {m['roi_size']}, max_tiles {m['max_tiles']})"
                  + ("; --ckpt ignored" if args.ckpt else ""))
        else:
            params = amil.init_attention_mil(jax.random.PRNGKey(args.seed),
                                             self.cfg)
            if args.ckpt:
                params, loaded, skipped = checkpoint.restore_params(
                    params, args.ckpt)
                print(f"serve: loaded {len(loaded)} tensors "
                      f"({len(skipped)} skipped) from {args.ckpt}")
            else:
                print("serve: WARNING — no --ckpt, classifying with random "
                      "weights (smoke-test mode)")
        self.params = params

        self.mesh = None
        if args.mesh:
            from ..parallel import mesh as M

            self.mesh = M.make_mesh(args.mesh)
            print(f"serve: chunks shard over {dict(self.mesh.shape)}")

        # int8 calibrates lazily on the first slide's eval tiles — a
        # daemon has no cohort upfront (the classify driver's --int8
        # calibrates eagerly on the dataset instead)
        self._transform_extract = None
        self._int8_extractor = None
        self._int8_pending = bool(args.int8)
        self._binfer = None  # (extractor, jitted batched fn) for --batch

        # per-name failure tracking (in-memory): after MAX_ATTEMPTS a
        # name backs off for GIVEUP_BACKOFF_SECS instead of burning a
        # rebuild attempt every poll — but it is never abandoned forever,
        # so a transient device/tunnel outage self-heals without a
        # restart. name -> [count, last_failure_ts]
        self.attempts = {}

        self.processed = set()
        if os.path.isfile(self.processed_path):
            with open(self.processed_path) as f:
                self.processed = {ln.strip() for ln in f if ln.strip()}
        if not os.path.isfile(self.results_path):
            with open(self.results_path, "w") as f:
                f.write(CSV_HEADER)
        else:
            # reconcile: a crash between the results.csv append and the
            # processed.txt marker would otherwise re-classify that slide
            # on restart and leave a duplicate CSV row — a name with a
            # results row has all its artifacts (.dla maps are written
            # before the row), so adopt it as processed
            with open(self.results_path) as f:
                in_csv = {ln.split(",", 1)[0]
                          for ln in f.read().splitlines()[1:] if ln}
            for name in sorted(in_csv - self.processed):
                print(f"serve: reconciled {name} (results row present, "
                      "marker missing)")
                self._mark_processed(name)

    # ------------------------------------------------------------------
    def _ensure_int8(self, builder):
        if not self._int8_pending:
            return
        from ..ops import quant

        # capped mmap'd load — never materializes an oversized slide's
        # full eval bag for 256 calibration tiles; a tile-less first
        # slide returns None and calibration stays pending for the next
        # one (zeros would floor every activation scale)
        calib = quant.calib_tiles_from_builder(
            builder, max(int(self.args.int8_calib), 1),
            self.args.resolution)
        if calib is None:
            print(f"serve: int8 calibration deferred — "
                  f"{builder.getname()} has no tiles")
            return
        qp_sc = quant.quantize_and_calibrate(self.params["cnn"], calib)
        self._transform_extract = quant.make_int8_transform_extract(
            self.params["cnn"], calib, self.args.resolution, qp_sc=qp_sc)
        self._int8_extractor = quant.make_int8_extractor(
            self.params["cnn"], calib, qp_sc=qp_sc)
        self._int8_pending = False
        print(f"serve: int8 W8A8 extractor armed "
              f"({int(calib.shape[0])} calibration tiles from "
              f"{builder.getname()})")

    def _mark_processed(self, name: str):
        self.attempts.pop(name, None)
        self.processed.add(name)
        with open(self.processed_path, "a") as f:
            f.write(name + "\n")
            f.flush()
            os.fsync(f.fileno())

    # ------------------------------------------------------------------
    MAX_ATTEMPTS = 3
    GIVEUP_BACKOFF_SECS = 300.0

    def _make_builder(self, path: str) -> RoiBuilder:
        params = {"roi_size": self.args.roi_size} if self.args.roi_size \
            else {}
        return RoiBuilder(path, params)

    def process(self, path: str, builder: RoiBuilder | None = None
                ) -> bool | None:
        """Classify one slide. True = classified, False = failed (cache
        build), None = already processed (skip, not a failure)."""
        t0 = time.perf_counter()
        builder = builder or self._make_builder(path)
        name = builder.getname()
        if name in self.processed:  # belt-and-braces vs pending() races
            return None  # skip: neither processed nor failed
        if "MISSING" in builder.params["status"]:
            if not builder.build():
                print(f"serve: {name}: cache build failed — skipped",
                      file=sys.stderr)
                return False
        builder.update_resolution_and_buffer(self.args.resolution)
        if self.bundle is not None:
            # AOT mode: the exported programs have no zero-bag fallback
            # (that path needs the one-pass forward) — fail loudly, the
            # retry/backoff machinery reports it like any bad slide
            if builder.getsize() == 0:
                print(f"serve: {name}: tile-less slide — AOT bundles "
                      "serve tiled slides only, skipped", file=sys.stderr)
                return False
            probs, outs, raster = self.bundle.classify_builder(builder)
        else:
            self._ensure_int8(builder)
            probs, outs, raster = inference.classify_slide_streaming(
                self.params, self.cfg, builder,
                resolution=self.args.resolution, chunk=self.args.chunk,
                compute_dtype=self.compute_dtype, mesh=self.mesh,
                transform_extract=self._transform_extract)
        T = raster.shape[0]
        helpers.write_map(builder.getmeta(), 0, np.asarray(raster),
                          np.asarray(outs["Aterm"])[:, :T],
                          output_dir=self.args.out_root)
        secs = time.perf_counter() - t0
        with open(self.results_path, "a") as f:
            f.write("{0},{1},{2},{3},{4},{5},{6},{7:.3f}\n".format(
                name, *[f"{p:.6f}" for p in probs[:3]],
                int(outs["y_pred_hat"]), float(outs["Aterm_var"]),
                builder.getsize(), secs))
            f.flush()
        self._mark_processed(name)
        print(f"serve: {name}: probs={np.round(probs, 4)} "
              f"pred={int(outs['y_pred_hat'])} "
              f"({builder.getsize()} tiles, {secs:.2f}s)")
        return True

    # ------------------------------------------------------------------
    def _get_batched_infer(self):
        """Jitted batched forward, rebuilt only when the extractor
        changes (e.g. int8 arms after the first real slide). The eval
        transform is fused into the program (transform_resolution) so the
        group ships RAW uint8 — 4x less H2D than staging f32 eval bags
        through the host, same economics as the streaming path."""
        ex = self._int8_extractor
        if self._binfer is None or self._binfer[0] is not ex:
            self._binfer = (ex, inference.make_batched_infer(
                self.cfg, self.mesh, compute_dtype=self.compute_dtype,
                extractor=ex,
                transform_resolution=self.args.resolution))
        return self._binfer[1]

    def process_group(self, builders) -> int:
        """--batch: several small slides through ONE batched forward
        (pads each bag to the group's bucket; amortizes per-dispatch
        overhead). Same artifacts per slide as the streaming path."""
        from ..data.roibuilder import EMPTY_BAG_TILES

        t0 = time.perf_counter()
        if self._int8_pending:
            armed_on = next((b for b in builders if b.getsize() > 0), None)
            if armed_on is not None:
                self._ensure_int8(armed_on)
        bags, rasters = [], []
        for b in builders:
            raw, coords = b._load_cache(with_coords=True, mmap=True)
            if raw.shape[0] == 0:  # unreachable: the batch router sends
                # tile-less slides to the serial path; belt vs a cache
                # emptied between routing and here
                rs = b.params["roi_size"]
                raw = np.zeros((EMPTY_BAG_TILES, rs, rs, 3), np.uint8)
                coords = np.zeros((0, 2), np.int64)
            bags.append(np.asarray(raw))
            rasters.append(np.asarray(coords))
        probs, outs = inference.classify_slides_batched(
            self.params, self.cfg, bags, mesh=self.mesh,
            compute_dtype=self.compute_dtype,
            infer_fn=self._get_batched_infer())
        Aterm = np.asarray(outs["Aterm"])
        avar = np.asarray(outs["Aterm_var"]).ravel()
        preds = np.asarray(outs["y_pred_hat"]).ravel()
        secs = (time.perf_counter() - t0) / max(len(builders), 1)
        n_done = 0
        for i, b in enumerate(builders):
            if b.getname() in self.processed:
                continue  # a retried group where this member already won
            T = rasters[i].shape[0]
            helpers.write_map(b.getmeta(), 0, rasters[i], Aterm[i][:, :T],
                              output_dir=self.args.out_root)
            with open(self.results_path, "a") as f:
                f.write("{0},{1},{2},{3},{4},{5},{6},{7:.3f}\n".format(
                    b.getname(), *[f"{p:.6f}" for p in probs[i, :3]],
                    int(preds[i]), float(avar[i]), b.getsize(), secs))
                f.flush()
            self._mark_processed(b.getname())
            print(f"serve: {b.getname()}: probs={np.round(probs[i], 4)} "
                  f"pred={int(preds[i])} ({b.getsize()} tiles, batched "
                  f"x{len(builders)}, {secs:.2f}s/slide)")
            n_done += 1
        return n_done

    # ------------------------------------------------------------------
    def pending(self):
        """Slide paths not yet processed, oldest first."""
        if self.args.watch_dir:
            paths = [p for p in globmod.glob(
                os.path.join(self.args.watch_dir, "*"))
                if p.lower().endswith(SLIDE_EXTS)]
        else:
            paths = []
            if os.path.isfile(self.args.manifest):
                with open(self.args.manifest) as f:
                    paths = [ln.strip() for ln in f if ln.strip()
                             and not ln.startswith("#")]
        now = time.time()
        by_name = {}
        for p in paths:
            name = os.path.split(p)[1].split(".")[0]
            if name in self.processed:
                continue
            count, last_ts = self.attempts.get(name, (0, 0.0))
            if (count >= self.MAX_ATTEMPTS
                    and now - last_ts < self.GIVEUP_BACKOFF_SECS):
                continue  # backing off; retried after the window
            try:  # files can vanish between the glob and the stat
                # (atomic-rename upload tooling) — skip, next poll decides
                mtime = os.path.getmtime(p)
            except OSError:
                continue
            if now - mtime < self.args.settle_secs:
                continue  # likely mid-upload; next poll gets it
            # one entry per basename (RoiBuilder keys caches on it):
            # slide.svs + slide.tif in one batch would double-process;
            # keep the oldest and let the marker suppress the other
            if name not in by_name or mtime < by_name[name][0]:
                by_name[name] = (mtime, p)
        return [p for _, p in sorted(by_name.values())]

    def _note_failure(self, name, err=None):
        if err is not None:
            print(f"serve: ERROR on {name}: {err}", file=sys.stderr)
        count = self.attempts.get(name, (0, 0.0))[0] + 1
        self.attempts[name] = (count, time.time())
        if count >= self.MAX_ATTEMPTS:
            print(f"serve: backing off {name} for "
                  f"{self.GIVEUP_BACKOFF_SECS:.0f}s after {count} "
                  "failures", file=sys.stderr)

    def _prepare(self, path):
        """Host-side prep for ONE slide: builder construction, cache
        build (decode + tissue filter), transform arming, and a kernel
        readahead hint on the raw cache. Under ``--io_depth`` this runs
        on the prefetch producer thread, overlapping the NEXT slide's
        IO with the CURRENT slide's device compute — so it must not
        write daemon state (it only reads ``self.processed``, which the
        consumer re-checks before any artifact write). Returns
        ``(path, name, builder, err)``; builder None with err None
        means 'already processed, skip'."""
        name = os.path.split(path)[1].split(".")[0]
        try:
            builder = self._make_builder(path)
            if builder.getname() in self.processed:
                return path, name, None, None
            if ("MISSING" in builder.params["status"]
                    and not builder.build()):
                return path, name, None, RuntimeError("cache build failed")
            builder.update_resolution_and_buffer(self.args.resolution)
            builder.readahead()
            return path, name, builder, None
        except Exception as e:
            return path, name, None, e

    def _drain(self, paths):
        """Process one poll's backlog; returns (classified, failed).

        With ``--io_depth N`` the per-slide host prep (``_prepare``)
        runs up to N slides ahead on a background thread
        (data.loader.prefetch_iter) while the device classifies the
        current slide; results land in backlog order either way."""
        done = failed = 0
        group = []  # small builders awaiting a batched forward

        def flush():
            nonlocal done, failed
            while group:
                g = group[: max(self.args.batch, 1)]
                del group[: max(self.args.batch, 1)]
                try:
                    done += self.process_group(g)
                except Exception as e:
                    # one poison slide must not burn its batch-mates'
                    # retry budget: fall back to per-member streaming so
                    # only the actual offender accrues a failure
                    print(f"serve: batched group failed ({e}); "
                          "retrying members individually", file=sys.stderr)
                    for b in g:
                        try:
                            ok = self.process(b.params["fullpath"],
                                              builder=b)
                            if ok is None:
                                continue
                            done += ok
                            if not ok:
                                failed += 1
                                self._note_failure(b.getname())
                        except Exception as e2:
                            failed += 1
                            self._note_failure(b.getname(), e2)

        items = map(self._prepare, paths)
        if self.args.io_depth > 0:
            from ..data.loader import prefetch_iter

            items = prefetch_iter(items, depth=self.args.io_depth)
        for path, name, builder, err in items:
            if self._stop_event.is_set():
                # leave the rest of the backlog for the next start;
                # the queued small-slide group below still flushes (its
                # members are already prepared and device work is fast)
                print("serve: stop requested — abandoning remaining "
                      "backlog after the in-flight work", flush=True)
                break
            if err is not None:  # construction or cache build failed
                failed += 1
                self._note_failure(name, err)
                continue
            if builder is None:
                continue  # already processed
            # route small slides into the batch, big ones to streaming.
            # strictly positive: tile-less slides go through the serial
            # path, whose empty fallback matches the validation forward
            # exactly (f32 zero bag) — the batched program's fused
            # transform would normalize a uint8 zero bag to -1.0 and
            # disagree
            if (self.args.batch > 1
                    and 0 < builder.getsize() <= self.args.batch_tile_cap):
                group.append(builder)
                if len(group) >= self.args.batch:
                    flush()
                continue
            try:  # serial path: streaming (exact for any size); reuses
                # the builder _prepare already constructed and armed
                ok = self.process(path, builder=builder)
                if ok is None:
                    continue
                done += ok
                if not ok:
                    failed += 1
                    self._note_failure(name)
            except Exception as e:  # one bad slide must not kill the
                # daemon; it is NOT marked processed, so a fixed file
                # (or fixed code, or a restart) retries it
                failed += 1
                self._note_failure(name, e)
        flush()  # tail group below the batch size
        return done, failed

    def prewarm(self):
        """Compile the bucket-ladder programs up-front (--prewarm)."""
        tiles = self.args.prewarm
        if not tiles:
            return
        import jax

        if self.bundle is not None:
            # AOT mode: deserialized programs still lower+compile on
            # their first .call — warm every program in the bundle with
            # zeros so slide 1 pays compute, not compile
            t0 = time.perf_counter()
            roi = self.args.roi_size
            cnn = self.bundle.params["cnn"]
            for b, prog in self.bundle._extract.items():
                jax.block_until_ready(
                    prog.call(cnn, np.zeros((b, roi, roi, 3), np.uint8)))
            L = int(self.bundle.manifest["feature_dim"])
            for t, prog in self.bundle._pool.items():
                jax.block_until_ready(
                    prog.call(self.bundle.params,
                              jnp.zeros((t, L)), jnp.int32(t)))
            print(f"serve: prewarm done (bundle: "
                  f"{len(self.bundle._extract)} extractor + "
                  f"{len(self.bundle._pool)} pool programs, "
                  f"{time.perf_counter() - t0:.1f}s)", flush=True)
            return

        from ..data.roibuilder import ROI_SIZE

        roi = self.args.roi_size or ROI_SIZE
        n_dev = int(self.mesh.devices.size) if self.mesh is not None else 1
        t0 = time.perf_counter()
        # THE shared enumeration (parallel/inference.py) — same arithmetic
        # deploy-bundle export uses, so prewarm/export/request-path shapes
        # cannot drift apart
        chunk_shapes, pool_buckets = inference.streaming_program_shapes(
            self.args.chunk, tiles, n_dev)

        # streaming extractor: one program per chunk shape the streaming
        # loop can mint — ladder buckets below --chunk (small slides
        # clamp to their bucket) PLUS the effective --chunk itself (the
        # workhorse shape for every slide bigger than it, mesh-rounded
        # exactly like classify_slide_streaming). Skipped under --int8:
        # that mode always runs the caller-supplied int8 per-chunk
        # program, which can only compile after first-slide calibration.
        chunk_buckets = []
        if self.args.int8:
            print("serve: prewarm skips the extractor ladder under "
                  "--int8 (programs compile after calibration)",
                  flush=True)
        else:
            extract = inference._cached_transform_extract(
                self.cfg, self.compute_dtype, self.args.resolution)
            cnn = self.params["cnn"]
            sharding = None
            if self.mesh is not None:
                from ..parallel import mesh as M

                cnn = inference._replicated_tree(cnn, self.mesh)
                sharding = M.tile_stream_sharding(self.mesh)
            # exactly the shapes classify_slide_streaming mints for
            # T <= TILES (a 3000-tile slide under --chunk 4096 streams at
            # chunk 3072, which only the granule candidates produce)
            chunk_buckets = chunk_shapes
            for b in chunk_buckets:
                part = np.zeros((b, roi, roi, 3), np.uint8)
                part = (jax.device_put(part, sharding)
                        if sharding is not None else jnp.asarray(part))
                jax.block_until_ready(extract(cnn, part))
                print(f"serve: prewarmed extractor chunk={b}", flush=True)

        # masked pool: one program per slide-size bucket — ladder buckets
        # plus every 1024-granule up to TILES (slides above 2560 tiles
        # pool at granule-rounded sizes; see data.loader.bucket_for)
        pool = inference._cached_pool(self.cfg)
        for b in pool_buckets:
            jax.block_until_ready(
                pool(self.params, jnp.zeros((b, self.cfg.L)), jnp.int32(b)))
        # the small post-pool host ops (softmax/argmax on [1, K]) also
        # compile on first dispatch — warm them so slide 1 is pure compute
        probs = jax.nn.softmax(jnp.zeros((1, self.cfg.K)), axis=1)
        jax.block_until_ready(jnp.argmax(probs))
        print(f"serve: prewarm done ({len(chunk_buckets)} extractor + "
              f"{len(pool_buckets)} pool programs, "
              f"{time.perf_counter() - t0:.1f}s)", flush=True)

    def request_stop(self):
        """Ask the drain loop to exit after the in-flight slide (signal-
        handler and thread safe; idempotent)."""
        if not self._stop_event.is_set():
            self._stop_event.set()
            print("serve: SIGTERM/stop — finishing the in-flight slide, "
                  "then exiting; restart resumes the backlog", flush=True)

    def run(self) -> int:
        self.prewarm()
        n_total, n_failed = 0, 0
        while True:
            done, failed = self._drain(self.pending())
            n_total += done
            n_failed += failed
            if self._stop_event.is_set():
                print(f"serve: stopped gracefully ({n_total} slides, "
                      f"{n_failed} failed) — state is durable, restart "
                      f"resumes")
                return 0
            if self.args.once:
                print(f"serve: backlog drained ({n_total} slides, "
                      f"{n_failed} failed) — exiting (--once)")
                return 0 if n_failed == 0 else 1
            # interruptible poll: a stop during the idle wait exits
            # immediately instead of after up to poll_secs
            self._stop_event.wait(timeout=self.args.poll_secs)


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    print(args)
    from ..utils import compcache

    compcache.enable()
    server = SlideServer(args)
    import signal

    try:
        # supervisors (systemd/k8s) stop with SIGTERM: drain the slide
        # in flight, record it, exit 0 — not a mid-slide kill
        prev = signal.signal(signal.SIGTERM,
                             lambda s, f: server.request_stop())
    except ValueError:  # not the main thread (in-process callers/tests)
        prev = None
    try:
        return server.run()
    except KeyboardInterrupt:
        print("serve: interrupted — state is durable, restart resumes")
        return 0
    finally:
        if prev is not None:
            signal.signal(signal.SIGTERM, prev)


if __name__ == "__main__":
    sys.exit(main())
