"""Attention-MIL training/eval/interface CLI — the live driver.

Mirrors the reference entry point ``gbm/classify_combined.py`` flag-for-flag
(--tag --ckpt --fold --epoch_start --epoch_end --transfer --peak --test_only
--interface; reference: gbm/classify_combined.py:44-87) and artifact-for-
artifact (per-epoch ``train_step-<epoch:03d>.model`` checkpoints,
``*summary.json`` stats, prediction bars, attention heatmap panels,
caMicroscope manifests + ``.dla`` maps), with the compute path rebuilt for
TPU: jitted per-bag forward/grad with static padded buckets, gradient
accumulation over 5 slides (reference: :446-454), the staged LR schedule as
a pure function (reference: :110-138), and all tile-axis math mask-exact.

Dataset roots and the label spreadsheet are flags instead of hardcoded
``/raid`` paths (reference: gbm/GlioblastomaDS.py:52-54).

Run ``python -m deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train.classify --help``.
"""

import argparse
import contextlib
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from sklearn.metrics import classification_report

from ..data import dataset as ds_mod
from ..data.loader import sample_data
from ..models import attention_mil as amil
from ..parallel import steps
from ..utils import helpers, plots, profiling
from . import DIVERGED_EXIT, PreemptionLatch, checkpoint, schedule

TARGET_NAMES = ["A", "B", "C"]


def build_argparser():
    p = argparse.ArgumentParser(
        description="Attention-based classifier for WSI images "
                    "(TPU-native attention-MIL)")
    p.add_argument("--tag", default="TEST", type=str, help="Output tag")
    p.add_argument("--ckpt", default=None, type=str,
                   help="load from previous checkpoints")
    p.add_argument("--epoch_start", default=0, type=int)
    p.add_argument("--epoch_end", default=40, type=int)
    p.add_argument("--fold", default=0, type=int,
                   help="Which fold? 0..n_folds-1 selects that KFold fold; "
                        "-1 = the reference's seeded-random middle-fold "
                        "pick; >= n_folds trains on every slide")
    p.add_argument("--transfer", action="store_true",
                   help="Transfer learning: restore ResNet convs only, "
                        "linear layers stay freshly initialized")
    p.add_argument("--peak", action="store_true",
                   help="Inspect weight matrices / activations and exit")
    p.add_argument("--test_only", action="store_true",
                   help="Exit after one validation pass")
    p.add_argument("--interface", action="store_true",
                   help="Run in caMicroscope interface mode")
    # configuration the reference hardcoded
    p.add_argument("--data_root", default="/raid/GHP Immunohistochemistry/")
    p.add_argument("--image_dir", default="All_HE_scans_GBM_AN")
    p.add_argument("--label_sheet", default=None)
    p.add_argument("--split_ckpt", default=None,
                   help="restore a training_validation_testing_data*.json split")
    p.add_argument("--output_root", default=".")
    p.add_argument("--resolution", default=300, type=int)
    p.add_argument("--roi_size", default=None, type=int,
                   help="tile size on the slide (default: RoiBuilder's 1200)")
    p.add_argument("--accum", default=5, type=int,
                   help="gradient-accumulation slides per optimizer step")
    p.add_argument("--workers", default=1, type=int,
                   help="producer threads for the training bag loader "
                        "(the reference's DataLoader num_workers)")
    p.add_argument("--arch", default="full", choices=["full", "tiny"],
                   help="tiny = smoke-test model (CI/CPU)")
    p.add_argument("--stem", default="conv7", choices=["conv7", "s2d"],
                   help="s2d = space-to-depth stem fast path (identical "
                        "math; measured neutral on v5e — PROFILE.md)")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--f32", action="store_true",
                   help="disable bf16 conv/matmul compute")
    p.add_argument("--remat", action="store_true",
                   help="checkpoint resnet blocks to fit large training bags")
    p.add_argument("--n_vis", default=8, type=int,
                   help="slides visualized every 10 epochs")
    p.add_argument("--tensorboard", action="store_true",
                   help="stream epoch stats to runs/TAG_<tag> "
                        "(legacy SummaryWriter parity)")
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler device trace of the first "
                        "trained epoch into <run>/profile/ and merge "
                        "per-step wall-time percentiles into epoch stats")
    p.add_argument("--mesh", default=0, type=int,
                   help="train over an N-device (slides, tiles) mesh: each "
                        "accumulation window of bags becomes one sharded "
                        "batched step (the DataParallel replacement)")
    p.add_argument("--train_pad", default=None, type=int,
                   help="zero-pad margin for the train random-crop jitter "
                        "(default: the reference's 100 px at roi 1200, "
                        "scaled to --roi_size). 0 disables the pad/crop "
                        "augmentation entirely — use when train and eval "
                        "tile distributions must match exactly, e.g. "
                        "synthetic convergence checks where a border-only "
                        "degenerate optimum exists (PROFILE.md)")
    p.add_argument("--stream_tiles", default=4096, type=int,
                   help="slides with more tiles than this stream chunks "
                        "through the extractor in validation/interface "
                        "instead of materializing the padded f32 bag on "
                        "device; lower it on smaller-HBM parts or larger "
                        "resolutions")
    p.add_argument("--int8", action="store_true",
                   help="serve the extractor W8A8 int8-quantized "
                        "(ops/quant.py): per-channel int8 weights + "
                        "activation scales calibrated on cohort tiles. "
                        "Serving-only (--interface / --test_only); measure "
                        "probability drift on your checkpoint first")
    p.add_argument("--int8_calib", default=256, type=int,
                   help="calibration tiles for the --int8 activation scales")
    return p


def make_config(args, class_weights=None) -> amil.MILConfig:
    cw = tuple(class_weights) if class_weights is not None else None
    remat = getattr(args, "remat", False)
    stem = getattr(args, "stem", "conv7")
    if args.arch == "tiny":
        return amil.MILConfig(widths=(8, 8, 8, 8), blocks=(1, 1, 1, 1),
                              class_weights=cw, remat=remat, stem=stem)
    return amil.MILConfig(class_weights=cw, remat=remat, stem=stem)


class Driver:
    """Holds the jitted step functions, state, and output paths."""

    def __init__(self, args, cfg: amil.MILConfig, output_dir: str):
        self.args = args
        self.cfg = cfg
        self.output_dir = output_dir
        self.heat_dir = os.path.join(output_dir, "heatmaps")
        os.makedirs(self.heat_dir, exist_ok=True)
        self.compute_dtype = None if args.f32 else jnp.bfloat16
        self.diverged = False  # set by the non-finite-loss guard
        # per-run streaming threshold (--stream_tiles); the class attribute
        # keeps the pre-flag default for direct Driver construction.
        # `is not None` so --stream_tiles 0 (force-stream every slide)
        # is honored rather than silently falling back to the default
        if getattr(args, "stream_tiles", None) is not None:
            self.interface_stream_tiles = int(args.stream_tiles)

        params = amil.init_attention_mil(jax.random.PRNGKey(args.seed), cfg)
        self.tx = steps.make_optimizer()
        self.state = steps.init_train_state(params, self.tx)
        # per-epoch checkpoint writes (D2H fetch + npz + rename) overlap
        # the next epoch's steps; safe because state pytrees are rebound,
        # never mutated, and the train steps run with donate=False
        self.ckpt_writer = checkpoint.AsyncCheckpointer()

        self.grad_fn = steps.make_bag_grad(cfg, compute_dtype=self.compute_dtype)
        self.fwd_eval = steps.make_bag_forward(cfg, train=False,
                                               compute_dtype=self.compute_dtype)
        self.fwd_train = steps.make_bag_forward(cfg, train=True,
                                                compute_dtype=self.compute_dtype)
        self.accumulate = steps.make_accumulate()
        self.apply_updates = steps.make_apply_updates(self.tx)

        self.mesh = None
        if getattr(args, "mesh", 0):
            from ..parallel import mesh as M

            n = args.mesh
            if len(jax.devices()) < n:
                raise RuntimeError(
                    f"--mesh {n} but only {len(jax.devices())} devices")
            self.mesh = M.make_mesh(n)
            self.tiles_multiple = self.mesh.shape[M.TILES_AXIS]
            self.batched_step = steps.make_train_step(
                cfg, self.tx, compute_dtype=self.compute_dtype, donate=False)
            self.state = steps.replicate_state(self.mesh, self.state)
            print(f"Mesh training over {dict(self.mesh.shape)}")

    def enable_int8(self, builders):
        """Swap the eval + streaming extractor for the W8A8 int8 serving
        path (ops/quant.py): quantize the (restored) cnn weights once,
        calibrate activation scales on real eval-transformed tiles from
        the cohort, and rebuild ``fwd_eval`` and the streaming per-chunk
        program around the quantized forward. Serving-only — the
        quantized closure bakes weights at build time and ignores live
        params, so it is never valid under training."""
        from ..ops import quant

        want = max(int(getattr(self.args, "int8_calib", 256)), 1)
        # capped mmap'd loads: only the leading slice of each raw cache is
        # read+transformed, so an all-oversized cohort never materializes
        # a full 50k-tile eval bag just to keep 256 calibration tiles;
        # tile-less slides are skipped (zeros would floor the scales)
        chunks, n = [], 0
        for b in builders:
            tiles = quant.calib_tiles_from_builder(
                b, want - n, self.args.resolution)
            if tiles is None:
                continue
            chunks.append(np.asarray(tiles))
            n += chunks[-1].shape[0]
            if n >= want:
                break
        if n == 0:
            raise RuntimeError("--int8: no slides with tiles available "
                               "to calibrate on")
        calib = jnp.asarray(np.concatenate(chunks, axis=0))
        cnn = self.state.params["cnn"]
        qp_sc = quant.quantize_and_calibrate(cnn, calib)
        self.fwd_eval = steps.make_bag_forward(
            self.cfg, train=False, compute_dtype=self.compute_dtype,
            extractor=quant.make_int8_extractor(cnn, calib, qp_sc=qp_sc))
        self._int8_transform_extract = quant.make_int8_transform_extract(
            cnn, calib, self.args.resolution, qp_sc=qp_sc)
        print(f"int8: W8A8 extractor armed ({n} calibration tiles)")

    def _halt_non_finite(self, epoch: int, loss_sum: float) -> bool:
        """Failure detection: a NaN/Inf training loss halts the run
        BEFORE checkpointing, so the newest checkpoint on disk stays the
        last healthy epoch and ``--ckpt auto`` resumes from good state.
        (The reference saved whatever the epoch produced,
        gbm/classify_combined.py:468-474 — a diverged run poisoned its
        own resume point.)"""
        print(f"FATAL: non-finite training loss (sum={loss_sum}) at epoch "
              f"{epoch}; halting WITHOUT checkpointing — fix the config "
              "and resume from the last good checkpoint (--ckpt auto)",
              file=sys.stderr)
        self.diverged = True  # main() exits DIVERGED_EXIT, not 0
        try:
            self.ckpt_writer.wait()  # last healthy epoch's write must land
        except Exception as exc:
            # a failed pending write (e.g. ENOSPC) must not mask the
            # divergence diagnosis — the DIVERGED_EXIT contract is what
            # supervisors key on; the newest DURABLE checkpoint is simply
            # one epoch older, which the halt message already covers
            print(f"WARNING: pending checkpoint write also failed: {exc}",
                  file=sys.stderr)
        return False

    def epoch_key(self, epoch: int, *, validate: bool = False):
        """Epoch-derived rng root: every stochastic stream of epoch E is a
        pure function of (seed, E), so a run resumed from the epoch E-1
        checkpoint replays epoch E bit-exactly (the un-resumed run's
        streams do not depend on how many epochs preceded them).
        Validation gets a disjoint domain so its train-mode stochasticity
        (pre-Check stages) never perturbs training streams."""
        base = 1_000_000 + epoch if validate else epoch
        return jax.random.fold_in(jax.random.PRNGKey(self.args.seed), base)

    def loader_seed(self, epoch: int) -> int:
        """Deterministic bag-order seed for epoch E (same property)."""
        from ..data.loader import epoch_loader_seed

        return epoch_loader_seed(self.args.seed, epoch)

    # ------------------------------------------------------------ train
    def train_epoch(self, epoch: int, dataset, epoch_stats: dict):
        stage = schedule.stage_for_epoch(epoch)
        if stage.stop:
            self.ckpt_writer.save(
                checkpoint.checkpoint_path(self.output_dir, epoch, final=True),
                self.state.params)
            self.ckpt_writer.wait()
            print(f"Stage = [Stop]: saved FINAL checkpoint at epoch {epoch}")
            return False
        print(f"===> TRAIN: Epoch = {epoch} "
              f"Stage = [{stage.name}], lr = [{stage.lr}]")

        coefs = np.asarray(amil.gate_coefficients(self.state.params))
        epoch_stats["coef_a1"] = float(coefs[0])
        epoch_stats["coef_a2"] = float(coefs[1])
        epoch_stats["coef_a3"] = float(coefs[2])

        dataset.train()
        if hasattr(dataset, "reseed_augment"):
            dataset.reseed_augment(self.args.seed, epoch)
        if getattr(self.args, "workers", 1) > 1:
            # parallel producers deliver out of order, so per-bag rng keys
            # and window membership vary run-to-run — bit-exact resume
            # holds only for the default single producer
            print("note: --workers > 1 delivers bags out of order; "
                  "bit-exact determinism/resume requires --workers 1")
        loader = sample_data(dataset, image_size=self.args.resolution,
                             shuffle=True, seed=self.loader_seed(epoch),
                             multiple_of=getattr(self, "tiles_multiple", 1),
                             workers=getattr(self.args, "workers", 1))
        ekey = self.epoch_key(epoch)

        if self.mesh is not None:
            return self._train_epoch_mesh(epoch, stage, loader, epoch_stats,
                                          ekey)

        # device-side metric accumulation: scalars stay on device during
        # the epoch and fetch once at the end (each host fetch is a tunnel
        # round trip on remote devices)
        dev_metrics = {k: [] for k in ("loss", "error", "Aterm_mu",
                                       "Aterm_var", "KLD", "l2",
                                       "y_pred_hat")}
        labels = []
        grad_acc = steps.zeros_like_grads(self.state.params)
        batch_count = 0
        n = 0
        t0 = time.time()
        timer = profiling.StepTimer() if getattr(self.args, "profile",
                                                 False) else None
        for tiles, mask, label in loader:
            with (timer.step() if timer is not None
                  else contextlib.nullcontext()):
                outs, grads = self.grad_fn(self.state.params, tiles, mask,
                                           jnp.int32(label),
                                           jax.random.fold_in(ekey, n))
                grad_acc = self.accumulate(grad_acc, grads)
                batch_count += 1
                if batch_count >= self.args.accum:
                    self.state = self.apply_updates(self.state, grad_acc,
                                                    jnp.float32(stage.lr))
                    grad_acc = steps.zeros_like_grads(self.state.params)
                    batch_count = 0

            for k in dev_metrics:
                dev_metrics[k].append(outs[k])
            labels.append(label)
            n += 1
        if batch_count:
            # leftover partial window: step on it rather than dropping the
            # accumulated gradients (the reference's un-zeroed .grad buffers
            # carried this residue into the next epoch; see PARITY.md)
            self.state = self.apply_updates(self.state, grad_acc,
                                            jnp.float32(stage.lr))
        if timer is not None:
            epoch_stats["step_times"] = timer.summary()
        if hasattr(loader, "stall_fraction"):
            epoch_stats["input_stall_fraction"] = loader.stall_fraction()
        fetched = {k: np.asarray(jnp.stack(v)) if v else np.zeros((0,))
                   for k, v in dev_metrics.items()}  # one sync per key
        dt = time.time() - t0
        predictions = [int(p) for p in fetched["y_pred_hat"]]
        sums = dict(loss=float(fetched["loss"].sum()),
                    error=float(fetched["error"].sum()),
                    mu=float(fetched["Aterm_mu"].sum()),
                    var=float(fetched["Aterm_var"].sum()),
                    kld=float(fetched["KLD"].sum()))
        l2 = float(fetched["l2"][-1]) if n else 0.0

        if not np.isfinite(sums["loss"]):
            return self._halt_non_finite(epoch, sums["loss"])
        self.ckpt_writer.save(
            checkpoint.checkpoint_path(self.output_dir, epoch),
            self.state.params, self.state.opt_state)
        n = max(n, 1)
        epoch_stats["train_acc"] = classification_report(
            labels, predictions, labels=[0, 1, 2], target_names=TARGET_NAMES,
            output_dict=True, zero_division=0)
        epoch_stats["train_loss"] = sums["loss"] / n
        epoch_stats["train_wsum"] = sums["mu"] / n
        epoch_stats["train_wvar"] = sums["var"] / n
        epoch_stats["train_cll2"] = l2
        epoch_stats["train_kld"] = sums["kld"] / n
        epoch_stats["train_err"] = sums["error"] / n
        epoch_stats["train_secs"] = dt
        # legacy-generation summary keys: the root plot script reads both
        # unconditionally (plot_gbm_metrics.py:55-56) even though the live
        # reference driver stopped writing them — emit compat values so
        # that script runs unchanged on our run dirs. train_sum = epoch
        # total (un-averaged) loss; model_temp = the legacy Attention
        # temperature default (gbm/classify.py:366, params={'temp': 0.0}).
        epoch_stats["train_sum"] = sums["loss"]
        epoch_stats["model_temp"] = 0.0
        epoch_stats["model_mean_weights"] = \
            helpers.get_layer_weight_summary_mean(self.state.params)
        epoch_stats["model_max_weights"] = \
            helpers.get_layer_weight_summary_max(self.state.params)
        print(f"T: Loss {epoch_stats['train_loss']:.3f}; "
              f"Error {100 * epoch_stats['train_err']:.2f}%; "
              f"{n} slides in {dt:.1f}s")
        return True

    def _train_epoch_mesh(self, epoch, stage, loader, epoch_stats, ekey):
        """Mesh path: each accumulation window of bags runs as ONE sharded
        batched step — grad(sum of window losses) + one Adam update is
        exactly the sequential accumulate-then-step semantics."""
        import numpy as _np

        from ..data.loader import pad_bag
        from ..parallel import steps as S

        dev_metrics = {k: [] for k in ("loss", "error", "Aterm_mu",
                                       "Aterm_var", "KLD", "l2")}
        preds_dev, labels = [], []
        window = []
        n = 0
        t0 = time.time()

        last_real = self.args.accum  # size of the most recent window
        n_windows = 0

        def run_window(bags):
            nonlocal n, last_real, n_windows
            real = last_real = len(bags)
            # pad a partial tail window to the compiled batch size with
            # zero-weight copies: they contribute neither gradients nor
            # metrics, so every slide trains while jit sees one batch shape
            weights = jnp.asarray([1.0] * real + [0.0]
                                  * (self.args.accum - real), jnp.float32)
            bags = bags + [bags[0]] * (self.args.accum - real)
            target = max(b[0].shape[0] for b in bags)
            tiles = jnp.stack([pad_bag(b[0], n_tiles=target)[0]
                               for b in bags])
            masks = jnp.stack([jnp.pad(b[1], (0, target - b[1].shape[0]))
                               for b in bags])
            lbls = jnp.asarray([b[2] for b in bags], jnp.int32)
            s_tiles, s_masks, s_labels = S.shard_batch(
                self.mesh, tiles, masks, lbls)
            with self.mesh:
                self.state, metrics = self.batched_step(
                    self.state, s_tiles, s_masks, s_labels,
                    jnp.float32(stage.lr),
                    jax.random.fold_in(ekey, n_windows), weights)
            n_windows += 1
            for k in dev_metrics:
                # metrics are window means; store window SUMS for the /n
                dev_metrics[k].append(metrics[k] * real)
            preds_dev.append(metrics["y_pred_hat"].reshape(-1)[:real])
            labels.extend(int(b[2]) for b in bags[:real])
            n += real

        timer = profiling.StepTimer() if getattr(self.args, "profile",
                                                 False) else None
        for tiles, mask, label in loader:
            window.append((tiles, mask, label))
            if len(window) >= self.args.accum:
                with (timer.step() if timer is not None
                      else contextlib.nullcontext()):
                    run_window(window)
                window = []
        if window:
            run_window(window)  # partial tail window, zero-weight padded
        if timer is not None:
            epoch_stats["step_times"] = timer.summary()
        if hasattr(loader, "stall_fraction"):
            epoch_stats["input_stall_fraction"] = loader.stall_fraction()

        fetched = {k: _np.asarray(jnp.stack(v)) if v else _np.zeros((0,))
                   for k, v in dev_metrics.items()}
        predictions = ([int(x) for x in _np.asarray(jnp.concatenate(preds_dev))]
                       if preds_dev else [])
        dt = time.time() - t0
        if not _np.isfinite(float(fetched["loss"].sum())):
            return self._halt_non_finite(epoch, float(fetched["loss"].sum()))
        self.ckpt_writer.save(
            checkpoint.checkpoint_path(self.output_dir, epoch),
            self.state.params, self.state.opt_state)
        n = max(n, 1)
        epoch_stats["train_acc"] = classification_report(
            labels, predictions, labels=[0, 1, 2], target_names=TARGET_NAMES,
            output_dict=True, zero_division=0)
        epoch_stats["train_loss"] = float(fetched["loss"].sum()) / n
        epoch_stats["train_wsum"] = float(fetched["Aterm_mu"].sum()) / n
        epoch_stats["train_wvar"] = float(fetched["Aterm_var"].sum()) / n
        # reference keeps the last bag's l2; here the last window's mean
        # (the last window may be a partial zero-weight-padded tail, so
        # divide by its REAL bag count, not args.accum)
        epoch_stats["train_cll2"] = (float(fetched["l2"][-1]) / last_real
                                     if len(fetched["l2"]) else 0.0)
        epoch_stats["train_kld"] = float(fetched["KLD"].sum()) / n
        epoch_stats["train_err"] = float(fetched["error"].sum()) / n
        epoch_stats["train_secs"] = dt
        # legacy compat keys — see the single-device branch for rationale
        epoch_stats["train_sum"] = float(fetched["loss"].sum())
        epoch_stats["model_temp"] = 0.0
        epoch_stats["model_mean_weights"] = \
            helpers.get_layer_weight_summary_mean(self.state.params)
        epoch_stats["model_max_weights"] = \
            helpers.get_layer_weight_summary_max(self.state.params)
        print(f"T[mesh]: Loss {epoch_stats['train_loss']:.3f}; "
              f"Error {100 * epoch_stats['train_err']:.2f}%; "
              f"{n} slides in {dt:.1f}s")
        return True

    # --------------------------------------------------------- validate
    def validate(self, epoch: int, dataset, epoch_stats: dict):
        print(f"===> VALIDATION: Epoch = {epoch}")
        from ..data.loader import pad_bag, prefetch_iter
        from ..parallel import inference

        stage = schedule.stage_for_epoch(epoch, test=True)
        dataset.eval()
        dataset.NewResolution(self.args.resolution)
        dev = {k: [] for k in ("loss", "error", "Aterm_mu", "KLD",
                               "y_pred_hat")}
        predvals_dev, labels = [], []
        n = 0
        n_streamed = 0  # oversized bags routed through eval-mode streaming
        vkey = self.epoch_key(epoch, validate=True)

        def produce():
            # normal bags prepare (cache IO + pad) on a prefetch thread,
            # overlapping the device forward; oversized bags are marked
            # and stream on the consumer side
            for idx, builder in enumerate(dataset.test_slide_builders):
                label = int(dataset.test_slide_record[idx])
                if builder.getsize() > self.interface_stream_tiles:
                    yield "stream", builder, label
                else:
                    yield "bag", pad_bag(builder.get_validation_data()), \
                        label

        for kind, payload, label in prefetch_iter(produce(), depth=2):
            if kind == "stream":
                # oversized bag: exact eval-mode streaming (one chunk +
                # the [T, L] features resident — the padded f32 bag would
                # blow HBM). Pre-Check train-mode stochasticity is skipped
                # for these; the reference would simply OOM here.
                _, souts, _ = inference.classify_slide_streaming(
                    self.state.params, self.cfg, payload,
                    resolution=self.args.resolution,
                    compute_dtype=self.compute_dtype, mesh=self.mesh,
                    transform_extract=getattr(
                        self, "_int8_transform_extract", None))
                outs = inference.streaming_eval_outputs(souts, label,
                                                        self.cfg)
                n_streamed += 1
            else:
                tiles, mask = payload
                # pre-Check stages validate with train-mode stochasticity,
                # exactly like the reference (SetStage(test=True) only
                # switches to eval at epoch >= 150; reference:
                # gbm/classify_combined.py:123-134)
                if stage.train_mode:
                    outs = self.fwd_train(self.state.params, tiles, mask,
                                          jnp.int32(label),
                                          jax.random.fold_in(vkey, n))
                else:
                    outs = self.fwd_eval(self.state.params, tiles, mask,
                                         jnp.int32(label))
            for k in dev:
                dev[k].append(outs[k])
            predvals_dev.append(outs["y_pred"].ravel())
            labels.append(label)
            n += 1
        fetched = {k: np.asarray(jnp.stack(v)) if v else np.zeros((0,))
                   for k, v in dev.items()}
        predictions = [int(p) for p in fetched["y_pred_hat"]]
        predvals = list(np.asarray(jnp.stack(predvals_dev))) if n else []
        sums = dict(loss=float(fetched["loss"].sum()),
                    error=float(fetched["error"].sum()),
                    mu=float(fetched["Aterm_mu"].sum()),
                    kld=float(fetched["KLD"].sum()))
        n = max(n, 1)
        plots.plot_prediction_summary(epoch, self.heat_dir, predvals, labels)
        # <epoch>predictions.json — plot_roc's input artifact (reference:
        # gbm/plot_roc.py:12-38 runs roc_curve on scalar predictions, i.e.
        # binary semantics): score = P(class A), label = 1 iff A
        if predvals:
            plots.save_predictions(
                self.output_dir, epoch,
                [float(np.asarray(p).ravel()[0]) for p in predvals],
                [1.0 if int(l) == 0 else 0.0 for l in labels])
        epoch_stats["valid_acc"] = classification_report(
            labels, predictions, labels=[0, 1, 2], target_names=TARGET_NAMES,
            output_dict=True, zero_division=0)
        epoch_stats["valid_loss"] = sums["loss"] / n
        epoch_stats["valid_err"] = sums["error"] / n
        epoch_stats["valid_wsum"] = sums["mu"] / n
        epoch_stats["valid_kld"] = sums["kld"] / n
        # streamed bags always use eval-mode forward; during pre-Check
        # (train_mode) stages a nonzero count marks this epoch's validation
        # stats as mixed-mode (streamed slides skipped the stochastic path)
        epoch_stats["valid_streamed_bags"] = n_streamed
        # record the SetStage(test=True) eval-mode flip (reference:
        # gbm/classify_combined.py:123-134 — eval only from Check on) so
        # the stage machine's mode transitions are observable in the
        # summary artifacts
        epoch_stats["valid_eval_mode"] = not stage.train_mode
        print(f"V: Loss {epoch_stats['valid_loss']:.3f}; "
              f"Error {100 * epoch_stats['valid_err']:.2f}%")

    # -------------------------------------------------------- visualize
    def visualize(self, epoch: int, sample, mode: str = "Train"):
        """Full-slide inference -> 2x3 attention heatmap panel
        (reference: gbm/classify_combined.py:142-218)."""
        from . import heatmap

        name = mode + "-" + sample.getname()
        data, raster, img_data = sample.get_inference_data()
        from ..data.loader import pad_bag

        tiles, mask = pad_bag(data)
        outs = self.fwd_eval(self.state.params, tiles, mask, jnp.int32(1))
        T = data.shape[0]
        A = np.asarray(outs["wROIs"])[:, :T]
        M = np.asarray(outs["Mterm"])
        F = np.asarray(outs["Fterm"])[:T]
        return heatmap.create_map(
            name, epoch, "Last", img_data, raster, A, F, M,
            roi_size=sample.params["roi_size"], output_dir=self.heat_dir)

    # -------------------------------------------------------- interface
    # above this many tiles, interface mode streams chunks through the
    # extractor instead of materializing the padded f32 bag on device
    # (a 50k-tile slide is ~14 GB as one bag — past HBM; the streaming
    # path keeps only one chunk + the [T, L] features resident)
    interface_stream_tiles = 4096

    def interface(self, epoch: int, dataset):
        """caMicroscope batch-inference mode
        (reference: gbm/classify_combined.py:221-298)."""
        import pandas as pd

        from ..data.loader import pad_bag, prefetch_iter
        from ..parallel import inference

        print("===> INTERFACING TO CAMICROSCOPE")
        dataset.interface()
        dataset.NewResolution(self.args.resolution)
        out = self.output_dir

        def produce():
            # normal slides prepare (cache IO + transform dispatch + pad)
            # on a prefetch thread; oversized slides are marked and
            # stream on the consumer side
            for idx in range(len(dataset)):
                builder = dataset.all_builders[idx]
                if builder.getsize() > self.interface_stream_tiles:
                    yield "stream", builder, None, None
                else:
                    tiles, _, raster, _ = dataset[idx]
                    yield "bag", builder, pad_bag(tiles), raster

        with open(f"{out}/move_images.sh", "w+") as f_tomove, \
                open(f"{out}/manifest_img.csv", "w+") as f_img, \
                open(f"{out}/manifest_heat.csv", "w+") as f_heat:
            f_img.write("path,studyid,clinicaltrialsubjectid,imageid\n")
            f_heat.write("path,studyid,clinicaltrialsubjectid,imageid\n")
            predictions, labels = [], []
            ccls, slide_ebs, l_ntiles = {}, {}, []
            for kind, builder, bag, raster in prefetch_iter(produce(),
                                                            depth=2):
                meta = builder.getmeta()
                label = int(np.asarray(meta["outcome_tensor"]).ravel()[0])
                if kind == "stream":
                    _, outs, raster = inference.classify_slide_streaming(
                        self.state.params, self.cfg, builder,
                        resolution=self.args.resolution,
                        compute_dtype=self.compute_dtype, mesh=self.mesh,
                        transform_extract=getattr(
                            self, "_int8_transform_extract", None))
                    T = raster.shape[0]
                else:
                    tiles, mask = bag
                    outs = self.fwd_eval(self.state.params, tiles, mask,
                                         jnp.int32(label))
                    T = int(np.asarray(mask).sum())
                l_ntiles.append(meta["ntiles"])
                image_name = meta.get("caMIC_image_name", meta["basename"])
                id_name = meta.get("caMIC_id_name", meta["basename"])
                study = meta.get("caMIC_study", "gbm-classif-nn")
                f_img.write(f"{image_name},{study},{id_name},{id_name}\n")
                f_tomove.write(f"cp '{meta['fullpath']}' "
                               f"{out}/gbm_validation_set/\n")
                sample_key = meta.get("Sample Name", meta["basename"])
                ccls[sample_key] = np.append(
                    np.asarray(outs["y_pred"]).ravel(),
                    float(outs["Aterm_var"]))
                slide_ebs[sample_key] = np.append(
                    float(label), np.asarray(outs["Mterm"]).ravel())
                predictions.append(int(outs["y_pred_hat"]))
                labels.append(label)
                print(id_name, "| true:", meta.get("outcome_item", label),
                      "| probs:", np.asarray(outs["y_pred"]).ravel(),
                      "| Avar:", float(outs["Aterm_var"]))
                helpers.write_map(meta, epoch, np.asarray(raster),
                                  np.asarray(outs["Aterm"])[:, :T],
                                  f_heat, out)
        pd.DataFrame.from_dict(ccls, orient="index").to_csv(
            os.path.join(out, "GBMresult_probs_class.csv"))
        pd.DataFrame.from_dict(slide_ebs, orient="index").to_csv(
            os.path.join(out, "GBMdata_slideEBs_class.csv"))
        print("NTILES = ", l_ntiles)
        print(classification_report(labels, predictions, labels=[0, 1, 2],
                                    target_names=TARGET_NAMES,
                                    zero_division=0))

    # ------------------------------------------------------------- peak
    def peak(self, dataset):
        """Weight/activation inspection (reference:
        gbm/classify_combined.py:537-544)."""
        helpers.plot_kernels(self.state.params, self.args.epoch_start, 0,
                             output_dir=self.output_dir)
        dataset.train()
        loader = sample_data(dataset, image_size=self.args.resolution,
                             shuffle=True)
        from ..models import resnet

        for tiles, mask, label in loader:
            # one taps forward feeds both the stats and the grids
            _, acts = resnet.apply_resnet26(
                self.state.params["cnn"], tiles[:8],
                compute_dtype=self.compute_dtype, taps=True)
            summary = helpers.activation_summary(
                self.state.params["cnn"], tiles[:8], acts=acts)
            for layer, stats in summary.items():
                print(f"{layer:10s} {stats}")
            grids = helpers.activation_grids(
                self.state.params["cnn"], tiles[:8], acts=acts)
            for layer, grid in grids.items():
                helpers.plot_activations(
                    grid, os.path.join(self.output_dir,
                                       f"activations-{layer}.png"))
            break


def main(argv=None):
    args = build_argparser().parse_args(argv)
    print(args)
    from ..utils import compcache

    compcache.enable()  # resumed runs skip the multi-minute recompiles

    if args.interface:
        output_dir = os.path.join(args.output_root, "interface_data")
    else:
        output_dir = os.path.join(args.output_root, f"run_{args.tag}")
    os.makedirs(output_dir, exist_ok=True)

    dataset = ds_mod.GHPSingleBagDatasetSimple(
        bag=True, output_dir=output_dir, root_dir=args.data_root,
        image_dir=args.image_dir, label_sheet=args.label_sheet,
        roi_size=args.roi_size, seed=args.seed,
        train_pad=args.train_pad)
    if args.split_ckpt:
        dataset.load_from_checkpoint(args.split_ckpt)
    else:
        dataset.load_new(n_folds=6, n_fold_selection=args.fold)

    class_weights = dataset.GetClassWeights()
    cfg = make_config(args, class_weights)
    driver = Driver(args, cfg, output_dir)

    if args.ckpt == "auto":
        # elastic resume: pick up the newest checkpoint in the run dir
        args.ckpt = checkpoint.latest_checkpoint(output_dir)
        if args.ckpt:
            print(f"Auto-resume from {args.ckpt}")
    if args.ckpt is not None and not os.path.isfile(args.ckpt):
        print(f"error: checkpoint not found: {args.ckpt}", file=sys.stderr)
        return 2
    if args.ckpt is not None:
        params, loaded, skipped = checkpoint.restore_params(
            driver.state.params, args.ckpt, transfer=args.transfer)
        driver.state = driver.state._replace(params=params)
        mode = "ResNet-conv transfer" if args.transfer else "full"
        print(f"Loaded {mode} checkpoint: {len(loaded)} tensors "
              f"({len(skipped)} skipped)")
        if not args.transfer:
            opt_state, ok = checkpoint.restore_opt_state(
                driver.state.opt_state, args.ckpt)
            if ok:
                driver.state = driver.state._replace(opt_state=opt_state)

    if args.int8:
        if not (args.interface or args.test_only):
            print("error: --int8 is a serving path; use it with "
                  "--interface or --test_only", file=sys.stderr)
            return 2
        if (args.test_only
                and schedule.stage_for_epoch(args.epoch_start,
                                             test=True).train_mode):
            # pre-Check stages validate normal bags with train-mode
            # stochasticity (reference parity) — that path keeps the f32
            # extractor, so only streamed oversized bags would quantize
            print("note: --test_only at a pre-Check epoch uses the "
                  "train-mode forward for normal bags; --int8 applies "
                  "only to the eval/streaming paths")
        driver.enable_int8(list(dataset.test_slide_builders)
                           or list(getattr(dataset, "all_builders", [])))

    if args.peak:
        driver.peak(dataset)
        return 0

    if args.epoch_start == 0:
        with open(os.path.join(output_dir, "model_structure.txt"), "w+") as f:
            f.write(helpers.model_summary(driver.state.params))

    # visualization samples: the reference hardcodes 8 demo slides
    # (gbm/classify_combined.py:501-516); here the first test/train slides
    vis_samples = []
    for b, m in list(zip(dataset.test_slide_builders,
                         ["Test"] * len(dataset.test_slide_builders)))[:4] + \
            list(zip(dataset.train_slide_builders,
                     ["Train"] * len(dataset.train_slide_builders)))[:4]:
        vis_samples.append((b, m))
    vis_samples = vis_samples[:args.n_vis]
    for b, _ in vis_samples:  # arm transforms before the first visualize
        b.update_resolution_and_buffer(args.resolution)  # (ref :509-516)

    if args.interface:
        for b, m in vis_samples:
            driver.visualize(0, b, mode=m)
        driver.interface(0, dataset)
        return 0

    if args.test_only:
        epoch_stats = {}
        driver.validate(args.epoch_start, dataset, epoch_stats)
        helpers.savestats(args, output_dir, args.epoch_start, epoch_stats)
        return 0

    tb_writer = None
    if args.tensorboard:
        from ..utils.tb import EpochWriter

        tb_writer = EpochWriter(os.path.join(args.output_root, "runs",
                                             f"TAG_{args.tag}"))

    if vis_samples:
        driver.visualize(0, vis_samples[0][0], mode=vis_samples[0][1])
    latch = PreemptionLatch().install()
    try:
        for ep in range(args.epoch_start, args.epoch_end + 1):
            epoch_stats = {}
            # --profile: device trace of the first trained epoch only —
            # traces grow with wall time, one epoch answers "where do
            # steps go"
            trace_ctx = (profiling.trace(os.path.join(output_dir,
                                                      "profile"))
                         if args.profile and ep == args.epoch_start
                         else contextlib.nullcontext())
            with trace_ctx:
                keep_going = driver.train_epoch(ep, dataset, epoch_stats)
            if not keep_going:
                break  # Stop stage
            if ep % 5 == 0:
                driver.validate(ep, dataset, epoch_stats)
                helpers.savestats(args, output_dir, ep, epoch_stats)
                plots.plot_gbm_metrics(output_dir, args.tag)
            if ep % 10 == 0:
                for b, m in vis_samples:
                    driver.visualize(ep, b, mode=m)
            if tb_writer is not None:
                tb_writer.log_epoch(ep, epoch_stats)
            if latch.stop_requested():
                # epoch ep's checkpoint is already submitted; the wait()
                # below makes it durable before the clean exit
                print(f"train: preempted — stopped after epoch {ep}; "
                      f"resume with --ckpt auto --epoch_start {ep + 1}")
                break
    finally:
        latch.restore()
    if tb_writer is not None:
        tb_writer.close()
    driver.ckpt_writer.wait()  # the last epoch's checkpoint must be durable
    # a halted-on-divergence run must be distinguishable from success to
    # supervisors (the Stop-stage break, by contrast, is a clean finish)
    return DIVERGED_EXIT if driver.diverged else 0


if __name__ == "__main__":
    sys.exit(main())
