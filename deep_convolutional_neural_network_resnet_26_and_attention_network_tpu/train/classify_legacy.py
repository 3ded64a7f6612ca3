"""Legacy GAN-discriminator classifier driver — the runnable shim for the
reference's stale ``gbm/classify.py``.

The reference's legacy driver (reference: gbm/classify.py:37-65 flags,
:33 ``disc_cutoff=6``, :116 ``classifier(x, y, step_input=disc_cutoff)``,
:207-225 ``write_map`` .dla export, :21,32,326 TensorBoard) trained the
attention head on features from a pretrained StyleGAN discriminator
truncated at ``disc_cutoff`` blocks. That script no longer runs against the
repo it ships in (SURVEY §0); this shim wires the same capability — frozen
discriminator feature extraction, per-group learning rates
(gbm/classify.py:368-373), 4-bag gradient accumulation of
``w1*loss + w2*entropy`` (:300-331), per-epoch ``train_step-NNN.model``
checkpoints (:349-355), classification reports, and the test-mode
caMicroscope manifests + ``.dla`` attention maps (:163-225) — against the
current data stack, as one runnable CLI.

Deviations (documented in PARITY.md): the extractor is frozen (the
reference backpropped into its small trailing CNN; its 20x ``cnn`` LR
group is therefore inert here), and the legacy "entropy" regularizer maps
to the KLD term our head already computes.
"""

import argparse
import math
import os
import sys
import time
from datetime import datetime

import numpy as np

import jax
import jax.numpy as jnp

from ..data.dataset import GHPSingleBagDatasetSimple
from ..data.loader import sample_data
from ..models import attention_mil as amil
from ..models import blocks, disc_extractor
from ..models import stylegan as sg
from ..parallel import steps
from ..utils import helpers
from . import DIVERGED_EXIT, Diverged, PreemptionLatch, checkpoint, gan

# per-group LR multipliers (reference: gbm/classify.py:368-373); "cnn" is
# inert here because the discriminator extractor is frozen
LR_MULTS = {"cnn": 20.0, "attention": 2.0}


def build_argparser():
    p = argparse.ArgumentParser(
        description="Attention classifier for WSI images using partial "
                    "GAN-trained discriminator reduction (legacy driver)")
    # the reference's own flags (gbm/classify.py:37-65)
    p.add_argument("--lr", default=0.001, type=float)
    p.add_argument("--ckpt", default=None, type=str,
                   help="load classifier head from a previous checkpoint")
    p.add_argument("--epoch_start", default=0, type=int)
    p.add_argument("--epoch_end", default=40, type=int)
    p.add_argument("--no_from_rgb_activate", action="store_true")
    p.add_argument("--transfer", action="store_true",
                   help="re-initialize every linear layer of the head")
    p.add_argument("--test_only", action="store_true")
    # configuration the reference hardcoded
    p.add_argument("--gan_ckpt", default=None, type=str,
                   help="5-part GAN checkpoint; its discriminator becomes "
                        "the frozen feature extractor (random init if unset)")
    p.add_argument("--disc_cutoff", default=disc_extractor.DISC_CUTOFF,
                   type=int)
    p.add_argument("--width_mult", default=1.0, type=float,
                   help="discriminator width multiplier (match the GAN run)")
    p.add_argument("--resolution", default=128, type=int,
                   help="tile resolution; sets the discriminator entry step")
    p.add_argument("--accum", default=4, type=int)
    p.add_argument("--w1", default=1.0, type=float)
    p.add_argument("--w2", default=2.0, type=float)
    p.add_argument("--data_root", default="/raid/GHP Immunohistochemistry/")
    p.add_argument("--image_dir", default="All_HE_scans_GBM_AN")
    p.add_argument("--label_sheet", default=None)
    p.add_argument("--split_ckpt", default=None)
    p.add_argument("--output_root", default=".")
    p.add_argument("--roi_size", default=None, type=int)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--f32", action="store_true")
    p.add_argument("--tensorboard", action="store_true")
    return p


def _load_discriminator(args, key):
    disc = sg.init_discriminator(key, width_mult=args.width_mult)
    if args.gan_ckpt:
        with np.load(args.gan_ckpt, allow_pickle=False) as z:
            blob = {k: z[k] for k in z.files}
        disc, loaded, total = gan.restore_section(disc, blob,
                                                  "discriminator")
        print(f"Loaded discriminator from {args.gan_ckpt}: "
              f"{loaded}/{total} tensors")
        if loaded < total:
            print(f"WARNING: {total - loaded} discriminator tensors missing "
                  "or shape-mismatched (check --width_mult matches the GAN "
                  "run); those layers keep RANDOM init weights")
    else:
        print("WARNING: no --gan_ckpt; extractor uses random discriminator "
              "weights (smoke/e2e use only)")
    return disc


def _make_fns(cfg, extractor, args, compute_dtype):
    """Jitted grad / eval closures over the frozen extractor."""

    def grad_fn(params, tiles, mask, label, rng):
        def loss_fn(p):
            outs = amil.apply_attention_mil(
                p, tiles, label, cfg, mask=mask, train=True, rng=rng,
                compute_dtype=compute_dtype, extractor=extractor)
            # TOTAL_LOSS = w1*loss + w2*entropy (gbm/classify.py:300,325);
            # the legacy entropy regularizer maps to our KLD term
            return args.w1 * outs["loss"] + args.w2 * outs["KLD"], outs

        (_, outs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return outs, grads

    def eval_fn(params, tiles, mask, label):
        return amil.apply_attention_mil(
            params, tiles, label, cfg, mask=mask, train=False,
            compute_dtype=compute_dtype, extractor=extractor)

    tx = steps.make_optimizer_legacy()

    def apply_fn(state, grads, lr):
        updates, opt_state = tx.update(grads, state.opt_state, state.params)

        def scale(path, u):
            mult = LR_MULTS.get(getattr(path[0], "key", None), 1.0)
            return -lr * mult * u

        updates = jax.tree_util.tree_map_with_path(scale, updates)
        import optax

        params = optax.apply_updates(state.params, updates)
        return steps.TrainState(params, opt_state, state.step + 1)

    return jax.jit(grad_fn), jax.jit(eval_fn), jax.jit(apply_fn), tx


def _classification_report(labels, predictions):
    target_names = ["A", "B", "C"]
    try:
        from sklearn.metrics import classification_report

        print(classification_report(labels, predictions,
                                    target_names=target_names,
                                    labels=[0, 1, 2], zero_division=0))
    except Exception:
        acc = float(np.mean(np.asarray(labels) == np.asarray(predictions)))
        print(f"accuracy: {acc:.3f} ({len(labels)} slides)")


def train_epoch(args, epoch, dataset, state, fns, writer, global_steps):
    grad_fn, _, apply_fn, _ = fns
    print(f"===> TRAIN: Epoch, w1, w2 = {epoch} {args.w1} {args.w2}")
    dataset.train()
    # the live driver's bit-exact-resume recipe (classify.py::epoch_key):
    # every stochastic stream of epoch E derives from (seed, E)
    if hasattr(dataset, "reseed_augment"):
        dataset.reseed_augment(args.seed, epoch)
    from ..data.loader import epoch_loader_seed

    loader = sample_data(dataset, image_size=args.resolution, shuffle=True,
                         seed=epoch_loader_seed(args.seed, epoch))
    ekey = jax.random.fold_in(jax.random.PRNGKey(args.seed), epoch)
    accumulate = steps.make_accumulate()
    grad_acc = steps.zeros_like_grads(state.params)
    count, preds, labels = 0, [], []
    losses = []
    for tiles, mask, label in loader:
        rng = jax.random.fold_in(ekey, len(labels))
        outs, grads = grad_fn(state.params, tiles, mask, jnp.int32(label),
                              rng)
        grad_acc = accumulate(grad_acc, grads)
        preds.append(int(outs["y_pred_hat"]))
        labels.append(int(label))
        losses.append(outs["loss"])
        count += 1
        if count >= args.accum:
            state = apply_fn(state, grad_acc, jnp.float32(args.lr))
            grad_acc = steps.zeros_like_grads(state.params)
            count = 0
            global_steps += 1
            if global_steps % 5 == 0:
                helpers.plot_layer_summary(
                    state.params,
                    os.path.join(args.output_dir,
                                 f"layer_summary-{global_steps:05d}.png"))
    if count:
        # step on the leftover partial window rather than dropping it —
        # same tail policy as the main driver (PARITY.md deviation #1)
        state = apply_fn(state, grad_acc, jnp.float32(args.lr))
        global_steps += 1
    loss = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")
    err = float(np.mean(np.asarray(preds) != np.asarray(labels))) if labels \
        else float("nan")
    print(f"Epoch {epoch}: train loss {loss:.4f}, error {100 * err:.2f}%")
    if writer is not None:
        writer.log_epoch(epoch, {"train_loss": loss, "train_error": err})
    _classification_report(labels, preds)
    if losses and not math.isfinite(loss):
        # failure detection (same contract as the main driver): halt
        # WITHOUT checkpointing the diverged epoch so the newest
        # checkpoint stays a healthy resume point
        raise Diverged(
            f"non-finite training loss ({loss}) at epoch {epoch}; "
            "halted without checkpointing — resume from the previous "
            "epoch's checkpoint")
    # optimizer state included (reference saved both, gbm/classify.py:
    # 349-355) — required for the bit-exact resume guarantee
    checkpoint.save(
        os.path.join(args.output_dir, f"train_step-{epoch:03d}.model"),
        state.params, state.opt_state, extra={"epoch": np.int64(epoch)})
    return state, global_steps


def validate(args, epoch, dataset, state, fns, writer):
    _, eval_fn, _, _ = fns
    print(f"===> VALIDATION: Epoch = {epoch}")
    dataset.eval()
    loader = sample_data(dataset, image_size=args.resolution, shuffle=False)
    preds, labels = [], []
    for tiles, mask, label in loader:
        outs = eval_fn(state.params, tiles, mask, jnp.int32(label))
        preds.append(int(outs["y_pred_hat"]))
        labels.append(int(label))
    _classification_report(labels, preds)
    if writer is not None and labels:
        acc = float(np.mean(np.asarray(preds) == np.asarray(labels)))
        writer.log_epoch(epoch, {"valid_acc": acc})


def test(args, epoch, dataset, state, fns):
    """caMicroscope export pass (reference: gbm/classify.py:147-205):
    manifests, the image move script, and per-slide .dla attention maps."""
    _, eval_fn, _, _ = fns
    print(f"===> TEST: Epoch = {epoch}")
    dataset.interface()
    loader = sample_data(dataset, image_size=args.resolution, shuffle=False)
    out = args.output_dir
    preds, labels = [], []
    with open(os.path.join(out, "move_images.sh"), "w") as f_mv, \
            open(os.path.join(out, "manifest_image.csv"), "w") as f_img, \
            open(os.path.join(out, "manifest_heat.csv"), "w") as f_heat:
        f_img.write("path,studyid,clinicaltrialsubjectid,imageid\n")
        f_heat.write("path,studyid,clinicaltrialsubjectid,imageid\n")
        # the reference skipped openslide-ineligible slides here
        # (gbm/classify.py:177); like the main driver's interface mode we
        # classify every slide and record eligibility in the manifest
        for tiles, mask, label, coords, meta in loader:
            outs = eval_fn(state.params, tiles, mask, jnp.int32(label))
            T = coords.shape[0]
            f_img.write("{0},{1},{2},{2}\n".format(
                meta.get("camic_id", meta["basename"]),
                meta.get("studyid", "gmb-id-nn"), meta["basename"]))
            f_mv.write(f"cp '{meta.get('fullpath', meta['basename'])}' "
                       "./images/gbm_validation_set/\n")
            helpers.write_map(meta, epoch, np.asarray(coords),
                              np.asarray(outs["Aterm"])[:, :T], f_heat, out)
            preds.append(int(outs["y_pred_hat"]))
            labels.append(int(label))
    _classification_report(labels, preds)


def main(argv=None):
    from ..utils import compcache

    compcache.enable()  # persistent XLA cache across runs
    args = build_argparser().parse_args(argv)
    print(args)
    stamp = datetime.now().strftime("%d-%b-%Y-%H-%M-%S")
    sub = ("test_data" if args.test_only
           else f"run_attention_classifier_glioblastoma_{stamp}")
    args.output_dir = os.path.join(args.output_root, sub)
    os.makedirs(args.output_dir, exist_ok=True)

    key = jax.random.PRNGKey(args.seed)
    disc = _load_discriminator(args, key)
    step = int(math.log2(args.resolution)) - 2
    L = disc_extractor.feature_dim(step, cutoff=args.disc_cutoff,
                                   width_mult=args.width_mult)
    extractor = disc_extractor.make_extractor(
        disc, step=step, cutoff=args.disc_cutoff,
        width_mult=args.width_mult,
        from_rgb_activate=not args.no_from_rgb_activate)

    dataset = GHPSingleBagDatasetSimple(
        bag=True, output_dir=args.output_dir, root_dir=args.data_root,
        image_dir=args.image_dir, label_sheet=args.label_sheet,
        roi_size=args.roi_size, seed=args.seed)
    if args.split_ckpt:
        dataset.load_from_checkpoint(args.split_ckpt)
    else:
        dataset.load_new()

    cfg = amil.MILConfig(L=L, class_weights=None)
    params = amil.init_attention_mil(jax.random.fold_in(key, 1), cfg)
    if args.ckpt:
        print("Loading checkpoint!!!")
        params, _, _ = checkpoint.restore_params(params, args.ckpt)
    if args.transfer:
        print("Randomizing Linear Layers!!!")
        params = blocks.reset_linear(params, jax.random.fold_in(key, 2))

    compute_dtype = None if args.f32 else jnp.bfloat16
    fns = _make_fns(cfg, extractor, args, compute_dtype)
    state = steps.init_train_state(params, fns[3])
    if args.ckpt and not args.transfer:
        opt_state, ok = checkpoint.restore_opt_state(state.opt_state,
                                                     args.ckpt)
        if ok:
            state = state._replace(opt_state=opt_state)

    writer = None
    if args.tensorboard:
        from ..utils import tb

        writer = tb.EpochWriter(os.path.join("runs", f"legacy_{stamp}"))

    if args.test_only:
        test(args, args.epoch_start - 1, dataset, state, fns)
        return 0

    global_steps = 0
    latch = PreemptionLatch().install()
    try:
        for epoch in range(args.epoch_start, args.epoch_end):
            state, global_steps = train_epoch(args, epoch, dataset, state,
                                              fns, writer, global_steps)
            validate(args, epoch, dataset, state, fns, writer)
            if latch.stop_requested():
                # train_epoch saved this epoch's checkpoint (sync);
                # same graceful-preemption contract as the main driver
                print(f"train: preempted — stopped after epoch {epoch}")
                break
    except Diverged as e:
        # same supervisor-visible exit contract as the main driver and
        # the GAN trainer: divergence is exit DIVERGED_EXIT, not 0/crash
        print(f"FATAL: {e}", file=sys.stderr)
        return DIVERGED_EXIT
    finally:
        latch.restore()
    return 0


if __name__ == "__main__":
    sys.exit(main())
