"""Progressive-growing WGAN-GP StyleGAN trainer.

Mirrors the reference trainer (reference:
style-based-gan-pytorch-master-512/train.py:1-323): resolution step =
epoch // step_every (4 for the 512 run, 10 for the 256 run), alpha fade-in
by samples seen / phase, per-resolution batch schedule, WGAN-GP loss with
the 0.001 * real^2 drift term and 10x gradient penalty (double
differentiation through the discriminator), n_critic generator cadence,
generator EMA with decay 0.999, style-MLP learning rate x0.01, Adam betas
(0.0, 0.99), and 5-part checkpoints
{generator, discriminator, g_optimizer, d_optimizer, g_running}.

TPU-first: one jitted d_step/g_step per resolution step (static shapes per
step is exactly progressive growing's structure), gradient penalty via
jax.grad-inside-loss (XLA handles the double-backward), EMA as a tree_map.
"""

import argparse
import contextlib as _ctx
import math
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..data.gan_dataset import ImageFolderDataset, MultiResolutionStore
from ..data.loader import prefetch_iter
from ..models import stylegan as sg
from . import DIVERGED_EXIT, Diverged, PreemptionLatch, checkpoint

STEP_BATCH_SIZE = {4: 256, 8: 256, 16: 256, 32: 256, 64: 256, 128: 128,
                   256: 128, 512: 100}  # reference: train.py:61


def make_optimizers(lr: float = 0.001):
    """Adam(0.0, 0.99); the style-MLP group trains at lr*0.01
    (reference: train.py:279-291). ``lr`` is NOT baked into the
    transform — scale_by_adam is scale-free and the steps apply
    -lr*update per call so the per-resolution schedule never retraces;
    the argument exists for signature familiarity only."""
    return optax.scale_by_adam(b1=0.0, b2=0.99)


def style_lr_mask(params_g):
    """1.0 for generator params, 0.01 for mapping-MLP params."""
    return {
        "generator": jax.tree_util.tree_map(lambda _: 1.0,
                                            params_g["generator"]),
        "style": jax.tree_util.tree_map(lambda _: 0.01, params_g["style"]),
    }


def accumulate(ema_params, params, decay: float = 0.999):
    """g_running EMA (reference: train.py:27-32)."""
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params)


def _cast_tree(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating)
        else x, tree)


def make_d_loss(step: int, *, width_mult: float, from_rgb_activate: bool,
                compute_dtype=None, remat: bool = False):
    """Build the WGAN-GP critic loss closure (exposed so tests and
    accumulation paths can differentiate it directly)."""

    def _apply_d(params_d, x, alpha, rng):
        return sg.apply_discriminator(
            params_d, x, step=step, alpha=alpha, width_mult=width_mult,
            from_rgb_activate=from_rgb_activate, train=True, rng=rng,
            remat=remat)

    def d_loss_fn(params_d, params_g, real, zs, sel, alpha, rng):
        if compute_dtype is not None:
            params_d = _cast_tree(params_d, compute_dtype)
            params_g = _cast_tree(params_g, compute_dtype)
            real = real.astype(compute_dtype)
            zs = zs.astype(compute_dtype)
            alpha = jnp.asarray(alpha, compute_dtype)
        r_drop, r_noise, r_eps, r_drop2, r_drop3 = jax.random.split(rng, 5)
        real_predict = _apply_d(params_d, real, alpha, r_drop)
        real_predict = real_predict.astype(jnp.float32)
        real_term = real_predict.mean() - 0.001 * (real_predict ** 2).mean()

        noise = sg.make_noise(r_noise, real.shape[0], step)
        if compute_dtype is not None:
            noise = [n.astype(compute_dtype) for n in noise]
        fake = sg.apply_styled_generator(
            params_g, zs, noise, step=step, alpha=alpha, style_sel=sel,
            width_mult=width_mult)
        fake = jax.lax.stop_gradient(fake)
        fake_predict = _apply_d(params_d, fake, alpha, r_drop2)
        fake_term = fake_predict.astype(jnp.float32).mean()

        # gradient penalty on the real/fake interpolate
        # (reference: train.py:121-132)
        eps = jax.random.uniform(r_eps, (real.shape[0], 1, 1, 1),
                                 dtype=real.dtype)
        x_hat = eps * real + (1 - eps) * fake

        def d_sum(xh):
            return _apply_d(params_d, xh, alpha,
                            r_drop3).astype(jnp.float32).sum()

        grad_x_hat = jax.grad(d_sum)(x_hat).astype(jnp.float32)
        norms = jnp.sqrt(
            (grad_x_hat.reshape(grad_x_hat.shape[0], -1) ** 2).sum(axis=1))
        grad_penalty = 10.0 * ((norms - 1.0) ** 2).mean()

        loss = -real_term + fake_term + grad_penalty
        aux = {"disc_loss": real_term - fake_term,
               "grad_penalty": grad_penalty}
        return loss, aux

    return d_loss_fn


def _microbatch(x, n: int, axis: int = 0):
    """[.., B, ..] -> [n, .., B/n, ..] with the accumulation axis first."""
    if x.shape[axis] % n:
        raise ValueError(
            f"batch {x.shape[axis]} not divisible by grad_accum {n}")
    mb = x.shape[axis] // n
    split = x.reshape(*x.shape[:axis], n, mb, *x.shape[axis + 1:])
    return jnp.moveaxis(split, axis, 0)


def _accum_grads(loss_fn, params, n: int, scan_args, static_args):
    """Average value_and_grad of ``loss_fn`` over ``n`` microbatches via
    lax.scan: peak HBM = ONE microbatch's working set + a params-sized
    accumulator, the single-chip analog of the reference's
    nn.DataParallel per-GPU shares (train.py:61 batch schedule / 4
    GPUs). Exact for every batch-mean loss term incl. the per-sample GP
    norm; minibatch_stddev sees the microbatch — the same statistics the
    reference's per-GPU split produces."""

    def body(carry, xs):
        gacc, aux_acc = carry
        (_, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, *static_args(xs))
        gacc = jax.tree_util.tree_map(jnp.add, gacc, g)
        aux_acc = jax.tree_util.tree_map(jnp.add, aux_acc, aux)
        return (gacc, aux_acc), None

    zeros_g = jax.tree_util.tree_map(jnp.zeros_like, params)
    # trace one microbatch to shape the aux accumulator without running it
    aux0 = jax.eval_shape(
        lambda: loss_fn(params, *static_args(
            jax.tree_util.tree_map(lambda x: x[0], scan_args)))[1])
    zeros_aux = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), aux0)
    (gsum, aux_sum), _ = jax.lax.scan(body, (zeros_g, zeros_aux), scan_args)
    inv = 1.0 / n
    return (jax.tree_util.tree_map(lambda x: x * inv, gsum),
            jax.tree_util.tree_map(lambda x: x * inv, aux_sum))


def make_d_step(step: int, *, width_mult: float, from_rgb_activate: bool,
                loss_kind: str = "wgan-gp", tx=None, compute_dtype=None,
                remat: bool = False, grad_accum: int = 1):
    """``loss_kind`` only switches the GENERATOR objective: the vendored
    reference has no discriminator-side r1 branch (train.py:99-132 guards
    every D term with ``loss == 'wgan-gp'``; only the G loss at :150-153
    switches to softplus) — under --loss r1 the reference's D trains with
    the WGAN-GP critic loss, and we keep that quirk for parity.

    ``compute_dtype`` (opt-in, e.g. jnp.bfloat16) runs G/D forwards and
    backwards in mixed precision: params/activations cast at loss entry,
    master params + Adam state + loss terms + the gradient-penalty norm
    stay f32 (the sqrt of a sum of squares is the one numerically fragile
    piece). f32 remains the default — reference parity.

    ``remat`` (opt-in) checkpoints every progression block
    (stylegan.apply_*(remat=True)). Measured on v5e (GAN512_r04.jsonl,
    GAN1024_r04.jsonl): it does NOT move the 512 px WGAN-GP boundary —
    XLA's own HLO rematerializer already fires at these sizes and the
    binding constraint is the double-backward conv temps — and costs
    ~22% imgs/s where both fit; the one measured win is f32 at 1024 px
    (batch 4 fits only with remat, 2.12 imgs/s). Prefer ``grad_accum``
    everywhere else.

    ``grad_accum`` (opt-in, divides the batch) accumulates gradients
    over that many sequential microbatches inside one jitted step: peak
    HBM = one microbatch + a params-sized accumulator. This is the
    mechanism that actually lifts the (res, batch) boundary (e.g. the
    reference's full batch 16 at 512 px in f32 on one 16 GB chip —
    measured, GAN512_r04.jsonl). Semantics match the reference's
    nn.DataParallel batch split: every loss term is a batch mean so the
    microbatch average is exact; minibatch_stddev sees the microbatch,
    exactly as each reference GPU saw its per-GPU share."""
    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")
    tx = tx or make_optimizers(0.001)
    d_loss_fn = make_d_loss(step, width_mult=width_mult,
                            from_rgb_activate=from_rgb_activate,
                            compute_dtype=compute_dtype, remat=remat)

    def d_step(params_d, opt_d, params_g, real, zs, sel, alpha, lr, rng):
        if grad_accum == 1:
            (_, aux), grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
                params_d, params_g, real, zs, sel, alpha, rng)
        else:
            scan_args = (_microbatch(real, grad_accum),
                         _microbatch(zs, grad_accum, axis=1),
                         jax.random.split(rng, grad_accum))
            grads, aux = _accum_grads(
                d_loss_fn, params_d, grad_accum, scan_args,
                lambda xs: (params_g, xs[0], xs[1], sel, alpha, xs[2]))
        updates, opt_d = tx.update(grads, opt_d, params_d)
        updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
        params_d = optax.apply_updates(params_d, updates)
        return params_d, opt_d, aux

    return jax.jit(d_step)


def make_g_loss(step: int, *, width_mult: float, from_rgb_activate: bool,
                loss_kind: str = "wgan-gp", compute_dtype=None,
                remat: bool = False):
    """Build the generator loss closure (exposed for tests/accumulation)."""

    def _apply_g(params_g, zs, noise, sel, alpha):
        return sg.apply_styled_generator(
            params_g, zs, noise, step=step, alpha=alpha, style_sel=sel,
            width_mult=width_mult, remat=remat)

    def _apply_d(params_d, x, alpha, rng):
        return sg.apply_discriminator(
            params_d, x, step=step, alpha=alpha, width_mult=width_mult,
            from_rgb_activate=from_rgb_activate, train=True, rng=rng,
            remat=remat)

    def g_loss_fn(params_g, params_d, zs, sel, alpha, rng):
        if compute_dtype is not None:
            params_g = _cast_tree(params_g, compute_dtype)
            params_d = _cast_tree(params_d, compute_dtype)
            zs = zs.astype(compute_dtype)
            alpha = jnp.asarray(alpha, compute_dtype)
        r_noise, r_drop = jax.random.split(rng)
        noise = sg.make_noise(r_noise, zs.shape[1], step)
        if compute_dtype is not None:
            noise = [n.astype(compute_dtype) for n in noise]
        fake = _apply_g(params_g, zs, noise, sel, alpha)
        predict = _apply_d(params_d, fake, alpha,
                           r_drop).astype(jnp.float32)
        if loss_kind == "r1":
            return jax.nn.softplus(-predict).mean(), {}
        return (-predict).mean(), {}

    return g_loss_fn


def make_g_step(step: int, *, width_mult: float, from_rgb_activate: bool,
                loss_kind: str = "wgan-gp", tx=None, compute_dtype=None,
                remat: bool = False, grad_accum: int = 1,
                ema_decay: float = 0.999, ema_warmup: bool = False):
    """``ema_decay``: g_running decay (reference train.py:27-32 hardcodes
    0.999). g_running starts as a COPY of the live generator, so after t
    generator steps a 0.999^t fraction of the EMA is still the *initial
    random* generator — negligible in the reference's 100k+-step
    production runs, but a ~960-step convergence run retains 0.999^960 ≈
    0.38 of init mass, which is why short-run artifacts show g_running
    trailing the live generator (PROFILE.md "g_running EMA lag"). Short
    runs should pass a faster decay (e.g. 0.99 → init mass 6e-5).

    ``ema_warmup``: use the effective decay min(ema_decay, (1+t)/(10+t))
    (tf ExponentialMovingAverage ``num_updates`` schedule), where t is the
    optimizer step count — the first steps all but overwrite the random
    init (t=1 → 0.18), and the horizon grows toward ``ema_decay``'s as
    training proceeds, so ONE setting serves both short convergence runs
    and long production runs. Off by default (= reference parity); resume
    is seamless because t rides the restored Adam ``count``."""
    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")
    if not 0.0 <= ema_decay < 1.0:
        raise ValueError(f"ema_decay must be in [0, 1), got {ema_decay}")
    tx = tx or make_optimizers(0.001)
    g_loss_fn = make_g_loss(step, width_mult=width_mult,
                            from_rgb_activate=from_rgb_activate,
                            loss_kind=loss_kind, compute_dtype=compute_dtype,
                            remat=remat)

    def g_step(params_g, opt_g, ema, params_d, zs, sel, alpha, lr, rng):
        if grad_accum == 1:
            (loss, _), grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
                params_g, params_d, zs, sel, alpha, rng)
        else:
            # aux dict is empty; accumulate the scalar loss alongside by
            # differentiating a shim whose aux carries the loss value
            def loss_with_aux(pg, pd, z, s, a, k):
                val, _ = g_loss_fn(pg, pd, z, s, a, k)
                return val, {"loss": val}

            scan_args = (_microbatch(zs, grad_accum, axis=1),
                         jax.random.split(rng, grad_accum))
            grads, aux = _accum_grads(
                loss_with_aux, params_g, grad_accum, scan_args,
                lambda xs: (params_d, xs[0], sel, alpha, xs[1]))
            loss = aux["loss"]
        updates, opt_g = tx.update(grads, opt_g, params_g)
        mask = style_lr_mask(params_g)
        updates = jax.tree_util.tree_map(lambda u, m: -lr * m * u,
                                         updates, mask)
        params_g = optax.apply_updates(params_g, updates)
        if ema_warmup:
            # opt_g.count was just incremented by tx.update, so t >= 1
            t = opt_g.count.astype(jnp.float32)
            eff = jnp.minimum(jnp.float32(ema_decay), (1.0 + t) / (10.0 + t))
            ema = accumulate(ema, params_g, eff)
        else:
            ema = accumulate(ema, params_g, ema_decay)
        return params_g, opt_g, ema, loss

    return jax.jit(g_step)


def save_image_grid(images, path: str, nrow: int = 8):
    """[-1,1] float [N, H, W, 3] -> tiled PNG (torchvision save_image
    equivalent; reference: train.py:179-192)."""
    from PIL import Image

    imgs = np.asarray(images)
    imgs = np.clip((imgs + 1.0) * 127.5, 0, 255).astype(np.uint8)
    n, h, w, c = imgs.shape
    ncol = int(math.ceil(n / nrow))
    grid = np.zeros((ncol * h, nrow * w, c), np.uint8)
    for i in range(n):
        r, c_ = divmod(i, nrow)
        grid[r * h:(r + 1) * h, c_ * w:(c_ + 1) * w] = imgs[i]
    Image.fromarray(grid).save(path)
    return path


def save_gan_checkpoint(path, params_g, params_d, opt_g, opt_d, g_running):
    blob = {}
    for section, tree in [("generator", params_g),
                          ("discriminator", params_d),
                          ("g_optimizer", opt_g), ("d_optimizer", opt_d),
                          ("g_running", g_running)]:
        blob.update({f"{section}/{k}": v
                     for k, v in checkpoint._flatten(tree).items()})
    import io

    buf = io.BytesIO()
    np.savez(buf, **blob)
    # atomic like checkpoint.save: a kill mid-write must not leave a
    # truncated 5-part checkpoint for --ckpt resume to trip over
    tmp = f"{path}.{os.getpid()}.tmp"
    try:
        with open(tmp, "wb") as f:
            f.write(buf.getvalue())
        os.replace(tmp, path)
    except OSError:
        if os.path.isfile(tmp):
            os.unlink(tmp)
        raise
    return path


def restore_section(tree, blob, section: str):
    """Overlay a 5-part checkpoint blob's ``section/`` leaves onto a
    template pytree. Returns (tree, n_loaded, n_total) so callers can
    detect layout mismatches instead of silently training on init
    weights (shape-mismatched or missing leaves keep the template)."""
    flat = checkpoint._flatten(tree)
    order = list(flat.keys())
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    new, loaded = [], 0
    for k, leaf in zip(order, leaves):
        v = blob.get(f"{section}/{k}")
        if v is not None and tuple(v.shape) == tuple(np.shape(leaf)):
            new.append(jnp.asarray(v))
            loaded += 1
        else:
            new.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new), loaded, len(leaves)


def load_gan_checkpoint(path, params_g, params_d, opt_g, opt_d, g_running):
    with np.load(path, allow_pickle=False) as z:
        blob = {k: z[k] for k in z.files}
    out = []
    for tree, section in [(params_g, "generator"),
                          (params_d, "discriminator"),
                          (opt_g, "g_optimizer"), (opt_d, "d_optimizer"),
                          (g_running, "g_running")]:
        tree, loaded, total = restore_section(tree, blob, section)
        if loaded < total:
            print(f"WARNING: checkpoint {path} section '{section}': only "
                  f"{loaded}/{total} tensors matched (width_mult/layout "
                  "mismatch?); unmatched layers keep RANDOM init weights")
        out.append(tree)
    return tuple(out)


def build_argparser():
    p = argparse.ArgumentParser(description="Progressive Growing of GANs")
    p.add_argument("--phase", type=int, default=600_000,
                   help="samples per fade-in phase")
    p.add_argument("--lr", default=0.001, type=float)
    p.add_argument("--sched", action="store_true", help="lr/batch scheduling")
    p.add_argument("--init_size", default=8, type=int)
    p.add_argument("--max_size", default=512, type=int)
    p.add_argument("--ckpt", default=None, type=str)
    p.add_argument("--epoch_start", default=0, type=int)
    p.add_argument("--no_from_rgb_activate", action="store_true")
    p.add_argument("--mixing", action="store_true")
    p.add_argument("--loss", type=str, default="wgan-gp",
                   choices=["wgan-gp", "r1"])
    # config the reference hardcoded
    p.add_argument("--data_dir", required=True)
    p.add_argument("--output_dir", default=".")
    p.add_argument("--epochs", default=36, type=int)
    p.add_argument("--step_every", default=4, type=int,
                   help="epochs per resolution step (512-run: 4; 256-run: 10)")
    p.add_argument("--code_size", default=512, type=int)
    p.add_argument("--width_mult", default=1.0, type=float,
                   help="channel-width multiplier (tiny models for CI)")
    p.add_argument("--n_critic", default=1, type=int)
    p.add_argument("--batch_override", default=None, type=int)
    p.add_argument("--max_batches", default=None, type=int,
                   help="cap batches per epoch (smoke tests)")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--mesh", default=0, type=int,
                   help="data-parallel G/D training over an N-device "
                        "mesh (the reference's nn.DataParallel on 4 "
                        "GPUs): batches shard over the batch axis, "
                        "params replicate, GSPMD inserts the gradient "
                        "all-reduce; numerically identical to "
                        "single-device (tested)")
    p.add_argument("--compute_dtype", default="f32",
                   choices=["f32", "bf16"],
                   help="opt-in mixed precision for the G/D forward+"
                        "backward (master params, Adam state, loss terms "
                        "and the GP norm stay f32). f32 is the reference-"
                        "parity default; bf16 taps the MXU's 4x bf16 rate")
    p.add_argument("--ckpt_every", type=int, default=1,
                   help="write the 5-part checkpoint (and EMA sample "
                        "grid) every N epochs (default 1 = the "
                        "reference's per-epoch cadence, train.py:166-"
                        "218). The full-width checkpoint is a "
                        "device-to-host fetch + ~600 MB serialize; on a "
                        "high-latency host link that write gates the "
                        "NEXT epoch's submit (the async writer keeps at "
                        "most one write in flight), so N>1 removes it "
                        "from the epoch critical path. The final epoch "
                        "and a preemption (SIGTERM) stop are ALWAYS "
                        "written, so --ckpt resume keeps working")
    p.add_argument("--remat", action="store_true",
                   help="checkpoint every G/D progression block "
                        "(jax.checkpoint); measured on v5e: does NOT "
                        "move the 512px WGAN-GP boundary (the double-"
                        "backward conv temps bind) and costs ~22%% "
                        "imgs/s where both fit — its one measured win "
                        "is f32 @ 1024px (batch 4 fits only with it); "
                        "prefer --grad_accum elsewhere "
                        "(GAN512/1024_r04.jsonl)")
    p.add_argument("--ema_decay", type=float, default=0.999,
                   help="g_running EMA decay (reference train.py:27-32 "
                        "hardcodes 0.999; short runs keep 0.999^t of the "
                        "initial RANDOM generator in the EMA — pass a "
                        "faster decay, e.g. 0.99, when total generator "
                        "steps are only a few thousand)")
    p.add_argument("--ema_warmup", action="store_true",
                   help="warm up the g_running decay as "
                        "min(--ema_decay, (1+t)/(10+t)) over optimizer "
                        "steps t (tf-EMA num_updates schedule): the "
                        "random init washes out immediately and long "
                        "runs still converge to --ema_decay's horizon — "
                        "one setting for short and production runs alike "
                        "(default off = reference parity)")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="accumulate gradients over N sequential "
                        "microbatches inside each jitted step (batch "
                        "must divide): peak HBM = one microbatch + a "
                        "params-sized accumulator — the knob that lifts "
                        "the (res, batch) OOM boundary (measured, "
                        "GAN512_r04.jsonl). Semantics = the reference's "
                        "nn.DataParallel per-GPU split (exact for every "
                        "batch-mean term; minibatch_stddev sees the "
                        "microbatch like each reference GPU saw its "
                        "share)")
    p.add_argument("--profile", action="store_true",
                   help="XProf device trace of the first epoch into "
                        "<output_dir>/profile/ + per-batch percentiles and "
                        "imgs/sec per epoch (the reference committed a "
                        "cProfile dump from its GPU-utilization tuning; "
                        "this is the TPU equivalent)")
    return p


def train_gan(args):
    import random as py_random

    # normalize for in-process callers that build a partial Namespace;
    # validate before any dataset/device work
    _ce = getattr(args, "ckpt_every", None)
    args.ckpt_every = 1 if _ce is None else _ce
    if args.ckpt_every < 1:
        raise RuntimeError(
            f"--ckpt_every must be >= 1, got {args.ckpt_every}")
    _ed = getattr(args, "ema_decay", 0.999)
    if not 0.0 <= _ed < 1.0:
        # fail at argument time, not minutes later when epoch 0 lazily
        # builds its g_step (make_g_step revalidates for direct callers)
        raise RuntimeError(f"--ema_decay must be in [0, 1), got {_ed}")

    # per-epoch streams are derived inside the epoch loop (bit-exact
    # resume); these module-scope names are (re)bound there
    py_rng = py_random.Random(args.seed)
    rng = jax.random.PRNGKey(args.seed)
    width = args.width_mult
    from_rgb_activate = not args.no_from_rgb_activate

    sample_dir = os.path.join(args.output_dir, "sample")
    ckpt_dir = os.path.join(args.output_dir, "checkpoint")
    os.makedirs(sample_dir, exist_ok=True)
    os.makedirs(ckpt_dir, exist_ok=True)

    k_g, k_d, rng = jax.random.split(rng, 3)
    params_g = sg.init_styled_generator(k_g, style_dim=args.code_size,
                                        width_mult=width)
    params_d = sg.init_discriminator(k_d, width_mult=width,
                                     from_rgb_activate=from_rgb_activate)
    g_running = jax.tree_util.tree_map(lambda x: x, params_g)

    tx = make_optimizers(args.lr)
    opt_g = tx.init(params_g)
    opt_d = tx.init(params_d)

    if args.ckpt:
        params_g, params_d, opt_g, opt_d, g_running = load_gan_checkpoint(
            args.ckpt, params_g, params_d, opt_g, opt_d, g_running)
        print("Loaded GAN checkpoint", args.ckpt)

    # validate the WHOLE progressive batch schedule up front against
    # --mesh and --grad_accum: the reference schedule
    # (STEP_BATCH_SIZE[512]=100) is not divisible by e.g. 8, and
    # discovering that only when training reaches 512px would kill a
    # multi-day run mid-flight
    _max_step = int(math.log2(args.max_size)) - 2
    _init_step = min(max(int(math.log2(args.init_size)) - 2, 0),
                     _max_step)  # same offset as the training loop
    _sched = ({args.batch_override} if args.batch_override else {
        STEP_BATCH_SIZE.get(
            4 * 2 ** min(_init_step + e // args.step_every, _max_step),
            32)
        for e in range(args.epoch_start, args.epochs)})
    _accum = getattr(args, "grad_accum", 1)
    if _accum is None:
        _accum = 1
    if _accum < 1:
        raise RuntimeError(
            f"--grad_accum must be >= 1, got {_accum}")
    if _accum > 1:
        _bad = sorted(b for b in _sched if b % _accum)
        if _bad:
            raise RuntimeError(
                f"batch schedule {_bad} not divisible by --grad_accum "
                f"{_accum}; pass --batch_override with a multiple "
                f"of {_accum}")

    mesh = None
    if getattr(args, "mesh", 0):
        from ..parallel import mesh as M

        if len(jax.devices()) < args.mesh:
            raise RuntimeError(f"--mesh {args.mesh} but only "
                               f"{len(jax.devices())} devices")
        # each scan microbatch (b / grad_accum) is what the mesh shards
        _bad = sorted(b for b in _sched if (b // _accum) % args.mesh)
        if _bad:
            raise RuntimeError(
                f"batch schedule {_bad} not divisible over --mesh "
                f"{args.mesh}"
                + (f" after --grad_accum {_accum} microbatching"
                   if _accum > 1 else "")
                + f"; pass --batch_override with a multiple "
                f"of {args.mesh * _accum}")
        mesh = M.data_mesh(args.mesh)
        rep = M.replicated(mesh)
        put_rep = lambda t: jax.tree_util.tree_map(  # noqa: E731
            lambda x: jax.device_put(x, rep), t)
        params_g, params_d, opt_g, opt_d, g_running = map(
            put_rep, (params_g, params_d, opt_g, opt_d, g_running))
        batch_shard = M.data_batch_sharding(mesh)
        style_shard = M.style_batch_sharding(mesh)
        print(f"GAN data-parallel over {args.mesh} devices")

    lr_sched = ({128: 0.0015, 256: 0.002, 512: 0.003, 1024: 0.003}
                if args.sched else {})

    # A prebuilt resolution-keyed store (meta.json marker) reads pre-resized
    # tiles — the reference's LMDB MultiResolutionDataset; otherwise fall
    # back to resize-on-fetch from a plain image folder.
    if os.path.exists(os.path.join(args.data_dir, MultiResolutionStore.META)):
        dataset = MultiResolutionStore(args.data_dir, seed=args.seed)
    else:
        dataset = ImageFolderDataset(args.data_dir, seed=args.seed)
    max_step = int(math.log2(args.max_size)) - 2
    # progression STARTS at --init_size like the reference (its train loop
    # seeds step from init_size, train.py:61-66); previously init_size
    # only gated the alpha exception and epoch 0 always trained at 4px
    init_step = min(max(int(math.log2(args.init_size)) - 2, 0), max_step)
    n_blocks = len(sg._gen_layout(width))

    step_fns = {}
    # async writer: the full-width 5-part checkpoint is ~200 MB of npz —
    # its fetch+compress+write can dominate epoch wall time at small
    # resolutions (GAN convergence run: ~1-2 s compute/epoch vs ~200 MB
    # save), so it overlaps the next epoch's steps instead of blocking
    # them. Safe: params_g/params_d/opt_*/g_running are rebound, never
    # mutated, and no step donates their buffers.
    ckpt_writer = checkpoint.AsyncCheckpointer()
    latch = PreemptionLatch().install()
    # try/finally like the other two trainers (classify.py,
    # classify_legacy.py): ANY exit — Diverged, the zero-batches or
    # mesh-divisibility RuntimeError, a KeyboardInterrupt — must restore
    # the default SIGTERM handler, or in-process callers (tests,
    # tools/gan_convergence_run.py) are left with a handler pointing at
    # a dead latch and silently lose SIGTERM termination afterwards.
    try:
        for epoch in range(args.epoch_start, args.epochs):
            step = min(init_step + epoch // args.step_every, max_step)
            final_progress = (init_step + epoch // args.step_every) >= max_step
            resolution = 4 * 2 ** step
            batch = args.batch_override or STEP_BATCH_SIZE.get(resolution, 32)
            lr = lr_sched.get(resolution, args.lr)
            dataset.NewResolution(resolution, batch)
            # epoch-derived streams — the same bit-exact-resume recipe as the
            # classifier (train/classify.py::epoch_key): batch order, style
            # mixing coin flips/crossovers, and every jax key for epoch E are
            # pure functions of (seed, E), so resuming from the epoch E-1
            # checkpoint replays epoch E exactly
            if hasattr(dataset, "reseed"):
                dataset.reseed(args.seed, epoch)
            # plain arithmetic, not hash(): str hashing is salted per process
            py_rng = py_random.Random(args.seed * 1_000_003 + epoch * 7919 + 1)
            rng = jax.random.fold_in(jax.random.PRNGKey(args.seed), epoch)

            if step not in step_fns:
                cdt = (jnp.bfloat16 if getattr(args, "compute_dtype", "f32")
                       == "bf16" else None)
                rm = getattr(args, "remat", False)
                ga = getattr(args, "grad_accum", 1)
                step_fns[step] = (
                    make_d_step(step, width_mult=width,
                                from_rgb_activate=from_rgb_activate,
                                loss_kind=args.loss, tx=tx, compute_dtype=cdt,
                                remat=rm, grad_accum=ga),
                    make_g_step(step, width_mult=width,
                                from_rgb_activate=from_rgb_activate,
                                loss_kind=args.loss, tx=tx, compute_dtype=cdt,
                                remat=rm, grad_accum=ga,
                                ema_decay=getattr(args, "ema_decay", 0.999),
                                ema_warmup=getattr(args, "ema_warmup",
                                                   False)),
                )
            d_step, g_step = step_fns[step]

            # used_sample (and with it the alpha fade-in) resets EVERY epoch,
            # exactly like the vendored reference (train.py:80 zeroes it inside
            # the per-epoch train()); with step_every > 1 the blend saw-tooths
            # within a resolution phase — reference behavior, kept for parity
            used_sample = 0
            alpha = 1.0
            disc_loss_dev = gp_dev = gen_loss_dev = jnp.float32(0.0)
            t0 = time.time()
            n_batches = 0
            profiling_this_epoch = (getattr(args, "profile", False)
                                    and epoch == args.epoch_start)
            if profiling_this_epoch:
                from ..utils import profiling

                timer = profiling.StepTimer()
                trace_ctx = profiling.trace(
                    os.path.join(args.output_dir, "profile"))
            else:
                timer = trace_ctx = None

            with (trace_ctx if trace_ctx is not None else _ctx.nullcontext()):
                # background prefetch overlaps decode + H2D with the device
                # steps (the reference used DataLoader workers)
                for i, real in enumerate(prefetch_iter(dataset.batches())):
                    n_batches += 1
                    if args.max_batches and i >= args.max_batches:
                        break
                    b = real.shape[0]
                    alpha = (1.0 if (resolution == args.init_size
                                     and not args.ckpt) or final_progress
                             else min(1.0, (used_sample + 1) / args.phase))
                    used_sample += b

                    if mesh is not None:
                        if b % args.mesh:
                            # unreachable after the startup schedule check;
                            # kept as a belt vs future schedule edits
                            raise RuntimeError(
                                f"batch {b} not divisible over --mesh "
                                f"{args.mesh}; pick --batch_override as a "
                                "multiple")
                        real = jax.device_put(real, batch_shard)

                    with (timer.step() if timer is not None
                          else _ctx.nullcontext()):
                        rng, k_z, k_d_step, k_z2, k_g_step = \
                            jax.random.split(rng, 5)
                        mixing = args.mixing and py_rng.random() < 0.9
                        zs = jax.random.normal(k_z, (2, b, args.code_size))
                        if mesh is not None:
                            zs = jax.device_put(zs, style_shard)
                        sel = jnp.asarray(sg.sample_style_sel(
                            py_rng, 2 if mixing else 1, step, n_blocks),
                            jnp.int32)

                        params_d, opt_d, aux = d_step(
                            params_d, opt_d, params_g, real, zs, sel,
                            jnp.float32(alpha), jnp.float32(lr), k_d_step)
                        # metrics stay on device; fetch once per epoch
                        disc_loss_dev = aux["disc_loss"]
                        gp_dev = aux["grad_penalty"]

                        if (i + 1) % args.n_critic == 0:
                            mixing = args.mixing and py_rng.random() < 0.9
                            zs2 = jax.random.normal(k_z2,
                                                    (2, b, args.code_size))
                            if mesh is not None:
                                zs2 = jax.device_put(zs2, style_shard)
                            sel2 = jnp.asarray(sg.sample_style_sel(
                                py_rng, 2 if mixing else 1, step, n_blocks),
                                jnp.int32)
                            params_g, opt_g, g_running, gl = g_step(
                                params_g, opt_g, g_running, params_d, zs2,
                                sel2, jnp.float32(alpha), jnp.float32(lr),
                                k_g_step)
                            gen_loss_dev = gl
                        if timer is not None:
                            # dispatch is async: the timed region must end in
                            # a host fetch or it measures enqueue time only
                            float(disc_loss_dev)

            if timer is not None:
                s = timer.summary()
                if s.get("steps"):
                    # throughput from the timed (post-warmup) batches only —
                    # the first batch of this epoch pays jit compilation
                    print(f"profile: {s['steps']} timed batches, "
                          f"p50 {s['p50_s'] * 1e3:.0f} ms, "
                          f"p90 {s['p90_s'] * 1e3:.0f} ms, "
                          f"{s['steps'] * batch / max(s['total_s'], 1e-9):.1f} "
                          "imgs/s (excl. compile); trace in "
                          f"{os.path.join(args.output_dir, 'profile')}")
            if n_batches == 0:
                raise RuntimeError(
                    f"epoch {epoch}: zero batches at batch size {batch} over "
                    f"{len(dataset)} images (batches drop ragged tails). Pass "
                    "--batch_override with a size <= the dataset size.")
            gen_loss, disc_loss, gp = (float(gen_loss_dev), float(disc_loss_dev),
                                       float(gp_dev))
            if not all(map(math.isfinite, (gen_loss, disc_loss, gp))):
                # failure detection, same contract as the classifier's NaN
                # guard: halt WITHOUT checkpointing the poisoned epoch so the
                # newest checkpoint on disk stays the last healthy one;
                # main() converts this to exit code DIVERGED_EXIT
                halt = Diverged(
                    f"non-finite GAN losses at epoch {epoch} "
                    f"(G {gen_loss}, D {disc_loss}, GP {gp}); halted "
                    "WITHOUT checkpointing — resume from the previous "
                    "epoch's checkpoint")
                # (latch restore happens in the loop's finally)
                try:
                    ckpt_writer.wait()  # last healthy epoch's write must land
                except Exception as exc:
                    # a failed pending write must not mask the divergence
                    # diagnosis (main() keys DIVERGED_EXIT off this type)
                    raise halt from exc
                raise halt
            print(f"Epoch {epoch}: res {resolution}; samples {used_sample}; "
                  f"G {gen_loss:.3f}; D {disc_loss:.3f}; GP {gp:.3f}; "
                  f"alpha {alpha:.4f}; {time.time() - t0:.1f}s")

            # EMA sample grid + 5-part checkpoint (reference: train.py:166-218)
            # The split happens every epoch even when the grid is skipped so
            # --ckpt_every does not perturb any key stream (training keys are
            # re-derived per epoch from (seed, epoch) regardless).
            rng, k_s, k_n = jax.random.split(rng, 3)
            stopping = latch.stop_requested()
            due = ((epoch + 1) % args.ckpt_every == 0
                   or epoch == args.epochs - 1 or stopping)
            if due:
                zs = jax.random.normal(k_s,
                                       (1, min(16, batch), args.code_size))
                noise = sg.make_noise(k_n, zs.shape[1], step)
                imgs = sg.apply_styled_generator(
                    g_running, zs, noise, step=step, alpha=1.0,
                    width_mult=width)
                save_image_grid(imgs, os.path.join(
                    sample_dir, f"e{epoch}_gen.png"), nrow=4)
                ckpt_writer.submit(
                    save_gan_checkpoint,
                    os.path.join(ckpt_dir, f"train_step-{epoch}.model"),
                    params_g, params_d, opt_g, opt_d, g_running)
            if stopping:
                # this epoch's 5-part checkpoint is already submitted (a
                # preemption stop forces `due` above even off-cadence); the
                # wait() below makes it durable before the clean exit
                print(f"train: preempted — stopped after epoch {epoch}; "
                      f"resume with --ckpt ...train_step-{epoch}.model "
                      f"--epoch_start {epoch + 1}")
                break
    finally:
        latch.restore()
    ckpt_writer.wait()  # the final epoch's checkpoint must be durable
    return params_g, params_d, g_running


def main(argv=None):
    from ..utils import compcache

    compcache.enable()  # persistent XLA cache across runs
    args = build_argparser().parse_args(argv)
    print(args)
    try:
        train_gan(args)
    except Diverged as e:
        print(f"FATAL: {e}", file=sys.stderr)
        return DIVERGED_EXIT
    return 0


if __name__ == "__main__":
    sys.exit(main())
