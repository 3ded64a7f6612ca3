"""StyleGAN WGAN-GP convergence run: the trainer LEARNS, not merely steps.

The classifier already has a full-width convergence proof
(tools/convergence_run.py); this is the GAN counterpart. The reference
repo's GAN evidence is its committed utilization profile plus sample
images from the private histology cohort — hermetic stand-in here:
**two-band palette images** (top half one palette color, bottom half its
partner, heavy pixel noise). A working generator must discover (a) the
vertical band structure and (b) the palette's channel statistics; a
broken one emits band contrast ~0 (gray noise has no top/bottom split).

Metric: "band stats" — the aggregate (top-half mean RGB, bottom-half
mean RGB) of CLIPPED [-1,1] samples, a 6-vector summarizing the band
structure the data carries. Pass criteria:
  * trainer exits 0 (the non-finite-loss guard would exit 3 on NaN)
  * mean-abs distance from the generator's band stats to the real
    data's is BOTH < 0.15 (absolute, [-1,1] units) and < 50% of the
    untrained generator's distance (clear movement toward the data —
    an untrained equal-lr generator emits large structured values, so
    raw band contrast alone is trivially nonzero at init)

Run (TPU, ~5-10 min incl. compile):
    python tools/gan_convergence_run.py
    python tools/gan_convergence_run.py --max_res 16        # crosses the
        # 8->16 progressive-growing transition with alpha fade-in and
        # judges the band metric at 16px (records res_transitions and the
        # pre-transition distance so the fade's survival is visible)
    python tools/gan_convergence_run.py --tiny --epochs 2   # smoke
Numbers land in PROFILE.md ("GAN convergence run").
"""

import argparse
import glob
import json
import os
import re
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PALETTE = [  # (top RGB, bottom RGB) pairs the generator must learn
    ((200, 40, 40), (40, 40, 200)),
    ((40, 180, 40), (180, 40, 180)),
    ((220, 200, 40), (40, 180, 200)),
    ((240, 140, 40), (60, 60, 60)),
]


def make_dataset(img_dir: str, n: int, size: int, seed: int = 0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    os.makedirs(img_dir, exist_ok=True)
    for i in range(n):
        top, bottom = PALETTE[rng.integers(len(PALETTE))]
        img = np.empty((size, size, 3), np.float32)
        img[: size // 2] = top
        img[size // 2:] = bottom
        img += rng.normal(0.0, 20.0, img.shape)
        Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(
            os.path.join(img_dir, f"im{i:05d}.png"))


def band_stats(imgs) -> np.ndarray:
    """imgs: [N, H, W, 3]. Clip to [-1, 1] (what save_image_grid renders),
    then return the aggregate [top RGB mean, bottom RGB mean] 6-vector."""
    imgs = np.clip(np.asarray(imgs, np.float32), -1.0, 1.0)
    h = imgs.shape[1]
    top = imgs[:, : h // 2].mean(axis=(0, 1, 2))
    bot = imgs[:, h // 2:].mean(axis=(0, 1, 2))
    return np.concatenate([top, bot])


def band_contrast(imgs) -> float:
    """Mean abs top-vs-bottom channel gap of clipped images (reported
    for context alongside the band-stats distance)."""
    imgs = np.clip(np.asarray(imgs, np.float32), -1.0, 1.0)
    h = imgs.shape[1]
    top = imgs[:, : h // 2].mean(axis=(1, 2))
    bot = imgs[:, h // 2:].mean(axis=(1, 2))
    return float(np.abs(top - bot).mean())


def generate(params, n, step, code_size, width, seed):
    import jax

    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.models import (  # noqa: E501
        stylegan as sg,
    )

    k_z, k_n = jax.random.split(jax.random.PRNGKey(seed))
    zs = jax.random.normal(k_z, (1, n, code_size))
    noise = sg.make_noise(k_n, n, step)
    imgs = sg.apply_styled_generator(params, zs, noise, step=step,
                                     alpha=1.0, width_mult=width)
    return np.asarray(imgs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=8)
    ap.add_argument("--max_res", type=int, default=None,
                    help="final resolution; > --res trains ACROSS the "
                         "progressive-growing transition(s) with alpha "
                         "fade-in (reference: style-...-512/train.py:48-68)"
                         " and judges convergence at this resolution")
    ap.add_argument("--step_every", type=int, default=None,
                    help="epochs per resolution step (default: split the "
                         "epoch budget evenly across the resolutions)")
    ap.add_argument("--n_images", type=int, default=2048)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--width", type=float, default=1.0)
    ap.add_argument("--tiny", action="store_true",
                    help="width_mult 1/16 (CPU smoke)")
    ap.add_argument("--keep", default=None,
                    help="keep run artifacts in this dir (default: tmp)")
    ap.add_argument("--grad_accum", type=int, default=1,
                    help="train with in-step microbatch gradient "
                         "accumulation (train.gan --grad_accum): "
                         "convergence-context evidence for the knob "
                         "beyond the one-step parity test")
    ap.add_argument("--ema_decay", type=float, default=0.999,
                    help="g_running decay (train.gan --ema_decay). The "
                         "reference's 0.999 keeps 0.999^t of the INITIAL "
                         "random generator in the EMA — a ~1k-step "
                         "convergence run retains ~38%% init mass, so "
                         "judge g_running with 0.99 here or expect it to "
                         "trail the live generator")
    ap.add_argument("--ema_warmup", action="store_true",
                    help="pass --ema_warmup to train.gan: effective decay "
                         "min(ema_decay, (1+t)/(10+t)) — the init washes "
                         "out immediately at ANY --ema_decay")
    args = ap.parse_args()
    width = (1 / 16) if args.tiny else args.width
    max_res = args.max_res or args.res
    assert max_res >= args.res
    n_res = int(np.log2(max_res)) - int(np.log2(args.res)) + 1
    step_every = args.step_every or max(args.epochs // n_res, 1)

    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.data import (  # noqa: E501
        gan_dataset,
    )
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (  # noqa: E501
        gan,
    )
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.models import (  # noqa: E501
        stylegan as sg,
    )
    import jax

    workdir = args.keep or tempfile.mkdtemp(prefix="gan_conv_")
    img_dir = os.path.join(workdir, "imgs")
    store = os.path.join(workdir, "store")
    out = os.path.join(workdir, "run")
    step = int(np.log2(max_res)) - 2  # judge at the FINAL resolution

    print(f"# workdir {workdir}")
    make_dataset(img_dir, args.n_images, 4 * max_res)
    gan_dataset._main(["--src", img_dir, "--out", store,
                       "--max-size", str(max_res), "--seed", "0"])

    # real-data contrast from the store's images: decode each PNG ONCE
    # and resize to every judging resolution (the final res, plus the
    # starting res when a transition will be judged pre-fade too)
    from PIL import Image

    judge_res = {max_res} | ({args.res} if max_res > args.res else set())
    stacks = {r: [] for r in judge_res}
    for p in sorted(glob.glob(os.path.join(img_dir, "*.png")))[:512]:
        with Image.open(p) as im:
            for r in judge_res:
                stacks[r].append(
                    np.asarray(im.resize((r, r)), np.float32)
                    / 127.5 - 1.0)
    real_by_res = {r: np.stack(v) for r, v in stacks.items()}
    real = real_by_res[max_res]
    s_real = band_stats(real)
    c_real = band_contrast(real)

    # untrained baseline (same arch/width, different seed than training)
    g0 = sg.init_styled_generator(jax.random.PRNGKey(99), width_mult=width)
    init_imgs = generate(g0, 256, step, 512, width, seed=7)
    d_init = float(np.abs(band_stats(init_imgs) - s_real).mean())
    c_init = band_contrast(init_imgs)

    # phase = half an epoch's samples: the alpha fade-in completes inside
    # each post-transition epoch (used_sample resets per epoch — the
    # reference's saw-tooth, see train/gan.py:434-438 — so a larger phase
    # would keep the new resolution's layers permanently half-blended)
    t0 = time.time()
    rc = gan.main(["--data_dir", store, "--output_dir", out,
                   "--init_size", str(args.res), "--max_size", str(max_res),
                   "--step_every", str(step_every),
                   "--phase", str(max(args.n_images // 2, 512)
                                  if max_res > args.res
                                  else max(args.n_images * 2, 4000)),
                   "--epochs", str(args.epochs),
                   "--batch_override", str(args.batch),
                   "--grad_accum", str(args.grad_accum),
                   "--ema_decay", str(args.ema_decay),
                   # checkpoint only the pre-transition epochs + final
                   # (cadence == step_every ends each resolution phase on
                   # a written epoch): the full-width 5-part checkpoint's
                   # D2H fetch + serialize otherwise gates EVERY epoch on
                   # the tunnel host (~60-100 s/epoch of pure overhead)
                   "--ckpt_every", str(step_every),
                   "--width_mult", str(width), "--seed", "1"]
                  + (["--ema_warmup"] if args.ema_warmup else []))
    wall = time.time() - t0
    if rc not in (0, None):
        print(json.dumps({"converged": False, "reason": f"trainer rc={rc}"}))
        return 1

    ckpts = glob.glob(os.path.join(out, "checkpoint", "train_step-*.model"))
    last = max(ckpts, key=lambda p: int(re.search(r"-(\d+)\.model$", p)
                                        .group(1)))
    with np.load(last, allow_pickle=False) as z:
        blob = {k: z[k] for k in z.files}
    template = sg.init_styled_generator(jax.random.PRNGKey(0),
                                        width_mult=width)
    dist, contrast = {}, {}
    for section in ("generator", "g_running"):
        tree, loaded, total = gan.restore_section(template, blob, section)
        assert loaded == total, (section, loaded, total)
        imgs = generate(tree, 256, step, 512, width, seed=7)
        dist[section] = float(np.abs(band_stats(imgs) - s_real).mean())
        contrast[section] = band_contrast(imgs)

    d_gen = dist["generator"]
    converged = bool(d_gen < 0.15 and d_gen < 0.5 * d_init)

    init_step_ = int(np.log2(args.res)) - 2
    max_step_ = step
    res_seq = [min(init_step_ + e // step_every, max_step_)
               for e in range(args.epochs)]
    res_transitions = sum(a != b for a, b in zip(res_seq, res_seq[1:]))

    record = {
        "converged": converged, "res": args.res, "max_res": max_res,
        "res_transitions": res_transitions, "step_every": step_every,
        "grad_accum": args.grad_accum, "ema_decay": args.ema_decay,
        "ema_warmup": args.ema_warmup,
        "width_mult": width,
        "epochs": args.epochs, "samples": args.n_images * args.epochs,
        "band_dist_init": round(d_init, 4),
        "band_dist_generator": round(d_gen, 4),
        "band_dist_g_running": round(dist["g_running"], 4),
        "band_contrast_real": round(c_real, 4),
        "band_contrast_init": round(c_init, 4),
        "band_contrast_generator": round(contrast["generator"], 4),
        "train_wall_secs": round(wall, 1), "ckpt": last,
    }

    if res_transitions:
        # "the band metric survives the fade": also judge the checkpoint
        # from the LAST pre-transition epoch at the starting resolution,
        # so the record shows learned-before-fade vs learned-after-fade
        pre_ep = step_every - 1
        pre_path = os.path.join(out, "checkpoint",
                                f"train_step-{pre_ep}.model")
        if os.path.exists(pre_path):
            with np.load(pre_path, allow_pickle=False) as z:
                pre_blob = {k: z[k] for k in z.files}
            pre_tree, loaded, total = gan.restore_section(
                template, pre_blob, "generator")
            assert loaded == total
            pre_imgs = generate(pre_tree, 256, init_step_, 512, width,
                                seed=7)
            pre_real = real_by_res[args.res]
            record["band_dist_pre_transition"] = round(float(
                np.abs(band_stats(pre_imgs) - band_stats(pre_real)).mean()),
                4)
            record["pre_transition_epoch"] = pre_ep

    print(json.dumps(record))
    return 0 if converged else 1


if __name__ == "__main__":
    sys.exit(main())
