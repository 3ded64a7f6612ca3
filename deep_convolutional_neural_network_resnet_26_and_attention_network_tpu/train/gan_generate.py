"""StyleGAN sampling / style-mixing grids from a checkpoint.

Mirrors the reference's generate.py (reference:
style-based-gan-pytorch-master-512/generate.py:1-100): mean-style
truncation at weight 0.7, an n_row x n_col sample grid, and 20 style-mixing
grids where the SOURCE code drives the first two blocks
(mixing_range=(0, 1)) and the target code drives the rest — see the sel
construction in style_mixing_grid.
"""

import argparse
import math
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

from ..models import stylegan as sg
from .gan import restore_section, save_image_grid


def get_mean_style(params_g, rng, *, code_size=512):
    """Average mapped style over 10x1024 codes (reference: generate.py:10-24)."""
    total = None
    for k in jax.random.split(rng, 10):
        z = jax.random.normal(k, (1024, code_size))
        m = sg.mean_style(params_g, z)
        total = m if total is None else total + m
    return total / 10.0


def sample(params_g, rng, step, mean_style_w, n_sample, *, code_size=512,
           width_mult=1.0):
    """Truncated samples at style_weight=0.7 (reference: generate.py:26-36)."""
    k_z, k_n = jax.random.split(rng)
    zs = jax.random.normal(k_z, (1, n_sample, code_size))
    noise = sg.make_noise(k_n, n_sample, step)
    return sg.apply_styled_generator(
        params_g, zs, noise, step=step, alpha=1.0,
        mean_style_w=mean_style_w, style_weight=0.7, width_mult=width_mult)


def style_mixing(params_g, rng, step, mean_style_w, n_source, n_target, *,
                 code_size=512, width_mult=1.0):
    """Source/target mixing grid: SOURCE styles drive blocks 0-1
    (mixing_range=(0,1)), the target style the rest
    (reference: generate.py:38-71; see the sel comment below)."""
    k_src, k_tgt, k_n = jax.random.split(rng, 3)
    source = jax.random.normal(k_src, (n_source, code_size))
    target = jax.random.normal(k_tgt, (n_target, code_size))
    shape = 4 * 2 ** step
    n_blocks = len(sg._gen_layout(width_mult))

    def gen(zs, sel=None):
        noise = sg.make_noise(k_n, zs.shape[1], step)
        return sg.apply_styled_generator(
            params_g, zs, noise, step=step, alpha=1.0, style_sel=sel,
            mean_style_w=mean_style_w, style_weight=0.7,
            width_mult=width_mult)

    images = [jnp.full((1, shape, shape, 3), -1.0)]
    source_image = gen(source[None])
    target_image = gen(target[None])
    images.append(source_image)

    # zs = [target_i, source]; the reference's mixing_range=(0,1) gives
    # blocks 0..1 style[1] (SOURCE) and every other block style[0]
    # (target_i) — reference: generate.py:57-65, model.py:426-430
    sel = jnp.asarray([1 if 0 <= i <= 1 else 0 for i in range(n_blocks)],
                      jnp.int32)
    for i in range(n_target):
        zs = jnp.stack([jnp.tile(target[i][None], (n_source, 1)), source])
        images.append(target_image[i][None])
        images.append(gen(zs, sel))
    return jnp.concatenate(images, axis=0)


def main(argv=None):
    from ..utils import compcache

    compcache.enable()  # persistent XLA cache across runs
    p = argparse.ArgumentParser()
    p.add_argument("path", type=str, help="path to checkpoint file")
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--n_row", type=int, default=3)
    p.add_argument("--n_col", type=int, default=5)
    p.add_argument("--code_size", type=int, default=512)
    p.add_argument("--width_mult", type=float, default=1.0)
    p.add_argument("--n_mixing", type=int, default=20)
    p.add_argument("--output_dir", default=".")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    os.makedirs(args.output_dir, exist_ok=True)
    rng = jax.random.PRNGKey(args.seed)
    k_init, k_mean, k_sample, rng = jax.random.split(rng, 4)
    params_g = sg.init_styled_generator(k_init, style_dim=args.code_size,
                                        width_mult=args.width_mult)
    # sampling needs ONLY the g_running (EMA) section — restoring all 5
    # sections through dummy templates printed misleading 'RANDOM init'
    # warnings for sections this script never uses, and read the file twice
    with np.load(args.path, allow_pickle=False) as z:
        blob = {k: z[k] for k in z.files if k.startswith("g_running/")}
    if not blob:
        raise ValueError(f"{args.path} has no g_running section")
    params_g, loaded, total = restore_section(params_g, blob, "g_running")
    print(f"Loaded g_running from {args.path}: {loaded}/{total} tensors")
    if loaded < total:
        print(f"WARNING: {total - loaded} generator tensors missing or "
              "shape-mismatched (check --width_mult/--code_size match the "
              "GAN run); those layers keep RANDOM init weights")

    mean_w = get_mean_style(params_g, k_mean, code_size=args.code_size)
    step = int(math.log(args.size, 2)) - 2

    img = sample(params_g, k_sample, step, mean_w, args.n_row * args.n_col,
                 code_size=args.code_size, width_mult=args.width_mult)
    save_image_grid(img, os.path.join(args.output_dir, "sample.png"),
                    nrow=args.n_col)
    for j in range(args.n_mixing):
        rng, k = jax.random.split(rng)
        img = style_mixing(params_g, k, step, mean_w, args.n_col, args.n_row,
                           code_size=args.code_size,
                           width_mult=args.width_mult)
        save_image_grid(img, os.path.join(args.output_dir,
                                          f"sample_mixing_{j}.png"),
                        nrow=args.n_col + 1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
