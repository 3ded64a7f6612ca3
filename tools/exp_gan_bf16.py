"""Interleaved A/B: f32 vs bf16 mixed-precision StyleGAN WGAN-GP steps.

One process, alternating timed calls with fresh inputs and host fetches,
so tunnel throttle drift cancels (PROFILE.md methodology). Measures the
full d_step+g_step pair at the config-7 geometry.

Run:  python tools/exp_gan_bf16.py [--res 64] [--batch 64] [--rounds 5]
"""

import argparse
import math
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.models import (  # noqa: E501
    stylegan as sg,
)
from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (  # noqa: E501
    gan,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--width", type=float, default=1.0)
    ap.add_argument("--rounds", type=int, default=5)
    args = ap.parse_args()
    res, batch, width = args.res, args.batch, args.width

    step = int(math.log2(res)) - 2
    k_g, k_d = jax.random.split(jax.random.PRNGKey(0))
    params_g = sg.init_styled_generator(k_g, width_mult=width)
    params_d = sg.init_discriminator(k_d, width_mult=width)
    tx = gan.make_optimizers()
    opt_g, opt_d = tx.init(params_g), tx.init(params_d)
    n_blocks = len(sg._gen_layout(width))
    sel = jnp.zeros((n_blocks,), jnp.int32)
    alpha, lr = jnp.float32(0.5), jnp.float32(0.001)

    variants = {}
    for name, cdt in (("f32", None), ("bf16", jnp.bfloat16)):
        variants[name] = (
            gan.make_d_step(step, width_mult=width, from_rgb_activate=True,
                            tx=tx, compute_dtype=cdt),
            gan.make_g_step(step, width_mult=width, from_rgb_activate=True,
                            tx=tx, compute_dtype=cdt),
        )

    gen = jax.jit(lambda k: (
        jax.random.normal(k, (batch, res, res, 3)),
        jax.random.normal(jax.random.fold_in(k, 1), (1, batch, 512))))

    rep = 0
    for name, (d_step, g_step) in variants.items():
        real, zs = gen(jax.random.fold_in(jax.random.PRNGKey(5), rep))
        rep += 1
        t0 = time.perf_counter()
        pd, od, aux = d_step(params_d, opt_d, params_g, real, zs, sel,
                             alpha, lr, jax.random.PRNGKey(0))
        pg, og, ema, gl = g_step(params_g, opt_g, params_g, pd, zs, sel,
                                 alpha, lr, jax.random.PRNGKey(1))
        print(f"# {name}: compiled+first d+g in "
              f"{time.perf_counter() - t0:.1f}s "
              f"(d_loss {float(aux['disc_loss']):.3f}, "
              f"g_loss {float(gl):.3f})", flush=True)

    results = {n: [] for n in variants}
    for rnd in range(args.rounds):
        for name, (d_step, g_step) in variants.items():
            real, zs = gen(jax.random.fold_in(jax.random.PRNGKey(5), rep))
            rep += 1
            float(jnp.sum(real))
            t0 = time.perf_counter()
            pd, od, aux = d_step(params_d, opt_d, params_g, real, zs, sel,
                                 alpha, lr,
                                 jax.random.fold_in(jax.random.PRNGKey(6),
                                                    rep))
            pg, og, ema, gl = g_step(params_g, opt_g, params_g, pd, zs, sel,
                                     alpha, lr,
                                     jax.random.fold_in(jax.random.PRNGKey(7),
                                                        rep))
            float(aux["disc_loss"]); float(gl)
            results[name].append(time.perf_counter() - t0)

    print(f"\n== d+g step medians (res {res}, batch {batch}, "
          f"width x{width}, interleaved) ==")
    meds = {}
    for n, v in results.items():
        meds[n] = float(np.median(v))
        print(f"{n:5s} {meds[n]*1e3:8.1f} ms  "
              f"({batch / meds[n]:7.1f} imgs/sec)")
    print(f"bf16/f32 speedup: {meds['f32'] / meds['bf16']:.2f}x")


if __name__ == "__main__":
    main()
