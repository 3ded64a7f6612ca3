"""Where does the StyleGAN WGAN-GP step spend its time on TPU?

Decomposes the config-7 workload (VERDICT r2 missing #1): generator
forward, discriminator forward, d-gradient WITHOUT the gradient penalty,
d-gradient WITH it (the marginal is the GP double-backward), the full
d_step and g_step, plus microbenchmarks of the ops the reference
implements with custom autograd — blur and fused up/down-sampling — vs
their plain alternatives at the shapes the trainer actually runs.

All comparisons are interleaved within one process so tunnel throttle
drift cancels; every timed call takes a never-seen input and ends with a
host fetch (PROFILE.md "fixed per-dispatch overhead").

Run:  python tools/profile_gan.py [--res 64] [--batch 64] [--rounds 3]
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


def build_timed(res, batch, width, compute_dtype=None):
    step = int(math.log2(res)) - 2
    k_g, k_d = jax.random.split(jax.random.PRNGKey(0))
    params_g = sg.init_styled_generator(k_g, width_mult=width)
    params_d = sg.init_discriminator(k_d, width_mult=width)
    tx = gan.make_optimizers()
    opt_g = tx.init(params_g)
    opt_d = tx.init(params_d)
    n_blocks = len(sg._gen_layout(width))
    sel = jnp.zeros((n_blocks,), jnp.int32)
    alpha = jnp.float32(0.5)
    lr = jnp.float32(0.001)

    d_step = gan.make_d_step(step, width_mult=width, from_rgb_activate=True,
                             tx=tx, compute_dtype=compute_dtype)
    g_step = gan.make_g_step(step, width_mult=width, from_rgb_activate=True,
                             tx=tx, compute_dtype=compute_dtype)

    @jax.jit
    def g_fwd(pg, zs, key):
        noise = sg.make_noise(key, zs.shape[1], step)
        return sg.apply_styled_generator(pg, zs, noise, step=step,
                                         alpha=alpha, width_mult=width)

    @jax.jit
    def d_fwd(pd, x, key):
        return sg.apply_discriminator(pd, x, step=step, alpha=alpha,
                                      width_mult=width, train=True, rng=key)

    def d_loss_no_gp(pd, real, fake, key):
        k1, k2 = jax.random.split(key)
        rp = sg.apply_discriminator(pd, real, step=step, alpha=alpha,
                                    width_mult=width, train=True, rng=k1)
        fp = sg.apply_discriminator(pd, fake, step=step, alpha=alpha,
                                    width_mult=width, train=True, rng=k2)
        return (-(rp.mean() - 0.001 * (rp ** 2).mean()) + fp.mean())

    d_grad_no_gp = jax.jit(jax.grad(d_loss_no_gp))

    def gp_only(pd, real, fake, key):
        k_eps, k_drop = jax.random.split(key)
        eps = jax.random.uniform(k_eps, (real.shape[0], 1, 1, 1))
        x_hat = eps * real + (1 - eps) * fake

        def d_sum(xh):
            return sg.apply_discriminator(pd, xh, step=step, alpha=alpha,
                                          width_mult=width, train=True,
                                          rng=k_drop).sum()
        g = jax.grad(d_sum)(x_hat)
        norms = jnp.sqrt((g.reshape(g.shape[0], -1) ** 2).sum(axis=1))
        return 10.0 * ((norms - 1.0) ** 2).mean()

    gp_grad = jax.jit(jax.grad(gp_only))

    def run_d_step(pd, od, pg, real, zs, key):
        return d_step(pd, od, pg, real, zs, sel, alpha, lr, key)

    return {
        "params": (params_g, params_d, opt_g, opt_d),
        "fns": {
            "g_fwd": lambda r, z, k: g_fwd(params_g, z, k),
            "d_fwd": lambda r, z, k: d_fwd(params_d, r, k),
            "d_grad_no_gp": lambda r, z, k: d_grad_no_gp(
                params_d, r, jnp.flip(r, 1), k),
            "gp_grad_only": lambda r, z, k: gp_grad(
                params_d, r, jnp.flip(r, 1), k),
            "d_step_full": lambda r, z, k: run_d_step(
                params_d, opt_d, params_g, r, z, k)[2],
            "g_step_full": lambda r, z, k: g_step(
                params_g, opt_g, params_g, params_d, z, sel, alpha, lr,
                k)[3],
        },
        "step": step,
    }


def fetch(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]
                         .astype(jnp.float32)))


def time_fns(fns, res, batch, rounds):
    gen = jax.jit(lambda k: (
        jax.random.normal(k, (batch, res, res, 3)),
        jax.random.normal(jax.random.fold_in(k, 1), (1, batch, 512))))
    results = {n: [] for n in fns}
    rep = 0
    for name, fn in fns.items():
        r, z = gen(jax.random.fold_in(jax.random.PRNGKey(5), 10_000 + rep))
        rep += 1
        t0 = time.perf_counter()
        fetch(fn(r, z, jax.random.PRNGKey(0)))
        print(f"# compiled {name} in {time.perf_counter() - t0:.1f}s",
              flush=True)
    for rnd in range(rounds):
        for name, fn in fns.items():  # interleaved
            r, z = gen(jax.random.fold_in(jax.random.PRNGKey(5), rep))
            rep += 1
            fetch(r)
            t0 = time.perf_counter()
            fetch(fn(r, z, jax.random.fold_in(jax.random.PRNGKey(6), rep)))
            results[name].append(time.perf_counter() - t0)
    return {n: float(np.median(v)) * 1e3 for n, v in results.items()}


def op_microbench(res, batch, width, rounds):
    """blur / fused-down vs plain-down at the discriminator's first-block
    shape; fused-up vs interp-up at the generator's last-block shape."""
    layout, ch = sg._disc_layout(width)
    step = int(math.log2(res)) - 2
    n_layer = len(layout)
    spec = layout[n_layer - step - 1]
    cin, cout = spec[0], spec[1]
    key = jax.random.PRNGKey(0)
    w5 = jax.random.normal(key, (5, 5, cin, cout))
    b5 = jnp.zeros((cout,))

    fns = {
        "blur": jax.jit(lambda x: sg.blur(x)),
        "fused_down": jax.jit(
            lambda x: sg.fused_downsample(x, w5, b5, padding=2)),
        "plain_down": jax.jit(lambda x: jax.lax.reduce_window(
            sg.equal_conv2d(x, w5, b5, padding=2), 0.0, jax.lax.add,
            (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0),
        "fused_up": jax.jit(
            lambda x: sg.fused_upsample(
                x, jax.random.normal(key, (5, 5, cin, cin)),
                jnp.zeros((cin,)), padding=2)),
    }
    gen = jax.jit(lambda k: jax.random.normal(k, (batch, res, res, cin)))
    out = {n: [] for n in fns}
    rep = 0
    for name, fn in fns.items():
        fetch(fn(gen(jax.random.fold_in(key, 999 + rep))))
        rep += 1
    for _ in range(rounds):
        for name, fn in fns.items():
            x = gen(jax.random.fold_in(key, rep))
            rep += 1
            fetch(x)
            t0 = time.perf_counter()
            fetch(fn(x))
            out[name].append(time.perf_counter() - t0)
    return {n: float(np.median(v)) * 1e3 for n, v in out.items()}, cin


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--width", type=float, default=1.0)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16", "ab"],
                    help="compute dtype for d_step/g_step (the full-step "
                    "rows only; the standalone fwd/grad rows stay f32). "
                    "'ab' interleaves f32 and bf16 full steps in ONE "
                    "process so the tunnel's cross-process drift cancels")
    args = ap.parse_args()

    if args.dtype == "ab":
        fns = {}
        for tag, cdt in (("f32", None), ("bf16", jnp.bfloat16)):
            built = build_timed(args.res, args.batch, args.width,
                                compute_dtype=cdt)
            for n in ("d_step_full", "g_step_full"):
                fns[f"{n}_{tag}"] = built["fns"][n]
        times = time_fns(fns, args.res, args.batch, args.rounds)
        print(f"\n== interleaved f32 vs bf16 (res {args.res}, batch "
              f"{args.batch}, width x{args.width}, {args.rounds} rounds) ==")
        for n, ms in times.items():
            print(f"{n:18s} {ms:8.1f} ms")
        for n in ("d_step_full", "g_step_full"):
            print(f"{n}: bf16/f32 = "
                  f"{times[f'{n}_bf16'] / times[f'{n}_f32']:.3f}x")
        return

    cdt = {"f32": None, "bf16": jnp.bfloat16}[args.dtype]
    built = build_timed(args.res, args.batch, args.width, compute_dtype=cdt)
    times = time_fns(built["fns"], args.res, args.batch, args.rounds)
    print(f"\n== per-piece medians (res {args.res}, batch {args.batch}, "
          f"width x{args.width}) ==")
    for n, ms in times.items():
        print(f"{n:14s} {ms:8.1f} ms")
    gp_marginal = times["d_step_full"] - times["d_grad_no_gp"]
    print(f"{'gp_marginal':14s} {gp_marginal:8.1f} ms  "
          "(d_step_full - d_grad_no_gp; includes Adam+fake gen)")

    ops, cin = op_microbench(args.res, args.batch, args.width, args.rounds)
    print(f"\n== op microbench ([{args.batch}, {args.res}, {args.res}, "
          f"{cin}]) ==")
    for n, ms in ops.items():
        print(f"{n:14s} {ms:8.2f} ms")


if __name__ == "__main__":
    main()
