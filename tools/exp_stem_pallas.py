"""Counter-experiment #6: fused u8 Pallas stem vs XLA's stem, interleaved
A/B at headline bench conditions (scan-megabatch, K x B uint8 tiles per
dispatch) so tunnel throttle drift between variants cancels (the
exp_s2d2.py lesson: non-interleaved A/Bs on the tunnel device are
invalid).

A = the shipped headline forward (XLA stem).
B = ops/pallas_stem.stem_u8_conv (implicit-GEMM halo kernel) + XLA tail.
C = stem-only variants (just the stem, no residual tail), to isolate the
    stem delta from the tail's shared cost.

Run:  python tools/exp_stem_pallas.py [--k 6] [--batch 2048] [--rounds 4]

Geometry note: the headline bench scans 3x4096; here both variants scan
6x2048 (same 12288 tiles/dispatch) because the pallas variant's stride-
256-padded stem output (6.3 GB at B=4096, before unpack) plus the scan
transients exceed the 15.75 GB HBM — B=2048 fits both variants and the
A/B stays internally consistent.
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax import lax

from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.models import (  # noqa: E501
    resnet,
)
from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.ops import (  # noqa: E501
    nn as N,
    pallas_stem,
)


def tail(p, h):
    for stage_idx, stage in enumerate(p["stages"]):
        for bi, block in enumerate(stage):
            stride = 2 if (stage_idx > 0 and bi == 0) else 1
            h = resnet.apply_block(block, h, stride,
                                   compute_dtype=jnp.bfloat16)
    h = N.global_avg_pool(h)
    return N.linear(h, p["fc"]["w"], compute_dtype=jnp.bfloat16)


def build_variants(params):
    @jax.jit
    def fwd_a(p, x):  # shipped headline: XLA stem + tail
        def step(_, xb):
            xf = xb.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
            return None, resnet.apply_resnet26(p, xf,
                                               compute_dtype=jnp.bfloat16)
        return lax.scan(step, None, x)[1]

    @jax.jit
    def fwd_b(p, x):  # pallas fused u8 stem + XLA tail
        def step(_, xb):
            h = pallas_stem.stem_u8_conv(p["conv1"], xb,
                                         alpha=1.0 / 255.0, beta=0.0)
            h = N.leaky_relu(h.astype(jnp.bfloat16))
            h = N.max_pool(h, window=3, stride=2, padding=1)
            return None, tail(p, h)
        return lax.scan(step, None, x)[1]

    @jax.jit
    def stem_a(p, x):  # stem only (conv+lrelu+pool), XLA
        def step(_, xb):
            xf = xb.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
            return None, resnet.apply_stem(p, xf,
                                           compute_dtype=jnp.bfloat16)
        return lax.scan(step, None, x)[1]

    @jax.jit
    def stem_b(p, x):  # stem only, pallas
        def step(_, xb):
            h = pallas_stem.stem_u8_conv(p["conv1"], xb,
                                         alpha=1.0 / 255.0, beta=0.0)
            h = N.leaky_relu(h.astype(jnp.bfloat16))
            return None, N.max_pool(h, window=3, stride=2, padding=1)
        return lax.scan(step, None, x)[1]

    return {"full/xla": fwd_a, "full/pallas": fwd_b,
            "stem/xla": stem_a, "stem/pallas": stem_b}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=12)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--rounds", type=int, default=4)
    args = ap.parse_args()
    K, B = args.k, args.batch

    params = resnet.init_resnet26(jax.random.PRNGKey(0))
    variants = build_variants(params)

    shape = (K, B, 300, 300, 3)
    gen = jax.jit(lambda k: jax.random.randint(k, shape, 0, 256, jnp.uint8))
    checksum = jax.jit(lambda a: jnp.sum(a, dtype=jnp.float32))

    def fresh(rep):
        x = gen(jax.random.fold_in(jax.random.PRNGKey(1), rep))
        float(checksum(x))
        return x

    # numeric sanity at a tiny batch before timing
    xs = fresh(99)[:1, :8]
    ya = variants["full/xla"](params, xs)
    yb = variants["full/pallas"](params, xs)
    err = float(jnp.max(jnp.abs(ya.astype(jnp.float32)
                                - yb.astype(jnp.float32))))
    print(f"# numeric check (8 tiles): max |a-b| = {err:.5f}")

    # compile all variants
    for name, fn in variants.items():
        t0 = time.perf_counter()
        float(jnp.sum(fn(params, fresh(10_000 + hash(name) % 100))
                      .astype(jnp.float32)))
        print(f"# compiled {name} in {time.perf_counter() - t0:.1f}s")

    results = {name: [] for name in variants}
    rep = 0
    for rnd in range(args.rounds):
        for name, fn in variants.items():  # interleaved
            x = fresh(rep)
            rep += 1
            t0 = time.perf_counter()
            out = fn(params, x)
            float(jnp.sum(out.astype(jnp.float32)))
            dt = time.perf_counter() - t0
            results[name].append(K * B / dt)
        print(f"# round {rnd}: " + "  ".join(
            f"{n}={results[n][-1]:.0f}" for n in results))
    print()
    for name in results:
        med = float(np.median(results[name]))
        print(f"{name:12s} {med:10.0f} tiles/s")
    for scope in ("full", "stem"):
        a = float(np.median(results[f"{scope}/xla"]))
        b = float(np.median(results[f"{scope}/pallas"]))
        print(f"{scope}: pallas/xla = {b / a:.3f}x")


if __name__ == "__main__":
    main()
