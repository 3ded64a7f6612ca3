"""Experiment: W8A8 int8 extractor vs the shipped bf16 path, interleaved
A/B at headline bench conditions (scan-megabatch over uint8 tiles) so
tunnel throttle drift between variants cancels.

Why it might win: PROFILE.md's counter-experiments argue the narrow
20/40/60/80 conv path is activation-traffic-bound — int8 halves the
inter-op activation bytes vs bf16, and the v5e MXU's int8 rate is 2x its
bf16 rate (394 TOPS vs 197 TFLOP/s datasheet). Why it might not: XLA's
int8 conv emitter may not hit the MXU int8 path at cin=3/20-80, and the
dequant->lrelu->requant glue adds VPU work per layer.

A = shipped headline forward (uint8 ingest -> bf16 convs).
B = uint8 ingest -> W8A8 int8 convs with int32 accumulation
    (ops/quant.py), activation scales calibrated on one batch.

Run:  python tools/exp_int8.py [--k 3] [--batch 4096] [--rounds 4]
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
    quant as Q,
)


def build_variants(params, qp, sc, impls=("conv",)):
    @jax.jit
    def fwd_a(p, x):  # shipped headline: bf16
        def step(_, xb):
            xf = xb.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
            return None, resnet.apply_resnet26(p, xf,
                                               compute_dtype=jnp.bfloat16)
        return lax.scan(step, None, x)[1]

    variants = {"full/bf16": (fwd_a, params)}

    def make_int8(impl):
        @jax.jit
        def fwd(qpp, x):  # int8 W8A8; impl picks the conv lowering
            def step(_, xb):
                xf = xb.astype(jnp.float32) / jnp.float32(255.0)
                return None, Q.apply_resnet26_int8(qpp, sc, xf, impl=impl)
            return lax.scan(step, None, x)[1]
        return fwd

    for impl in impls:
        variants[f"full/int8-{impl}"] = (make_int8(impl), qp)
    return variants


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--res", type=int, default=300)
    ap.add_argument("--impl", default="all",
                    choices=["conv", "dot", "shift", "both", "all"],
                    help="int8 conv lowering(s) to A/B against bf16: XLA "
                         "int8 conv, im2col+dot_general (kh*kw-times "
                         "patch buffer — shrink --batch), shift-add thin "
                         "dots, the first two, or all three. All are "
                         "bit-identical math")
    args = ap.parse_args()
    K, B, RES = args.k, args.batch, args.res

    params = resnet.init_resnet26(jax.random.PRNGKey(0))
    calib_u8 = jax.jit(lambda k: jax.random.randint(
        k, (256, RES, RES, 3), 0, 256, jnp.uint8))(jax.random.PRNGKey(7))
    calib = calib_u8.astype(jnp.float32) / 255.0
    qp, sc = Q.quantize_and_calibrate(params, calib)
    qp = jax.device_put(qp)
    impls = {"both": ("conv", "dot"),
             "all": ("conv", "dot", "shift")}.get(args.impl, (args.impl,))
    variants = build_variants(params, qp, sc, impls)

    shape = (K, B, RES, RES, 3)
    gen = jax.jit(lambda k: jax.random.randint(k, shape, 0, 256, jnp.uint8))
    checksum = jax.jit(lambda a: jnp.sum(a, dtype=jnp.float32))

    def fresh(rep):
        x = gen(jax.random.fold_in(jax.random.PRNGKey(1), rep))
        float(checksum(x))
        return x

    # numeric sanity at a tiny batch before timing
    xs = fresh(99)[:1, :8]
    ya = variants["full/bf16"][0](params, xs).astype(jnp.float32)
    yb = variants[f"full/int8-{impls[0]}"][0](qp, xs).astype(jnp.float32)
    ya_n, yb_n = np.asarray(ya[0], np.float64), np.asarray(yb[0], np.float64)
    cos = np.sum(ya_n * yb_n, -1) / (np.linalg.norm(ya_n, axis=-1)
                                     * np.linalg.norm(yb_n, axis=-1))
    print(f"# numeric check (8 tiles): cos(bf16, int8) min={cos.min():.5f}")

    for name, (fn, p) in variants.items():
        t0 = time.perf_counter()
        float(jnp.sum(fn(p, fresh(10_000 + hash(name) % 100))
                      .astype(jnp.float32)))
        print(f"# compiled {name} in {time.perf_counter() - t0:.1f}s")

    results = {name: [] for name in variants}
    rep = 0
    for rnd in range(args.rounds):
        for name, (fn, p) in variants.items():  # interleaved
            x = fresh(rep)
            rep += 1
            t0 = time.perf_counter()
            out = fn(p, x)
            float(jnp.sum(out.astype(jnp.float32)))
            dt = time.perf_counter() - t0
            results[name].append(K * B / dt)
        print(f"# round {rnd}: " + "  ".join(
            f"{n}={results[n][-1]:.0f}" for n in results))
    print()
    for name in results:
        med = float(np.median(results[name]))
        print(f"{name:12s} {med:10.0f} tiles/s")
    a = float(np.median(results["full/bf16"]))
    for impl in impls:
        b = float(np.median(results[f"full/int8-{impl}"]))
        print(f"int8-{impl}/bf16 = {b / a:.3f}x")


if __name__ == "__main__":
    main()
