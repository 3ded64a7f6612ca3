"""Interleaved sweep of the headline scan-megabatch geometry: K microbatches
of B tiles per dispatch. Round-robin across configs so tunnel throttle
drift cancels. Informs bench.py's (K, B) choice.

Run:  python tools/exp_megabatch.py [--rounds 3]
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

# pairwise A/B (pass --configs "8x1024,4x2048"): more than ~2 resident
# 2.2G geometries trip HBM padding-expansion OOMs on the 16G chip
CONFIGS = [(8, 1024), (4, 2048)]


def main():
    global CONFIGS
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--configs", type=str, default=None,
                    help='e.g. "8x1024,16x512"')
    args = ap.parse_args()
    if args.configs:
        CONFIGS = [tuple(int(v) for v in c.split("x"))
                   for c in args.configs.split(",")]
    params = resnet.init_resnet26(jax.random.PRNGKey(0))

    @jax.jit
    def fwd(p, x):
        def step(_, xb):
            xf = xb.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
            return None, resnet.apply_resnet26(p, xf,
                                               compute_dtype=jnp.bfloat16)
        if x.ndim == 4:  # K==1 runs as a plain batch (see make())
            return step(None, x)[1]
        return lax.scan(step, None, x)[1]

    # fused checksum: eager astype(f32) materializes a 4x temp (PROFILE.md
    # "memory gotchas")
    checksum = jax.jit(lambda a: jnp.sum(a, dtype=jnp.float32))

    def make(K, B, seed):
        # one input resident at a time; randint's u32 bit intermediate is
        # 4x the u8 output, so keep K*B <= ~8192 tiles per config. K==1
        # drops the leading dim — XLA tile-pads a 1-sized u8 leading dim
        # 4x (PROFILE.md), which alone OOMs at B=8192.
        key = jax.random.PRNGKey(seed)
        if K >= 4:
            # whole-array randint's u32 intermediate (4x the u8) exceeds
            # HBM from K=4: generate per-microbatch and stack (K>=4 leaves
            # the T(4,128) leading-dim tile unpadded or mildly padded)
            gen = jax.jit(lambda k: jax.random.randint(
                k, (B, 300, 300, 3), 0, 256, jnp.uint8))
            x = jnp.stack([gen(jax.random.fold_in(key, i))
                           for i in range(K)])
        else:
            shape = (B, 300, 300, 3) if K == 1 else (K, B, 300, 300, 3)
            x = jax.jit(lambda k: jax.random.randint(
                k, shape, 0, 256, jnp.uint8))(key)
        float(checksum(x))
        return x

    res = {kb: [] for kb in CONFIGS}
    for kb in CONFIGS:  # compile each geometry once up front
        x = make(*kb, 0)
        float(jnp.sum(fwd(params, x).astype(jnp.float32)))
        del x

    for r in range(args.rounds):
        for kb in CONFIGS:
            K, B = kb
            x = make(K, B, 100 * r + K + B)
            t0 = time.perf_counter()
            out = fwd(params, x)
            float(jnp.sum(out.astype(jnp.float32)))
            res[kb].append(K * B / (time.perf_counter() - t0))
            del x, out
    for kb in CONFIGS:
        v = np.asarray(res[kb])
        print(f"K={kb[0]:2d} B={kb[1]:4d}: median {np.median(v):,.0f} "
              f"tiles/s  (all: {[f'{x:,.0f}' for x in v]})")


if __name__ == "__main__":
    main()
