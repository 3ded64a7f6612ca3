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

# 8192 tiles/dispatch at three microbatch sizes isolates the microbatch
# dimension at constant dispatch size + footprint; (4,1024)/(16,1024)
# probe the dispatch-size dimension
CONFIGS = [(4, 1024), (8, 1024), (16, 1024), (4, 2048), (16, 512)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()
    params = resnet.init_resnet26(jax.random.PRNGKey(0))

    @jax.jit
    def fwd(p, x):
        def step(_, xb):
            xf = xb.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
            return None, resnet.apply_resnet26(p, xf,
                                               compute_dtype=jnp.bfloat16)
        return lax.scan(step, None, x)[1]

    def make(K, B, seed):
        # one input resident at a time, generated per-microbatch: randint
        # materializes u32 bits (4x the u8 size), so a whole-array
        # generate OOMs at the larger geometries
        gen = jax.jit(lambda k: jax.random.randint(
            k, (B, 300, 300, 3), 0, 256, jnp.uint8))
        key = jax.random.PRNGKey(seed)
        chunks = [gen(jax.random.fold_in(key, i)) for i in range(K)]
        x = jnp.stack(chunks)
        del chunks
        float(jnp.sum(x.astype(jnp.float32)))
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
