"""Confirming run for the s2d stem: interleaved A/B at headline bench
conditions (scan-megabatch, K x B uint8 per dispatch), so tunnel throttle
drift between variants cancels. See tools/exp_s2d.py for the derivation.

Run:  python tools/exp_s2d2.py [--k 8] [--batch 1024] [--rounds 4]
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
from tools.exp_s2d import s2d_u8, s2d_weights


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--rounds", type=int, default=4)
    args = ap.parse_args()
    K, B = args.k, args.batch

    params = resnet.init_resnet26(jax.random.PRNGKey(0))
    w4 = jnp.asarray(s2d_weights(params["conv1"]["w"]))

    @jax.jit
    def fwd_a(p, x):
        def step(_, xb):
            xf = xb.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
            return None, resnet.apply_resnet26(p, xf,
                                               compute_dtype=jnp.bfloat16)
        return lax.scan(step, None, x)[1]

    def tail(p, h):
        from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.ops import (  # noqa: E501
            nn as N,
        )
        for stage_idx, stage in enumerate(p["stages"]):
            for bi, block in enumerate(stage):
                stride = 2 if (stage_idx > 0 and bi == 0) else 1
                h = resnet.apply_block(block, h, stride,
                                       compute_dtype=jnp.bfloat16)
        h = N.global_avg_pool(h)
        return N.linear(h, p["fc"]["w"], compute_dtype=jnp.bfloat16)

    @jax.jit
    def fwd_b(p, x):
        from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.ops import (  # noqa: E501
            nn as N,
        )

        def step(_, xb):
            y = s2d_u8(xb).astype(jnp.bfloat16) / jnp.bfloat16(255.0)
            h = N.conv2d(y, w4, p["conv1"]["b"], stride=1,
                         padding=[(2, 1), (2, 1)],
                         compute_dtype=jnp.bfloat16)
            h = N.max_pool(N.leaky_relu(h))
            return None, tail(p, h)
        return lax.scan(step, None, x)[1]

    base = jax.random.randint(jax.random.PRNGKey(1), (K, B, 300, 300, 3),
                              0, 256, jnp.uint8)
    fresh = jax.jit(lambda b, v: b ^ v)

    def mk(i):
        x = fresh(base, jnp.uint8(i % 254 + 1))
        float(jnp.sum(x.astype(jnp.float32)))
        return x

    for f in (fwd_a, fwd_b):
        float(jnp.sum(f(params, mk(0)).astype(jnp.float32)))  # compile

    res = {"A": [], "B": []}
    for r in range(args.rounds):
        for name, f in (("A", fwd_a), ("B", fwd_b)):
            x = mk(10 * r + (0 if name == "A" else 1))
            t0 = time.perf_counter()
            out = f(params, x)
            float(jnp.sum(out.astype(jnp.float32)))
            dt = time.perf_counter() - t0
            res[name].append(K * B / dt)
            del x, out
    for name in ("A", "B"):
        v = np.asarray(res[name])
        print(f"{name}: median {np.median(v):,.0f} tiles/s  "
              f"(all: {[f'{x:,.0f}' for x in v]})")
    print(f"speedup B/A = {np.median(res['B']) / np.median(res['A']):.3f}x")


if __name__ == "__main__":
    main()
