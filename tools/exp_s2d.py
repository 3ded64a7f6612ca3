"""Experiment: space-to-depth stem with the rearrange FUSED into the uint8
ingest kernel.

Round-2 PROFILE.md measured the stem (conv 7x7 s2 cin=3) at half the
forward's compute time and 7% MFU, and found a standalone bf16
space-to-depth transpose costs more than the cin=12 conv saves (1.1x
slower overall). Hypothesis here: the ingest already pays one full
elementwise pass (uint8 -> bf16, /255) writing the stem's input to HBM —
if the s2d rearrange rides THAT kernel's write pattern, its marginal cost
may be far below a standalone transpose, letting the 4x4 s1 cin=12 conv
win.

Variants, all starting from a device-resident uint8 [B,300,300,3] tile
batch (the production ingest format, reference tile pipeline
RoiBuilder.py:193-210):

  A  baseline : cast+/255 -> conv7x7 s2 p3 +b -> lrelu -> maxpool3 s2 p1
  B  s2d-fused: (cast+/255+s2d in one jit region) -> conv4x4 s1 p(2,1)
                cin=12 +b -> lrelu -> maxpool
  C  s2d-pre  : input ALREADY [B,150,150,12] uint8 (host-side layout) ->
                cast+/255 -> conv4x4 -> lrelu -> maxpool   (isolates the
                on-device rearrange cost; host rearrange is a cheap uint8
                reshape at decode time)
  F  full fwd : A vs B embedded in the full ResNet-26 forward.

Run:  python tools/exp_s2d.py [--batch 1024] [--iters 5]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.models import (  # noqa: E501
    resnet,
)
from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.ops import (  # noqa: E501
    nn as N,
)


# the SHIPPED implementations (models/resnet.py) are the single source of
# truth for the rearrange math — the experiment must measure exactly what
# MILConfig(stem="s2d") runs
def s2d_weights(w7) -> np.ndarray:
    return np.asarray(resnet.stem_s2d_kernel(jnp.asarray(w7)))


s2d_u8 = resnet.space_to_depth2


def timed(fn, make_input, iters):
    """Median seconds; fresh never-executed inputs per call (axon result
    cache), timed region ends in a host fetch."""
    ts = []
    for i in range(iters):
        x = make_input(i)
        t0 = time.perf_counter()
        out = fn(x)
        float(jnp.sum(out.astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
        del x, out
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    B = args.batch

    params = resnet.init_resnet26(jax.random.PRNGKey(0))
    w7 = params["conv1"]["w"]
    b1 = params["conv1"]["b"]
    w4 = jnp.asarray(s2d_weights(w7))

    base = jax.random.randint(jax.random.PRNGKey(1), (B, 300, 300, 3),
                              0, 256, jnp.uint8)

    fresh = jax.jit(lambda b, v: b ^ v)

    def mk(i):
        x = fresh(base, jnp.uint8(i % 254 + 1))
        float(jnp.sum(x.astype(jnp.float32)))
        return x

    def mk_pre(i):  # pre-arranged s2d uint8 input (host-side layout)
        x = jax.jit(s2d_u8)(fresh(base, jnp.uint8(i % 254 + 1)))
        float(jnp.sum(x.astype(jnp.float32)))
        return x

    @jax.jit
    def stem_a(x):
        xf = x.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
        h = N.conv2d(xf, w7, b1, stride=2, padding=3,
                     compute_dtype=jnp.bfloat16)
        return N.max_pool(N.leaky_relu(h))

    @jax.jit
    def stem_b(x):
        y = s2d_u8(x).astype(jnp.bfloat16) / jnp.bfloat16(255.0)
        h = N.conv2d(y, w4, b1, stride=1, padding=[(2, 1), (2, 1)],
                     compute_dtype=jnp.bfloat16)
        return N.max_pool(N.leaky_relu(h))

    @jax.jit
    def stem_c(y8):
        y = y8.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
        h = N.conv2d(y, w4, b1, stride=1, padding=[(2, 1), (2, 1)],
                     compute_dtype=jnp.bfloat16)
        return N.max_pool(N.leaky_relu(h))

    def tail(h):  # stages after the stem
        for stage_idx, stage in enumerate(params["stages"]):
            for bi, block in enumerate(stage):
                stride = 2 if (stage_idx > 0 and bi == 0) else 1
                h = resnet.apply_block(block, h, stride,
                                       compute_dtype=jnp.bfloat16)
        h = N.global_avg_pool(h)
        return N.linear(h, params["fc"]["w"], compute_dtype=jnp.bfloat16)

    full_a = jax.jit(lambda x: tail(stem_a.__wrapped__(x)))
    full_b = jax.jit(lambda x: tail(stem_b.__wrapped__(x)))

    # numerics: bf16 stems must agree closely
    xa = mk(0)
    da = np.asarray(stem_a(xa), np.float32)
    db = np.asarray(stem_b(xa), np.float32)
    err = np.max(np.abs(da - db))
    print(f"numerics max|A-B| = {err:.2e}  (bf16)")
    assert err < 3e-2, "s2d stem diverges"

    for name, fn, mki in [("A stem baseline   ", stem_a, mk),
                          ("B stem s2d-fused  ", stem_b, mk),
                          ("C stem s2d-prearr ", stem_c, mk_pre),
                          ("A full forward    ", full_a, mk),
                          ("B full forward s2d", full_b, mk)]:
        fn(mki(0))  # compile+warm
        sec = timed(fn, mki, args.iters)
        print(f"{name}: {sec * 1e3:7.2f} ms   ({B / sec:,.0f} tiles/s)")


if __name__ == "__main__":
    main()
