"""Headline benchmark: ResNet-26 feature-extractor throughput (tiles/sec/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The baseline is the reference's workload run with PyTorch on CPU (the
reference publishes no machine-readable throughput — BASELINE.md — so the
agreed target is >=10x PyTorch-CPU tiles/sec/chip on the ResNet-26 forward).
The torch baseline model is built fresh here from the architecture spec
(narrow no-norm ResNet-26, widths 20/40/60/80, LeakyReLU(0.1); reference:
gbm/model.py:14-61) — not imported from the reference tree.

Usage: python bench.py [--quick]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.models import (
    resnet,
)

TILE_RES = 300  # live-driver network input resolution (gbm/classify_combined.py:412)


def _torch_cpu_baseline(batch: int, iters: int, res: int) -> float:
    """tiles/sec of an equivalent torch ResNet-26 forward on CPU."""
    import torch
    import torch.nn as nn

    class Block(nn.Module):
        def __init__(self, cin, cout, stride):
            super().__init__()
            self.c1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=True)
            self.c2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=True)
            self.act = nn.LeakyReLU(0.1)
            self.down = (nn.Conv2d(cin, cout, 1, stride, bias=False)
                         if stride != 1 or cin != cout else None)

        def forward(self, x):
            idt = self.down(x) if self.down is not None else x
            return self.act(self.c2(self.act(self.c1(x))) + idt)

    class Net(nn.Module):
        def __init__(self, widths=(20, 40, 60, 80), blocks=(3, 3, 3, 3)):
            super().__init__()
            self.stem = nn.Conv2d(3, widths[0], 7, 2, 3, bias=True)
            self.act = nn.LeakyReLU(0.1)
            self.pool = nn.MaxPool2d(3, 2, 1)
            layers, cin = [], widths[0]
            for si, (w, n) in enumerate(zip(widths, blocks)):
                for b in range(n):
                    layers.append(Block(cin, w, 2 if (si > 0 and b == 0) else 1))
                    cin = w
            self.layers = nn.Sequential(*layers)
            self.fc = nn.Linear(widths[-1], 80, bias=False)

        def forward(self, x):
            h = self.pool(self.act(self.stem(x)))
            h = self.layers(h)
            return self.fc(h.mean(dim=(2, 3)))

    net = Net().eval()
    x = torch.randn(batch, 3, res, res)
    with torch.no_grad():
        net(x)  # warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            net(x)
        dt = time.perf_counter() - t0
    return batch * iters / dt


def _jax_throughput(batch: int, iters: int, res: int) -> float:
    params = resnet.init_resnet26(jax.random.PRNGKey(0))
    fwd = jax.jit(lambda p, x: resnet.apply_resnet26(p, x,
                                                     compute_dtype=jnp.bfloat16))
    x = jnp.asarray(np.random.rand(batch, res, res, 3), jnp.float32)
    jax.block_until_ready(fwd(params, x))  # compile + warmup
    jax.block_until_ready(fwd(params, x))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, x)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return batch * iters / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small iteration counts")
    args = ap.parse_args()

    platform = jax.devices()[0].platform
    if args.quick or platform == "cpu":
        jbatch, jiters, tbatch, titers = 32, 5, 4, 2
    else:
        jbatch, jiters, tbatch, titers = 256, 20, 8, 3

    tiles_per_sec = _jax_throughput(jbatch, jiters, TILE_RES)
    try:
        baseline = _torch_cpu_baseline(tbatch, titers, TILE_RES)
    except Exception:
        baseline = float("nan")

    vs = tiles_per_sec / baseline if baseline == baseline else None
    print(json.dumps({
        "metric": "resnet26_forward_tiles_per_sec_per_chip",
        "value": round(tiles_per_sec, 2),
        "unit": f"tiles/sec ({TILE_RES}x{TILE_RES}, bf16, {platform})",
        "vs_baseline": round(vs, 3) if vs is not None else None,
    }))


if __name__ == "__main__":
    main()
