"""Per-stage profile of the ResNet-26 forward on the current default device.

Times each segment (stem / stage1..4 / pool+fc) as its own jitted program
with never-seen-before inputs (the axon runtime caches identical
executions) and a host fetch to end the timed region, then prints a table
of seconds, analytic GFLOPs, achieved TFLOP/s, and share of total — the
evidence VERDICT r1 asked for ("where does the other 85% go?").

Also times the FULL fused forward for comparison: segment times include a
per-dispatch tunnel RTT the fused program pays only once, so the gap
between sum-of-segments and the fused run bounds the dispatch overhead.

Usage:
    python tools/profile_stages.py [--batch 128] [--iters 6] [--res 300]
    python tools/profile_stages.py --device-calibration   # MXU peak probe
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.models import resnet
from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.ops import nn as N


def conv_flops(h, w, kh, kw, cin, cout):
    """MACs*2 for one conv producing an h x w x cout map."""
    return 2.0 * h * w * kh * kw * cin * cout


def segment_flops(res=300, widths=(20, 40, 60, 80), blocks=(3, 3, 3, 3)):
    """Analytic per-tile FLOPs for stem / each stage / fc at `res`."""
    out = {}
    h = (res + 1) // 2  # stem conv s2 p3
    out["stem"] = conv_flops(h, h, 7, 7, 3, widths[0])
    h = (h + 1) // 2  # maxpool s2 p1
    cin = widths[0]
    for si, (wd, nb) in enumerate(zip(widths, blocks)):
        f = 0.0
        for b in range(nb):
            stride = 2 if (si > 0 and b == 0) else 1
            ho = (h + stride - 1) // stride
            f += conv_flops(ho, ho, 3, 3, cin, wd)      # conv1
            f += conv_flops(ho, ho, 3, 3, wd, wd)       # conv2
            if stride != 1 or cin != wd:
                f += conv_flops(ho, ho, 1, 1, cin, wd)  # downsample
            h, cin = ho, wd
        out[f"stage{si + 1}"] = f
    out["pool_fc"] = 2.0 * widths[-1] * resnet.EMBED_DIM
    return out


def _stage(base, n):
    """n distinct device-resident variants of `base`, materialized."""
    make = jax.jit(lambda b, i: b * (1.0 + 1e-3 * i))
    xs = [make(base, jnp.float32(i + 1)) for i in range(n)]
    float(sum(jnp.sum(x) for x in xs))
    return xs


def time_fn(fn, base, iters, repeats=3):
    """Median seconds per call of jitted `fn` over fresh inputs."""
    jfn = jax.jit(fn)
    float(jnp.sum(jfn(base)))  # compile + warmup
    med = []
    for rep in range(repeats):
        xs = _stage(base * (1.0 + 0.01 * (rep + 1)), iters)
        t0 = time.perf_counter()
        outs = [jfn(x) for x in xs]
        float(sum(jnp.sum(o) for o in outs))
        med.append((time.perf_counter() - t0) / iters)
    return float(np.median(med))


def build_segments(params, compute_dtype=jnp.bfloat16):
    """(name, fn, input_shape) for each forward segment at any input res."""
    act = N.leaky_relu

    def stem(x):
        h = N.conv2d(x, params["conv1"]["w"], params["conv1"]["b"], stride=2,
                     padding=3, compute_dtype=compute_dtype)
        return N.max_pool(act(h))

    def make_stage(si):
        def run(x):
            h = x
            for b, block in enumerate(params["stages"][si]):
                stride = 2 if (si > 0 and b == 0) else 1
                h = resnet.apply_block(block, h, stride,
                                       compute_dtype=compute_dtype)
            return h
        return run

    def pool_fc(x):
        return N.linear(N.global_avg_pool(x), params["fc"]["w"],
                        compute_dtype=compute_dtype)

    return [("stem", stem), ("stage1", make_stage(0)),
            ("stage2", make_stage(1)), ("stage3", make_stage(2)),
            ("stage4", make_stage(3)), ("pool_fc", pool_fc)]


def calibration_tflops(chains: int = 16, repeats: int = 2) -> float:
    """Achievable bf16 matmul TFLOP/s right now: chained 4096^3 matmuls,
    fresh never-executed inputs per timed call, timed region ended with a
    host fetch. The ONE canonical probe — bench.py's headline
    `device_matmul_tflops` and the --device-calibration CLI both use it,
    so cross-round normalization compares like with like."""
    n = 4096
    x = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.float32)

    @jax.jit
    def chain(x):
        y = x.astype(jnp.bfloat16)
        for _ in range(chains):
            y = jnp.dot(y, y)
            y = y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-6)
        return jnp.sum(y.astype(jnp.float32))

    float(chain(x))  # compile + warmup
    best = np.inf
    for i in range(repeats):
        xv = jax.jit(lambda b, i: b * (1.0 + 1e-3 * i))(x, jnp.float32(i + 1))
        float(jnp.sum(xv))
        t0 = time.perf_counter()
        float(chain(xv))
        best = min(best, time.perf_counter() - t0)
    return chains * 2 * n**3 / best / 1e12


def device_calibration(iters=8):
    """Achievable bf16 matmul TFLOP/s on this device right now (the tunnel
    device throttles erratically; compare model TFLOP/s against THIS, not
    the v5e datasheet). Two chain depths so the fixed per-dispatch cost
    can be cancelled out (marginal rate, PROFILE.md)."""
    for chains in (16, 32):
        tf = calibration_tflops(chains, repeats=max(iters // 4, 2))
        print(json.dumps({"chains": chains,
                          "matmul_tflops": round(tf, 2)}))


def profile_train(tiles_per_bag=512, res=300, iters=3):
    """Decompose the single-bag training step: forward-only vs
    forward+backward vs the full step incl. Adam, remat on/off.
    Device-resident inputs (the H2D cost is a separate, documented story —
    PROFILE.md 'the 14.4s mystery')."""
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.models import (
        attention_mil as amil,
    )
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.parallel import (
        steps,
    )

    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.random((tiles_per_bag, res, res, 3)), jnp.float32)
    mask = jnp.ones((tiles_per_bag,), jnp.float32)
    key = jax.random.PRNGKey(0)
    print(f"train-step profile  bag={tiles_per_bag}x{res}px bf16 "
          f"device={jax.devices()[0].platform}")
    for remat in (False, True):
        cfg = amil.MILConfig(remat=remat)
        params = amil.init_attention_mil(jax.random.PRNGKey(0), cfg)
        state = steps.init_train_state(params)
        tx = steps.make_optimizer()

        def fwd_only(p, x):
            return amil.apply_attention_mil(
                p, x, 0, cfg, mask=mask, train=True, rng=key,
                compute_dtype=jnp.bfloat16)["loss"]

        def tree_checksum(t):
            # consume EVERY leaf — returning one grad leaf lets XLA
            # dead-code-eliminate the rest of the backward
            return sum(jnp.vdot(g, g) for g in jax.tree_util.tree_leaves(t))

        def fwd_bwd(p, x):
            return tree_checksum(jax.grad(fwd_only)(p, x))

        def full_step(s, x):
            grads = jax.grad(fwd_only)(s.params, x)
            updates, opt_state = tx.update(grads, s.opt_state, s.params)
            import optax
            p2 = optax.apply_updates(
                s.params,
                jax.tree_util.tree_map(lambda u: -2e-4 * u, updates))
            return tree_checksum(p2) + tree_checksum(opt_state)

        t_f = time_fn(lambda x: fwd_only(params, x), base, iters)
        t_g = time_fn(lambda x: fwd_bwd(params, x), base, iters)
        t_s = time_fn(lambda x: full_step(state, x), base, iters)
        print(f"  remat={remat}: fwd {t_f*1e3:7.1f} ms | fwd+bwd "
              f"{t_g*1e3:7.1f} ms (bwd/fwd {t_g/t_f - 1:4.1f}x) | "
              f"+adam {t_s*1e3:7.1f} ms | "
              f"{tiles_per_bag/t_s:,.0f} trained tiles/s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--res", type=int, default=300)
    ap.add_argument("--device-calibration", action="store_true")
    ap.add_argument("--train", action="store_true",
                    help="profile the training step instead of the forward")
    ap.add_argument("--tiles-per-bag", type=int, default=512)
    ap.add_argument("--json", action="store_true", help="machine-readable")
    args = ap.parse_args()

    if args.device_calibration:
        device_calibration()
        return
    if args.train:
        profile_train(args.tiles_per_bag, args.res, max(args.iters // 2, 2))
        return

    params = resnet.init_resnet26(jax.random.PRNGKey(0))
    flops = segment_flops(args.res)
    rng = np.random.default_rng(0)

    # correct per-segment input shapes at this res
    shapes = {"stem": (args.batch, args.res, args.res, 3)}
    h = (args.res + 1) // 2
    h = (h + 1) // 2
    widths = resnet.WIDTHS
    shapes["stage1"] = (args.batch, h, h, widths[0])
    shapes["stage2"] = (args.batch, h, h, widths[0])
    h = (h + 1) // 2
    shapes["stage3"] = (args.batch, h, h, widths[1])
    h = (h + 1) // 2
    shapes["stage4"] = (args.batch, h, h, widths[2])
    h = (h + 1) // 2
    shapes["pool_fc"] = (args.batch, h, h, widths[3])

    rows = []
    for name, fn in build_segments(params):
        base = jnp.asarray(rng.random(shapes[name], np.float32))
        sec = time_fn(fn, base, args.iters)
        gf = flops[name] * args.batch / 1e9
        rows.append((name, sec, gf, gf / sec / 1e3))

    full_base = jnp.asarray(
        rng.random((args.batch, args.res, args.res, 3), np.float32))
    full_sec = time_fn(
        lambda x: resnet.apply_resnet26(params, x,
                                        compute_dtype=jnp.bfloat16),
        full_base, args.iters)
    total_gf = sum(r[2] for r in rows)
    seg_sum = sum(r[1] for r in rows)

    if args.json:
        print(json.dumps({
            "batch": args.batch, "res": args.res,
            "segments": [{"name": n, "sec": s, "gflops": g, "tflops": t}
                         for n, s, g, t in rows],
            "full_sec": full_sec, "seg_sum_sec": seg_sum,
            "full_tflops": total_gf / full_sec / 1e3,
            "tiles_per_sec": args.batch / full_sec,
        }))
        return

    print(f"\nResNet-26 forward profile  batch={args.batch} res={args.res} "
          f"device={jax.devices()[0].platform}")
    print(f"{'segment':>9} {'ms':>9} {'GFLOP':>9} {'TFLOP/s':>9} {'share':>7}")
    for name, sec, gf, tf in rows:
        print(f"{name:>9} {sec * 1e3:9.2f} {gf:9.2f} {tf:9.2f} "
              f"{sec / seg_sum * 100:6.1f}%")
    print(f"{'SUM':>9} {seg_sum * 1e3:9.2f} {total_gf:9.2f} "
          f"{total_gf / seg_sum / 1e3:9.2f}")
    print(f"{'FULL':>9} {full_sec * 1e3:9.2f} {total_gf:9.2f} "
          f"{total_gf / full_sec / 1e3:9.2f}   "
          f"({args.batch / full_sec:,.0f} tiles/s; dispatch overhead "
          f"{(seg_sum - full_sec) * 1e3:+.2f} ms vs segment sum)")


if __name__ == "__main__":
    main()
