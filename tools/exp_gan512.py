"""Res-512 WGAN-GP feasibility probe: find the HBM boundary honestly.

Bench config 7's in-process OOM-halving loop cannot work on this
backend: after one RESOURCE_EXHAUSTED the TPU client poisons every
subsequent call in the same process (observed: batch 16 compiled 2.5 min
then OOM'd; batches 8/4/2/1 all "failed" within the same second without
compiling). So each attempt here runs in its OWN interpreter, and one
OOM cannot masquerade as five.

The reference's 512 variant trains to 512 px on 4 GPUs with batch 16 per
resolution step (style-based-gan-pytorch-master-512/train.py:61: batch
schedule {..., 512: 16}th per-GPU share 4). This tool measures, per
(dtype, batch) descending: does the full-width d_step+g_step (WGAN-GP
double-backward, fade-in blend path alive, same semantics as bench.py
config 7) fit one v5e's 16 GB — and at what imgs/sec when it does.

Usage:
  python tools/exp_gan512.py                  # driver: probe ladder
  python tools/exp_gan512.py --probe --batch 8 --dtype f32   # one child
Rows land in GAN512_r04.jsonl / PROFILE.md / SCALING.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

RES, STEP = 512, 7


def probe(batch: int, dtype_name: str, iters: int = 3) -> dict:
    import jax
    import jax.numpy as jnp

    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.models import (  # noqa: E501
        stylegan as sg,
    )
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (  # noqa: E501
        gan,
    )

    dtype = {"f32": None, "bf16": jnp.bfloat16}[dtype_name]
    width = 1.0
    k_g, k_d = jax.random.split(jax.random.PRNGKey(0))
    params_g = sg.init_styled_generator(k_g, width_mult=width)
    params_d = sg.init_discriminator(k_d, width_mult=width)
    g_running = jax.tree_util.tree_map(lambda x: x, params_g)
    tx = gan.make_optimizers()
    opt_g = tx.init(params_g)
    opt_d = tx.init(params_d)
    d_step = gan.make_d_step(STEP, width_mult=width, from_rgb_activate=True,
                             tx=tx, compute_dtype=dtype)
    g_step = gan.make_g_step(STEP, width_mult=width, from_rgb_activate=True,
                             tx=tx, compute_dtype=dtype)
    n_blocks = len(sg._gen_layout(width))
    sel = jnp.zeros((n_blocks,), jnp.int32)
    alpha = jnp.float32(0.5)
    lr = jnp.float32(0.001)

    gen_inputs = jax.jit(lambda k: (
        jax.random.normal(k, (batch, RES, RES, 3)),
        jax.random.normal(jax.random.fold_in(k, 1), (1, batch, 512))))

    def run_iter(pd, od, pg, og, ema, rep):
        key = jax.random.fold_in(jax.random.PRNGKey(7), rep)
        real, zs = gen_inputs(key)
        float(jnp.sum(real))
        t0 = time.perf_counter()
        pd, od, aux = d_step(pd, od, pg, real, zs, sel, alpha, lr,
                             jax.random.fold_in(key, 2))
        pg, og, ema, gl = g_step(pg, og, ema, pd, zs, sel, alpha, lr,
                                 jax.random.fold_in(key, 3))
        float(aux["disc_loss"])
        float(gl)
        return pd, od, pg, og, ema, time.perf_counter() - t0

    state = (params_d, opt_d, params_g, opt_g, g_running)
    t_c = time.perf_counter()
    *state, _ = run_iter(*state, 10_000)
    compile_secs = time.perf_counter() - t_c
    times = []
    for rep in range(iters):
        *state, dt = run_iter(*state, rep)
        times.append(dt)
    med = float(np.median(times))
    return {"res": RES, "batch": batch, "dtype": dtype_name, "fit": True,
            "imgs_per_sec": round(batch / med, 3),
            "step_secs": round(med, 4),
            "compile_secs": round(compile_secs, 1),
            "platform": jax.devices()[0].platform}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--probe", action="store_true",
                    help="child mode: one (batch, dtype) attempt")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--batches", default="16,8,4,2,1",
                    help="driver mode: descending ladder per dtype")
    ap.add_argument("--dtypes", default="f32,bf16")
    args = ap.parse_args(argv)

    if args.probe:
        try:
            print(json.dumps(probe(args.batch, args.dtype)), flush=True)
            return 0
        except Exception as e:  # noqa: BLE001 — classify OOM vs real bug
            msg = str(e)
            oom = ("RESOURCE_EXHAUSTED" in msg
                   or "out of memory" in msg.lower())
            print(json.dumps({"res": RES, "batch": args.batch,
                              "dtype": args.dtype, "fit": False,
                              "oom": oom,
                              "error": msg.splitlines()[0][:200]}),
                  flush=True)
            return 0 if oom else 1

    rows = []
    for dtype in args.dtypes.split(","):
        for batch in (int(b) for b in args.batches.split(",")):
            print(f"# probing res {RES} {dtype} batch {batch}",
                  file=sys.stderr, flush=True)
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--probe",
                 "--batch", str(batch), "--dtype", dtype],
                capture_output=True, text=True,
                env=dict(os.environ,
                         PYTHONPATH=_ROOT + os.pathsep
                         + os.environ.get("PYTHONPATH", "")))
            line = next((ln for ln in proc.stdout.splitlines()
                         if ln.startswith("{")), None)
            if line is None:
                rows.append({"res": RES, "batch": batch, "dtype": dtype,
                             "fit": False, "oom": False,
                             "error": f"child rc={proc.returncode}: "
                             + proc.stderr.strip()[-200:]})
                print(json.dumps(rows[-1]), flush=True)
                continue
            row = json.loads(line)
            rows.append(row)
            print(line, flush=True)
            if row.get("fit"):
                break  # boundary found for this dtype
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
