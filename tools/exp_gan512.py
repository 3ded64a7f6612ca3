"""High-res WGAN-GP feasibility probe: find the HBM boundary honestly.

Bench config 7's in-process OOM-halving loop cannot work on this
backend: after one RESOURCE_EXHAUSTED the TPU client poisons every
subsequent call in the same process (observed: batch 16 compiled 2.5 min
then OOM'd; batches 8/4/2/1 all "failed" within the same second without
compiling). So each attempt here runs in its OWN interpreter, and one
OOM cannot masquerade as five.

The reference's 512 variant trains to 512 px on 4 GPUs with batch 16 per
resolution step (style-based-gan-pytorch-master-512/train.py:61, 4-way
DataParallel = per-GPU share 4), and its vendored generator reaches
1024 px (model.py:377-451) though no reference script ever trains there.
This tool measures, per (res, dtype, remat, batch) descending: does the
full-width d_step+g_step (WGAN-GP double-backward, fade-in blend path
alive, same semantics as bench.py config 7) fit one v5e's 16 GB — and at
what imgs/sec when it does. ``--remat`` probes the jax.checkpoint
variant (train/gan.py make_d_step(remat=True)).

Usage:
  python tools/exp_gan512.py                         # probe 512 ladder
  python tools/exp_gan512.py --res 1024 --remat      # 1024 w/ remat
  python tools/exp_gan512.py --probe --res 512 --batch 8 --dtype f32
Rows land in GAN512_r04.jsonl / GAN1024_r04.jsonl / PROFILE.md /
SCALING.md.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def probe(res: int, batch: int, dtype_name: str, remat: bool,
          grad_accum: int = 1, iters: int = 3) -> dict:
    # Deliberately mirrors bench.py config 7's measurement discipline
    # (fresh fold_in inputs per timed call vs axon result caching; host
    # fetch to close async dispatch; median of iters). It cannot SHARE
    # that code: bench runs in-process where one OOM poisons the client,
    # and this probe exists precisely to run each attempt in its own
    # interpreter. If the timing workarounds change in bench.py, change
    # them here too.
    import jax
    import jax.numpy as jnp

    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.models import (  # noqa: E501
        stylegan as sg,
    )
    from deep_convolutional_neural_network_resnet_26_and_attention_network_tpu.train import (  # noqa: E501
        gan,
    )

    step = int(math.log2(res)) - 2  # 4px = step 0 (stylegan.py layout)
    dtype = {"f32": None, "bf16": jnp.bfloat16}[dtype_name]
    width = 1.0
    k_g, k_d = jax.random.split(jax.random.PRNGKey(0))
    params_g = sg.init_styled_generator(k_g, width_mult=width)
    params_d = sg.init_discriminator(k_d, width_mult=width)
    g_running = jax.tree_util.tree_map(lambda x: x, params_g)
    tx = gan.make_optimizers()
    opt_g = tx.init(params_g)
    opt_d = tx.init(params_d)
    d_step = gan.make_d_step(step, width_mult=width, from_rgb_activate=True,
                             tx=tx, compute_dtype=dtype, remat=remat,
                             grad_accum=grad_accum)
    g_step = gan.make_g_step(step, width_mult=width, from_rgb_activate=True,
                             tx=tx, compute_dtype=dtype, remat=remat,
                             grad_accum=grad_accum)
    n_blocks = len(sg._gen_layout(width))
    sel = jnp.zeros((n_blocks,), jnp.int32)
    alpha = jnp.float32(0.5)
    lr = jnp.float32(0.001)

    gen_inputs = jax.jit(lambda k: (
        jax.random.normal(k, (batch, res, res, 3)),
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
    return {"res": res, "batch": batch, "dtype": dtype_name,
            "remat": remat, "grad_accum": grad_accum, "fit": True,
            "imgs_per_sec": round(batch / med, 3),
            "step_secs": round(med, 4),
            "compile_secs": round(compile_secs, 1),
            "platform": jax.devices()[0].platform}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--probe", action="store_true",
                    help="child mode: one (res, batch, dtype) attempt")
    ap.add_argument("--res", type=int, default=512,
                    help="target resolution (power of two, 8..1024)")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--remat", action="store_true",
                    help="probe the jax.checkpoint (rematerialized) step")
    ap.add_argument("--grad_accum", type=int, default=1,
                    help="probe the lax.scan gradient-accumulation step "
                         "(batch must divide)")
    ap.add_argument("--batches", default="16,8,4,2,1",
                    help="driver mode: descending ladder per dtype")
    ap.add_argument("--dtypes", default="f32,bf16")
    args = ap.parse_args(argv)

    if args.probe:
        try:
            print(json.dumps(probe(args.res, args.batch, args.dtype,
                                   args.remat, args.grad_accum)),
                  flush=True)
            return 0
        except Exception as e:  # noqa: BLE001 — classify OOM vs real bug
            msg = str(e)
            oom = ("RESOURCE_EXHAUSTED" in msg
                   or "out of memory" in msg.lower())
            if oom:
                # surface the OOM line, not the remote-compile wrapper
                msg = next((ln for ln in msg.splitlines()
                            if "RESOURCE_EXHAUSTED" in ln
                            or "out of memory" in ln.lower()), msg)
            print(json.dumps({"res": args.res, "batch": args.batch,
                              "dtype": args.dtype, "remat": args.remat,
                              "grad_accum": args.grad_accum,
                              "fit": False, "oom": oom,
                              "error": msg.splitlines()[0][:200]}),
                  flush=True)
            return 0 if oom else 1

    rows = []
    for dtype in args.dtypes.split(","):
        for batch in (int(b) for b in args.batches.split(",")):
            if batch % args.grad_accum:
                # the default descending ladder reaches batches that
                # cannot divide (e.g. 1 with --grad_accum 2) — skip
                # rather than record a noise row
                print(f"# skip batch {batch}: not divisible by "
                      f"--grad_accum {args.grad_accum}",
                      file=sys.stderr, flush=True)
                continue
            print(f"# probing res {args.res} {dtype} batch {batch} "
                  f"remat={args.remat} accum={args.grad_accum}",
                  file=sys.stderr, flush=True)
            child = [sys.executable, os.path.abspath(__file__), "--probe",
                     "--res", str(args.res), "--batch", str(batch),
                     "--dtype", dtype,
                     "--grad_accum", str(args.grad_accum)]
            if args.remat:
                child.append("--remat")
            proc = subprocess.run(
                child, capture_output=True, text=True,
                env=dict(os.environ,
                         PYTHONPATH=_ROOT + os.pathsep
                         + os.environ.get("PYTHONPATH", "")))
            line = next((ln for ln in proc.stdout.splitlines()
                         if ln.startswith("{")), None)
            if line is None:
                rows.append({"res": args.res, "batch": batch,
                             "dtype": dtype, "remat": args.remat,
                             "grad_accum": args.grad_accum,
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
