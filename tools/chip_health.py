"""Is the bench chip healthy enough to trust a measurement?

Three staged probes, each with its own watchdog budget so a degraded
device reports *degraded* instead of hanging the caller:

  1. device listing        (runtime reachable)
  2. small-matmul dispatch (per-dispatch overhead; tunnel-normal 5-30 ms)
  3. chained 4096^3 bf16 matmuls (marginal TFLOP/s; v5e healthy ~190,
     throttle episodes observed anywhere from 54 down to 0.2 — see
     PROFILE.md "Cross-round comparability")

Prints one JSON line; exit 0 = healthy (marginal >= --min-tflops),
exit 1 = degraded/unreachable. Use before trusting bench.py numbers:

    python tools/chip_health.py && python bench.py --all --no-baseline
"""

import argparse
import json
import multiprocessing as mp
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _probe(q):
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    devs = jax.devices()
    q.put(("devices", str(devs[0]), time.perf_counter() - t0))

    if devs[0].platform == "cpu":
        # CPU-only host (bench's documented toy-shape fallback): there is
        # no tunnel/accelerator to wedge, and the chained-4096^3 compute
        # probe would take minutes of host CPU — report trivially healthy
        q.put(("cpu_host", True, None))
        return

    a = jax.random.normal(jax.random.PRNGKey(0), (256, 256), jnp.bfloat16)
    f = jax.jit(lambda a: a @ a)
    jax.block_until_ready(f(a))
    x = a * 1.001
    float(jnp.sum(x.astype(jnp.float32)))
    t0 = time.perf_counter()
    float(jnp.sum(f(x).astype(jnp.float32)))
    q.put(("dispatch_ms", (time.perf_counter() - t0) * 1e3, None))

    b = jax.random.normal(jax.random.PRNGKey(1), (4096, 4096), jnp.bfloat16)

    def chain(n):
        def g(b):
            x = b
            for _ in range(n):
                x = x @ b
            return x
        return jax.jit(g)

    c16, c32 = chain(16), chain(32)
    jax.block_until_ready(c16(b))
    jax.block_until_ready(c32(b))
    ts = {}
    for name, fn in (("c16", c16), ("c32", c32)):
        x = b * 1.001
        float(jnp.sum(x.astype(jnp.float32)))
        t0 = time.perf_counter()
        float(jnp.sum(fn(x).astype(jnp.float32)))
        ts[name] = time.perf_counter() - t0
    marginal = 16 * 2 * 4096 ** 3 / max(ts["c32"] - ts["c16"], 1e-9) / 1e12
    q.put(("marginal_tflops", marginal, ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget", type=float, default=120.0,
                    help="seconds before the probe is declared hung")
    ap.add_argument("--min-tflops", type=float, default=20.0,
                    help="marginal matmul TFLOP/s below which the chip "
                         "is reported degraded (v5e healthy: ~190)")
    args = ap.parse_args()

    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    proc = ctx.Process(target=_probe, args=(q,), daemon=True)
    t0 = time.time()
    proc.start()
    out = {"healthy": False, "stage": "unreachable"}
    deadline = t0 + args.budget
    stages = 0
    while time.time() < deadline and stages < 3:
        try:
            # short poll so a child that died early (jax import failure,
            # segfault) is noticed immediately instead of sleeping the
            # whole budget waiting on a queue nothing will ever feed
            name, val, extra = q.get(timeout=min(
                2.0, max(0.1, deadline - time.time())))
        except Exception:
            if not proc.is_alive() and q.empty():
                out.setdefault("probe_exitcode", proc.exitcode)
                break
            continue
        stages += 1
        if name == "devices":
            out.update(stage="listed", device=val,
                       list_secs=round(extra, 2))
        elif name == "cpu_host":
            out.update(stage="cpu_host", healthy=True)
            break
        elif name == "dispatch_ms":
            out.update(stage="dispatch", dispatch_ms=round(val, 1))
        elif name == "marginal_tflops":
            out.update(stage="compute", marginal_tflops=round(val, 1),
                       chain_secs={k: round(v, 3) for k, v in extra.items()})
            out["healthy"] = val >= args.min_tflops
    if proc.is_alive():
        # a probe stuck in an uninterruptible tunnel syscall survives
        # SIGTERM; SIGKILL it and skip interpreter teardown entirely so
        # multiprocessing's atexit join cannot hang the report
        proc.kill()
    out["probe_secs"] = round(time.time() - t0, 1)
    print(json.dumps(out), flush=True)
    sys.stdout.flush()
    q.close()
    q.cancel_join_thread()
    import os
    os._exit(0 if out["healthy"] else 1)


if __name__ == "__main__":
    main()
