#!/usr/bin/env bash
# One-shot TPU work queue for the round-3 chip-idle backlog: run it the
# moment `tools/chip_health.py` reports healthy. Ordering puts the
# highest-value measurement first so a mid-sweep outage still yields the
# int8 verdict.
#
#   1. tools/exp_int8.py      — W8A8 vs bf16 extractor, interleaved A/B
#   2. bench.py --int8        — reproducible int8 headline artifact
#   3. per-config quick-mode wall times (VERDICT r2 weak #1 evidence)
#   4. tools/profile_gan.py --dtype bf16 — opt-in GAN mixed precision
#
# Usage: bash tools/tpu_r3_sweep.sh [outdir]   (default /tmp/tpu_r3)
set -u
OUT=${1:-/tmp/tpu_r3}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

echo "== gate: chip health"
timeout 400 python tools/chip_health.py 2>/dev/null | tee "$OUT/health.json" \
  | grep -q '"healthy": true' || { echo "chip unhealthy — abort"; exit 1; }

echo "== 1/5 int8 vs bf16 extractor A/B (interleaved)"
# headline batch first with the conv lowering only (the dot lowering's
# im2col patch buffer is kh*kw x the activation bytes — OOM risk at
# 3x4096); then all three lowerings at a memory-safe 1024
timeout 1800 python tools/exp_int8.py --k 3 --batch 4096 --rounds 4 \
  --impl conv 2>&1 | tee "$OUT/exp_int8_b4096.log"
timeout 1800 python tools/exp_int8.py --k 3 --batch 1024 --rounds 4 \
  --impl all 2>&1 | tee "$OUT/exp_int8_b1024.log"

echo "== 2/5 bench --int8 full-mode artifact"
timeout 1800 python bench.py --int8 --no-baseline \
  > "$OUT/bench_int8.json" 2> "$OUT/bench_int8.log"
cat "$OUT/bench_int8.json"

echo "== 3/5 quick-mode wall time per config"
: > "$OUT/quick.jsonl"
for c in 1 2 3 4 5 6 7; do
  t0=$(date +%s)
  timeout 900 python bench.py --config "$c" --quick --no-baseline \
    >> "$OUT/quick.jsonl" 2>> "$OUT/quick.log"
  rc=$?
  t1=$(date +%s)
  echo "config $c quick: rc=$rc wall=$((t1 - t0))s" \
    | tee -a "$OUT/quick_times.txt"
done

echo "== 4/5 GAN d+g step, bf16 opt-in vs shipped f32"
timeout 1800 python tools/profile_gan.py --res 64 --batch 64 \
  --dtype bf16 --rounds 3 2>&1 | tee "$OUT/gan_bf16.log"

echo "== 5/5 serving-daemon steady state (warm slides/min, 3 variants)"
# 24 biopsy slides x 32 tiles @300px (divisible by --batch 8 so every
# batched group reuses one program); warm median excludes the compile
# slide/group. Tunnel H2D (~13MB/s vs ~8.6MB/slide) floors the serial
# variants; the JSON still pins warm steady state + int8/batch deltas.
timeout 1800 python tools/exp_serve.py --slides 24 --tiles 32 --batch 8 \
  2>&1 | tee "$OUT/exp_serve.log"

echo "sweep complete -> $OUT"
