#!/bin/bash
# Round-5 GAN convergence evidence (VERDICT r4 items 4 + 6):
# three runs on the identical two-transition 8->16->32 schedule,
# assembled into GAN_CONVERGENCE_r05.json keyed by config.
#   decay_0999   : reference-parity EMA decay (shows the init-mass lag)
#   decay_099    : decay A/B — init mass washes out, g_running recovers
#   ema_warmup_60: tf-EMA num_updates warmup at parity decay, 60 epochs
#                  (40 settled at res 32) — the crossing the EMA exists for
set -u
cd "$(dirname "$0")/.."
OUT=GAN_CONVERGENCE_r05.json
TMP=$(mktemp -d /tmp/ganconv_r05_XXXX)

run() { # name, extra args...
  local name=$1; shift
  echo "=== $name: $* ==="
  timeout 9000 python tools/gan_convergence_run.py --max_res 32 "$@" \
    > "$TMP/$name.out" 2> "$TMP/$name.err"
  echo "rc=$? ($name)"
  tail -1 "$TMP/$name.out" > "$TMP/$name.json"
}

run decay_0999 --ema_decay 0.999
run decay_099  --ema_decay 0.99
# --step_every 10: same per-resolution schedule as the 30-epoch runs,
# leaving 40 SETTLED epochs at res 32 for the EMA horizon to catch up
run ema_warmup_60 --ema_warmup --epochs 60 --step_every 10

python - "$TMP" <<'EOF'
import json, sys, os
tmp = sys.argv[1]
rec = {}
for name in ("decay_0999", "decay_099", "ema_warmup_60"):
    p = os.path.join(tmp, name + ".json")
    try:
        with open(p) as f:
            rec[name] = json.loads(f.read())
    except Exception as e:
        rec[name] = {"error": str(e)}
with open("GAN_CONVERGENCE_r05.json", "w") as f:
    json.dump(rec, f, indent=1)
print(json.dumps(rec, indent=1))
EOF
