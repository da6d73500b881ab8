#!/bin/bash
# Round-4 multilight-collapse probe matrix, REVISED after stages [0/5] and
# [1/5] of the kickoff queue both collapsed (BASELINE.md r4 matrix
# reading): the knob flip (fast_march_start 1800) does NOT fix multilight
# — the collapse is driven by relight-branch pressure on a soft density
# (every masked ray relit at cap 4096 = the reference's own full-batch-mean
# weighting) and/or schedule compression, not by the lossy march knobs.
#   A: cap-only probe (cap 4096, NO knobs) — is reference pressure alone
#      sufficient to collapse? (disambiguates r3's cap confound)
#   B: warmup fix (canonical knobs from start + rgb_brdf_warmup 1200,
#      cap 4096) — candidate production fix.
#   C/D (auto-branched on B): healthy -> D = general demo with the warmup
#      fix; collapse -> C = warmup 1600 + relight_cap 1024 fallback.
# Launch:
#   QUEUE_SECONDS=14400 PYTHONPATH=/root/repo:$PYTHONPATH \
#     nohup bash scripts/tpu_queue_r8_multilight.sh > /tmp/tpu_queue_r8.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
export TENSOIR_STOP_FILE=/tmp/stop_train
rm -f /tmp/stop_train
T0=$(date +%s)
HARD_STOP=$(( T0 + ${QUEUE_SECONDS:-14400} ))
SOFT_STOP=$(( HARD_STOP - 900 ))

( while [ "$(date +%s)" -lt "$HARD_STOP" ]; do
    [ -f /tmp/stop_queue ] && break
    sleep 20
  done
  touch /tmp/stop_train ) &
WATCHDOG=$!

gate () {
  if [ -f /tmp/stop_queue ] || [ -f /tmp/stop_train ] \
     || [ "$(date +%s)" -ge "$SOFT_STOP" ]; then
    echo "=== deadline/stop before: $1 — skipping rest"
    kill "$WATCHDOG" 2>/dev/null
    echo "=== queue r8 done"
    exit 0
  fi
}

harvest_ml () {  # run-dir label
  python - "$1" "$2" <<'PY'
import json, sys
try:
    m = json.load(open(f"./log/{sys.argv[1]}/final_metrics.json"))
    row = {k: round(v["psnr_nvs_brdf"], 2) for k, v in m.items()
           if isinstance(v, dict)}
    mae = next(v["normal_mae_deg"] for v in m.values() if isinstance(v, dict))
    print(json.dumps({"run": sys.argv[2], "brdf": row,
                      "normal_mae_deg": round(mae, 2)}))
except Exception as e:
    print("harvest failed:", e)
PY
}

mae_of () {  # run-dir -> prints normal MAE or 999
  python - "$1" <<'PY'
import json, sys
try:
    m = json.load(open(f"./log/{sys.argv[1]}/final_metrics.json"))
    print(next(v["normal_mae_deg"] for v in m.values()
               if isinstance(v, dict)))
except Exception:
    print(999)
PY
}

gate "A: cap-only probe"
echo "=== [A] ml_bisect CAP probe (cap 4096, NO fast knobs, 2000 it)"
python examples/train_multilight_demo.py --iters 2000 \
  --out ./log/ml_bisect_cap --window 0 --window_back 0 --compact 0 \
  --app_bake 0 > /tmp/ml_bisect_cap.log 2>&1
echo "exit: $?"; harvest_ml ml_bisect_cap cap_probe

gate "B: warmup fix"
echo "=== [B] multilight warmup fix (canonical knobs, brdf_warmup 1200)"
python examples/train_multilight_demo.py --iters 4000 \
  --brdf_warmup 1200 --sec_stats 1 \
  --out ./log/multilight_warmup_r4 > /tmp/ml_warmup.log 2>&1
echo "exit: $?"; harvest_ml multilight_warmup_r4 warmup_fix

B_MAE=$(mae_of multilight_warmup_r4)
echo "B normal MAE: $B_MAE"
if python -c "import sys; sys.exit(0 if float('$B_MAE') < 10 else 1)"; then
  gate "D: general demo with warmup fix"
  echo "=== [D] general multilight with the warmup fix"
  python examples/train_general_multilight_demo.py --iters 4000 \
    --brdf_warmup 1200 \
    --out ./log/general_warmup_r4 > /tmp/general_warmup.log 2>&1
  echo "exit: $?"; harvest_ml general_warmup_r4 general_warmup_fix
else
  gate "C: warmup+cap fallback"
  echo "=== [C] fallback: warmup 1600 + relight_cap 1024"
  python examples/train_multilight_demo.py --iters 4000 \
    --brdf_warmup 1600 --relight_cap 1024 --sec_stats 1 \
    --out ./log/multilight_warmup_cap_r4 > /tmp/ml_warmup_cap.log 2>&1
  echo "exit: $?"; harvest_ml multilight_warmup_cap_r4 warmup_cap_fallback
fi

kill "$WATCHDOG" 2>/dev/null
echo "=== queue r8 done"
