#!/bin/bash
# Round-4 consolidated priority queue (after the kickoff's [3/5] capgate
# crashed on the march contract: prepass 8 is bench-scene-legal but
# demo-scene-ILLEGAL post-shrink — min aabb extent 1.381 gives margin
# 0.0863 < half spacing 0.1036. The canonical demo knob is prepass 12;
# the contract guard failed loudly exactly as designed.)
# Order: decisive 45-min cap probe first, then the corrected cap gate
# (bench adoption must land before the driver's end-of-round bench),
# then the warmup fix arms.
# Launch:
#   QUEUE_SECONDS=25200 PYTHONPATH=/root/repo:$PYTHONPATH \
#     nohup bash scripts/tpu_queue_r9.sh > /tmp/tpu_queue_r9.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
export TENSOIR_STOP_FILE=/tmp/stop_train
rm -f /tmp/stop_train
T0=$(date +%s)
HARD_STOP=$(( T0 + ${QUEUE_SECONDS:-25200} ))
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
    echo "=== queue r9 done"
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

mae_of () {
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

gate "G: corrected cap gate"
echo "=== [G] 5k cap gate, CONTRACT-LEGAL demo knobs (p12 d3) + acap12/pf0.4375"
python examples/train_synthetic_demo.py --iters 5000 \
  --bake_reso 128 --relight_cap 4096 --window 48 --window_back 16 \
  --compact 0.5625 --prepass 12 --dilate 3 --app_bake 64 \
  --app_cap_secondary 12 --pair_frac 0.4375 --sec_stats 1 \
  --out ./log/synthetic_demo_r4_capgate > /tmp/demo_capgate.log 2>&1
echo "exit: $?"; tail -6 /tmp/demo_capgate.log
python - <<'PY'
import json
try:
    m = json.load(open("./log/synthetic_demo_r4_capgate/final_metrics.json"))
    print(json.dumps({"run": "capgate_acap12_pf44",
                      **{k: round(v, 3) for k, v in m.items()
                         if isinstance(v, (int, float))}}))
except Exception as e:
    print("capgate harvest failed:", e)
PY

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
echo "=== queue r9 done"
