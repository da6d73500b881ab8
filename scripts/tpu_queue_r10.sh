#!/bin/bash
# Round-4 curriculum-fix queue. Waits for the orphaned capgate python
# (r9 stage G) to finish, then runs the relight-cap-curriculum multilight
# demos — the candidate collapse fix selected by the CPU evidence
# (BASELINE.md r4: warmup plateaus at MAE ~15; curriculum monotone
# 34.7 -> 13.4 (grow@0.6) -> 10.3 (grow@0.8) at TOY scale, where density
# never hardens; demo scale starts the full pressure on a much harder
# density).
# Launch:
#   WAIT_PID=<capgate pid> QUEUE_SECONDS=21000 PYTHONPATH=/root/repo:$PYTHONPATH \
#     nohup bash scripts/tpu_queue_r10.sh > /tmp/tpu_queue_r10.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
export TENSOIR_STOP_FILE=/tmp/stop_train
rm -f /tmp/stop_train
T0=$(date +%s)
HARD_STOP=$(( T0 + ${QUEUE_SECONDS:-21000} ))
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
    echo "=== queue r10 done"
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

if [ -n "${WAIT_PID:-}" ]; then
  echo "=== waiting for pid $WAIT_PID (capgate) to exit"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
echo "=== capgate harvest:"
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

gate "B1: curriculum multilight"
echo "=== [B1] multilight curriculum fix (cap_start 512, flip 2400)"
python examples/train_multilight_demo.py --iters 4000 \
  --cap_start 512 --fast_march_start 2400 --sec_stats 1 \
  --out ./log/multilight_curr_r4 > /tmp/ml_curr.log 2>&1
echo "exit: $?"; harvest_ml multilight_curr_r4 curriculum_fix

gate "D: general curriculum"
echo "=== [D] general multilight with the curriculum fix"
python examples/train_general_multilight_demo.py --iters 4000 \
  --cap_start 512 --fast_march_start 2400 \
  --out ./log/general_curr_r4 > /tmp/general_curr.log 2>&1
echo "exit: $?"; harvest_ml general_curr_r4 general_curriculum_fix

gate "C: late-flip variant"
echo "=== [C] curriculum with a later flip (2800) — MAE/BRDF trade probe"
python examples/train_multilight_demo.py --iters 4000 \
  --cap_start 512 --fast_march_start 2800 --sec_stats 1 \
  --out ./log/multilight_curr2800_r4 > /tmp/ml_curr2800.log 2>&1
echo "exit: $?"; harvest_ml multilight_curr2800_r4 curriculum_2800

kill "$WATCHDOG" 2>/dev/null
echo "=== queue r10 done"
