#!/bin/bash
# Round-4 follow-up queue — runs AFTER scripts/tpu_queue_r6_kickoff.sh.
# VERDICT r3 items #2 (auto-flip validation) and #5 (protocol cost of the
# fast training forward). Graceful self-limiting (same discipline as
# r6s4): watchdog touches $TENSOIR_STOP_FILE at HARD_STOP, gate() skips
# NEW steps near the deadline, /tmp/stop_queue honored between steps.
# Launch:
#   QUEUE_SECONDS=14400 PYTHONPATH=/root/repo:$PYTHONPATH \
#     nohup bash scripts/tpu_queue_r7.sh > /tmp/tpu_queue_r7.log 2>&1 &
# Context:
#   - [1] fast_march_start -1 (auto): flip must fire when the measured
#     sec/window_resid_rel < 0.02, land near the hand-tuned 1800, and the
#     run must finish healthy (normal MAE single digits). On success the
#     multilight demo defaults flip to -1 (VERDICT #2).
#   - [2]+[3] protocol A/B: matched 5k pair differing ONLY in the lossy
#     march knobs (window/compact/app-bake), shared relight_cap 1024,
#     BOTH evaluated under the exact protocol eval (demo default).
#     Quantifies the converged protocol-metric tax of training under the
#     fast forward (VERDICT #5; eval_fast stays off for reported metrics).
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
    echo "=== queue r7 done"
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
    nvs = {k: round(v["psnr_nvs"], 2) for k, v in m.items()
           if isinstance(v, dict)}
    mae = next(v["normal_mae_deg"] for v in m.values() if isinstance(v, dict))
    print(json.dumps({"run": sys.argv[2], "brdf": row, "nvs": nvs,
                      "normal_mae_deg": round(mae, 2)}))
except Exception as e:
    print("harvest failed:", e)
PY
}

gate "cap-only probe"
echo "=== [0/3] ml_bisect CAP probe (cap 4096, NO fast knobs — decisive"
echo "    after the r4 'bake' collapse; BASELINE.md matrix reading)"
python examples/train_multilight_demo.py --iters 2000 \
  --out ./log/ml_bisect_cap --window 0 --window_back 0 --compact 0 \
  --app_bake 0 > /tmp/ml_bisect_cap.log 2>&1
echo "exit: $?"; harvest_ml ml_bisect_cap cap_probe

gate "auto-flip validation"
echo "=== [1/3] multilight auto-flip demo (fast_march_start -1)"
python examples/train_multilight_demo.py --iters 4000 \
  --fast_march_start -1 --sec_stats 1 \
  --out ./log/multilight_autoflip_r4 > /tmp/ml_autoflip.log 2>&1
echo "exit: $?"; harvest_ml multilight_autoflip_r4 autoflip
grep -h "AUTO flip" /tmp/ml_autoflip.log || echo "NO AUTO FLIP FIRED"

gate "protocol A/B fast arm"
echo "=== [2/3] protocol A/B: FAST-trained arm (canonical knobs, cap 1024)"
python examples/train_synthetic_demo.py --iters 5000 \
  --bake_reso 128 --relight_cap 1024 --window 48 --window_back 16 \
  --compact 0.5625 --prepass 8 --dilate 3 --app_bake 64 --sec_stats 1 \
  --out ./log/proto_ab_fast > /tmp/proto_ab_fast.log 2>&1
echo "exit: $?"; tail -6 /tmp/proto_ab_fast.log

gate "protocol A/B exact arm"
echo "=== [3/3] protocol A/B: EXACT-trained arm (no lossy knobs, cap 1024)"
python examples/train_synthetic_demo.py --iters 5000 \
  --relight_cap 1024 --window 0 --window_back 0 --compact 0 \
  --app_bake 0 --sec_stats 1 \
  --out ./log/proto_ab_exact > /tmp/proto_ab_exact.log 2>&1
echo "exit: $?"; tail -6 /tmp/proto_ab_exact.log

kill "$WATCHDOG" 2>/dev/null
echo "=== queue r7 done"
