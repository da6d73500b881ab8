#!/bin/bash
# Round-3 session-4 queue — the multilight fast_march_start fix, sized to
# fit a short session window, with GRACEFUL self-limiting:
#   - a watchdog touches $TENSOIR_STOP_FILE at HARD_STOP; the train loop
#     exits at the next progress refresh and still runs final ckpt+eval
#     (loop.py stop-file support) — no SIGKILL ever touches the tunnel.
#   - gate() skips NEW steps near the deadline (/tmp/stop_queue honored).
# Launch:
#   QUEUE_SECONDS=2100 PYTHONPATH=/root/repo:$PYTHONPATH \
#     nohup bash scripts/tpu_queue_r6s4.sh > /tmp/tpu_queue_r6s4.log 2>&1 &
# Context (BASELINE.md "multilight collapse"): window march on soft
# density is the prime suspect; fast_march_start is the mitigation. The
# fix run is the 4000/1800 protocol scaled x0.75 (3000 iters, flip 1350)
# so the phase schedule (0.3/0.45 proportional) hits the flip at the
# same relative density state; lossy exposure 1650 iters > the ~1400
# that collapsed in the stage-G probes.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
export TENSOIR_STOP_FILE=/tmp/stop_train
rm -f /tmp/stop_train            # stale stop file would neuter the run
T0=$(date +%s)
HARD_STOP=$(( T0 + ${QUEUE_SECONDS:-2100} ))
SOFT_STOP=$(( HARD_STOP - 900 )) # no NEW step in the last 15 min

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
    echo "=== queue r6s4 done"
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
    nvs = {k: round(v["psnr_nvs"], 2) for k, v in m.items()
           if isinstance(v, dict)}
    print(json.dumps({"run": sys.argv[2], "brdf": row, "nvs": nvs,
                      "normal_mae_deg": round(mae, 2)}))
except Exception as e:
    print("harvest failed:", e)
PY
}

gate "multilight fix"
echo "=== [1/3] multilight fix demo (3000 it, fast_march_start 1350)"
python examples/train_multilight_demo.py --iters 3000 \
  --fast_march_start 1350 --sec_stats 1 \
  --out ./log/multilight_demo_r3_fix > /tmp/multilight_fix.log 2>&1
echo "exit: $?"; harvest_ml multilight_demo_r3_fix multilight_fix_3k

gate "bake probe"
echo "=== [2/3] ml_bisect 'bake' probe (completes the stage-G matrix)"
python examples/train_multilight_demo.py --iters 2000 \
  --out ./log/ml_bisect_bake --window 0 --window_back 0 --compact 0 \
  > /tmp/ml_bisect_bake.log 2>&1
echo "exit: $?"; harvest_ml ml_bisect_bake bake_probe

gate "general fix"
echo "=== [3/3] general multilight fix demo (3000 it, flip 1350)"
python examples/train_general_multilight_demo.py --iters 3000 \
  --fast_march_start 1350 \
  --out ./log/general_multilight_r3_fix > /tmp/general_fix.log 2>&1
echo "exit: $?"; harvest_ml general_multilight_r3_fix general_fix_3k

kill "$WATCHDOG" 2>/dev/null
echo "=== queue r6s4 done"
