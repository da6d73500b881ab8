#!/bin/bash
# Round-5 consolidated endgame queue (replaces the killed r12/r13/r14
# waiters with ONE priority order). WAITS for r11 to drain.
#   PYTHONPATH=/root/repo:$PYTHONPATH QUEUE_SECONDS=16200 \
#     nohup bash scripts/tpu_queue_r15.sh > /tmp/tpu_queue_r15.log 2>&1 &
# Priority order (VERDICT r4 weights, cheapest-decisive first):
#   [1] relight rerun on the 20k ckpt with the FIXED white-bg GT
#       (completes VERDICT #1; the first harvest was a GT-convention bug)
#   [2] 20k ckpt-series albedo localization (VERDICT #7, ~20 min)
#   [3] post-adoption phase re-profile (VERDICT #3, ablate_step)
#   [4] multilight auto-flip PLATEAU validation (VERDICT #4, 4k demo)
#   [5] general-multilight lr_light=3e-3 demo arm (VERDICT #6, 4k demo)
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
export TENSOIR_STOP_FILE=/tmp/stop_train_r15
rm -f /tmp/stop_train_r15
T0=$(date +%s)
HARD_STOP=$(( T0 + ${QUEUE_SECONDS:-16200} ))
SOFT_STOP=$(( HARD_STOP - 900 ))

( while [ "$(date +%s)" -lt "$HARD_STOP" ]; do
    [ -f /tmp/stop_queue ] && break
    sleep 20
  done
  touch /tmp/stop_train_r15 ) &
WATCHDOG=$!

gate () {
  if [ -f /tmp/stop_queue ] || [ -f /tmp/stop_train_r15 ] \
     || [ "$(date +%s)" -ge "$SOFT_STOP" ]; then
    echo "=== deadline/stop before: $1 — skipping rest"
    kill "$WATCHDOG" 2>/dev/null
    echo "=== queue r15 done"
    exit 0
  fi
}

echo "waiting for queue r11 to drain..."
while pgrep -f tpu_queue_r11_kickoff.sh > /dev/null 2>&1; do
  gate "r11 wait"
  sleep 60
done
echo "r11 drained at $(( $(date +%s) - T0 ))s"

gate "relight rerun"
echo "=== [1/5] relight rerun (white-bg GT fix) on the 20k ckpt"
python examples/relight_demo.py \
  --ckpt ./log/synthetic_demo_r5_20k/ckpt_final.npz \
  --out ./log/relight_r5_20k_fixed > /tmp/relight_r5_fixed.log 2>&1
echo "exit: $?"
grep -A8 '^{' /tmp/relight_r5_fixed.log | tail -10

gate "ckpt series"
echo "=== [2/5] 20k ckpt-series (albedo localization)"
CKPTS=$(ls ./log/synthetic_demo_r5_20k/ckpt_{4000,8000,12000,16000}.npz \
  ./log/synthetic_demo_r5_20k/ckpt_final.npz 2>/dev/null)
echo "ckpts: $CKPTS"
python scripts/eval_ckpt_series.py $CKPTS > /tmp/ckpt_series_r5.log 2>&1
echo "exit: $?"
grep -E '^\{' /tmp/ckpt_series_r5.log | tee ./log/ckpt_series_r5_20k.jsonl

gate "phase re-profile"
echo "=== [3/5] post-adoption phase re-profile (ablate_step)"
python scripts/ablate_step.py > /tmp/ablate_r5.log 2>&1
echo "exit: $?"; tail -20 /tmp/ablate_r5.log

gate "multilight auto-flip (plateau)"
echo "=== [4/5] multilight auto-flip validation (plateau criterion)"
python examples/train_multilight_demo.py --iters 4000 \
  --fast_march_start -1 --sec_stats 1 \
  --out ./log/ml_autoflip_r5 > /tmp/ml_autoflip_r5.log 2>&1
echo "exit: $?"
grep -E "AUTO flip|final" /tmp/ml_autoflip_r5.log | head -5
tail -8 /tmp/ml_autoflip_r5.log

gate "general lr3 demo"
echo "=== [5/5] general-multilight demo, lr_light 3e-3"
python examples/train_general_multilight_demo.py --iters 4000 \
  --lr_light 3e-3 \
  --out ./log/general_lr3_r5 > /tmp/general_lr3_r5.log 2>&1
echo "exit: $?"
tail -6 /tmp/general_lr3_r5.log

kill "$WATCHDOG" 2>/dev/null
echo "=== queue r15 done"
