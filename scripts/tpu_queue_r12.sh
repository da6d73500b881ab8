#!/bin/bash
# Round-5 follow-up queue — launch any time; it WAITS for the r11 kickoff
# queue to finish before touching the tunnel:
#   PYTHONPATH=/root/repo:$PYTHONPATH QUEUE_SECONDS=39600 \
#     nohup bash scripts/tpu_queue_r12.sh > /tmp/tpu_queue_r12.log 2>&1 &
# Stages:
#   [1] post-adoption phase re-profile (round-5 agenda #3): the acap12/pf44
#       cut changed the r3 phase distribution — find the next row-count
#       target (scripts/ablate_step.py at the canonical bench config).
#   [2] multilight auto-flip validation with the PLATEAU criterion
#       (round-5 agenda #2): r4's -1 run stalled at the 0.031-0.034
#       residual floor; the plateau criterion should flip there. Healthy
#       run = flip fires near the hand-tuned 0.6x-iters region and final
#       MAE lands in the curriculum-fix class (~4.5).
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
export TENSOIR_STOP_FILE=/tmp/stop_train_r12
rm -f /tmp/stop_train_r12
T0=$(date +%s)
HARD_STOP=$(( T0 + ${QUEUE_SECONDS:-39600} ))
SOFT_STOP=$(( HARD_STOP - 900 ))

( while [ "$(date +%s)" -lt "$HARD_STOP" ]; do
    [ -f /tmp/stop_queue ] && break
    sleep 20
  done
  touch /tmp/stop_train_r12 ) &
WATCHDOG=$!

gate () {
  if [ -f /tmp/stop_queue ] || [ -f /tmp/stop_train_r12 ] \
     || [ "$(date +%s)" -ge "$SOFT_STOP" ]; then
    echo "=== deadline/stop before: $1 — skipping rest"
    kill "$WATCHDOG" 2>/dev/null
    echo "=== queue r12 done"
    exit 0
  fi
}

# serialize behind the r11 kickoff queue (the axon tunnel is one-at-a-time)
echo "waiting for queue r11 to drain..."
while pgrep -f tpu_queue_r11_kickoff.sh > /dev/null 2>&1; do
  gate "r11 wait"
  sleep 60
done
echo "r11 drained at $(( $(date +%s) - T0 ))s"

gate "phase re-profile"
echo "=== [1/2] post-adoption phase re-profile (ablate_step)"
python scripts/ablate_step.py > /tmp/ablate_r5.log 2>&1
echo "exit: $?"; tail -20 /tmp/ablate_r5.log

gate "multilight auto-flip (plateau)"
echo "=== [2/2] multilight auto-flip validation (plateau criterion)"
python examples/train_multilight_demo.py --iters 4000 \
  --fast_march_start -1 --sec_stats 1 \
  --out ./log/ml_autoflip_r5 > /tmp/ml_autoflip_r5.log 2>&1
echo "exit: $?"
grep -E "AUTO flip|final" /tmp/ml_autoflip_r5.log | head -5
tail -8 /tmp/ml_autoflip_r5.log

kill "$WATCHDOG" 2>/dev/null
echo "=== queue r12 done"
