#!/bin/bash
# Round-5 fourth queue — WAITS for r11/r12/r13 to drain.
#   PYTHONPATH=/root/repo:$PYTHONPATH QUEUE_SECONDS=39600 \
#     nohup bash scripts/tpu_queue_r14.sh > /tmp/tpu_queue_r14.log 2>&1 &
# Stage:
#   [1] general-multilight lr_light=3e-3 demo arm (VERDICT r4 #6): the
#       CPU study (BASELINE.md r5 gap study) closed the 21.65-vs-13.06
#       toy gap by scaling the light-group lr by L=3; this arm tests the
#       same at demo scale. Healthy = MAE <= ~5-6 deg (the r2 healthy
#       class) vs the r4 stock-lr general demo's 7.94.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
T0=$(date +%s)
HARD_STOP=$(( T0 + ${QUEUE_SECONDS:-39600} ))
SOFT_STOP=$(( HARD_STOP - 900 ))

gate () {
  if [ -f /tmp/stop_queue ] || [ "$(date +%s)" -ge "$SOFT_STOP" ]; then
    echo "=== deadline/stop before: $1 — skipping rest"
    echo "=== queue r14 done"
    exit 0
  fi
}

echo "waiting for queues r11/r12/r13 to drain..."
while pgrep -f 'tpu_queue_r1[123]' > /dev/null 2>&1; do
  gate "prior-queue wait"
  sleep 60
done
echo "prior queues drained at $(( $(date +%s) - T0 ))s"

gate "general lr3 demo"
echo "=== [1/1] general-multilight demo, lr_light 3e-3"
python examples/train_general_multilight_demo.py --iters 4000 \
  --lr_light 3e-3 \
  --out ./log/general_lr3_r5 > /tmp/general_lr3_r5.log 2>&1
echo "exit: $?"
tail -6 /tmp/general_lr3_r5.log

echo "=== queue r14 done"
