#!/bin/bash
# Round-5 third queue — launch any time; WAITS for r11 AND r12 to drain.
#   PYTHONPATH=/root/repo:$PYTHONPATH QUEUE_SECONDS=39600 \
#     nohup bash scripts/tpu_queue_r13.sh > /tmp/tpu_queue_r13.log 2>&1 &
# Stages:
#   [1] ckpt-series albedo localization on the 20k flagship's periodic
#       checkpoints (VERDICT r4 #7): same treatment the r3 normals
#       regression got — exact protocol, fixed views, one JSON row per
#       ckpt. The albedo column is the target trend.
#   [2] bench.py refresh: first on-chip run of the self-documenting
#       overflow fields (VERDICT r4 #5) — sanity-check the emitted
#       sec_app_pair_overflow_frac (~0.47 expected on the solid scene)
#       before the driver's end-of-round official run.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
T0=$(date +%s)
HARD_STOP=$(( T0 + ${QUEUE_SECONDS:-39600} ))
SOFT_STOP=$(( HARD_STOP - 900 ))

gate () {
  if [ -f /tmp/stop_queue ] || [ "$(date +%s)" -ge "$SOFT_STOP" ]; then
    echo "=== deadline/stop before: $1 — skipping rest"
    echo "=== queue r13 done"
    exit 0
  fi
}

echo "waiting for queues r11+r12 to drain..."
while pgrep -f 'tpu_queue_r1[12]' > /dev/null 2>&1; do
  gate "r11/r12 wait"
  sleep 60
done
echo "prior queues drained at $(( $(date +%s) - T0 ))s"

gate "ckpt series"
echo "=== [1/2] 20k flagship ckpt-series (albedo localization)"
CKPTS=$(ls ./log/synthetic_demo_r5_20k/ckpt_{4000,8000,12000,16000}.npz \
  ./log/synthetic_demo_r5_20k/ckpt_final.npz 2>/dev/null)
echo "ckpts: $CKPTS"
python scripts/eval_ckpt_series.py $CKPTS > /tmp/ckpt_series_r5.log 2>&1
echo "exit: $?"
grep -E '^\{' /tmp/ckpt_series_r5.log | tee ./log/ckpt_series_r5_20k.jsonl

gate "bench overflow check"
echo "=== [2/2] bench.py with overflow fields"
python bench.py > /tmp/bench_r5_overflow.log 2>&1
echo "exit: $?"; tail -2 /tmp/bench_r5_overflow.log

echo "=== queue r13 done"
