#!/bin/bash
# Round-3 TPU queue, stage E — waits for stage D ("queue r5d done" marker),
# then evaluates the 20k flagship's checkpoint series with the exact
# protocol to localize the late-training normal-MAE / albedo drift.
#   PYTHONPATH=/root/repo:$PYTHONPATH nohup bash scripts/tpu_queue_r5e.sh > /tmp/tpu_queue_r5e.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"

echo "=== waiting for stage D to release the tunnel"
while ! grep -q "queue r5d done" /tmp/tpu_queue_r5d.log 2>/dev/null; do
  sleep 60
done
echo "=== stage D done, starting ckpt-series eval"

D=./log/synthetic_demo_r3_20k
python scripts/eval_ckpt_series.py \
  "$D/ckpt_4000.npz" "$D/ckpt_8000.npz" "$D/ckpt_12000.npz" \
  "$D/ckpt_16000.npz" "$D/ckpt_final.npz" \
  > /tmp/ckpt_series_20k.log 2>&1
echo "series exit: $?"
grep -h '"ckpt"' /tmp/ckpt_series_20k.log
echo "=== queue r5e done"
