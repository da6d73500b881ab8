#!/bin/bash
# Round-3 stage K — the 20k anchored flagship, LAST in the chain so the
# short harvests (cap gate, multilight fixes, tile A/B, bench) land
# before the round boundary. Waits for stage I.
#   PYTHONPATH=/root/repo:$PYTHONPATH nohup bash scripts/tpu_queue_r5k.sh > /tmp/tpu_queue_r5k.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"

while ! grep -q "queue r5i done" /tmp/tpu_queue_r5i.log 2>/dev/null; do
  sleep 60
done

echo "=== [1/1] 20k flagship, phase_anchor 5000, canonical knobs + telemetry"
python examples/train_synthetic_demo.py --iters 20000 --phase_anchor 5000 \
  --bake_reso 128 --relight_cap 4096 --window 48 --window_back 16 \
  --compact 0.5625 --prepass 12 --dilate 3 --app_bake 64 \
  --sec_stats 1 --save_iters 4000 \
  --out ./log/synthetic_demo_r3_20k_anchor > /tmp/demo_r3_20k_anchor.log 2>&1
echo "flagship exit: $?"
tail -12 /tmp/demo_r3_20k_anchor.log
echo "=== queue r5k done"
