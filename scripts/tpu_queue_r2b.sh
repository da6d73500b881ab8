#!/bin/bash
# Round-2 TPU queue, part B: tighter-window quality gate + general-multi soak.
# Launch: PYTHONPATH=/root/repo:$PYTHONPATH nohup bash scripts/tpu_queue_r2b.sh > /tmp/tpu_queue_b.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"

echo "=== [1/2] demo C: tighter march (w40=28+12, prepass 14) quality gate"
python examples/train_synthetic_demo.py --iters 5000 --bake_reso 128 \
  --relight_cap 4096 --window 40 --window_back 12 --compact 0.5625 \
  --prepass 14 \
  --out ./log/synthetic_demo_r2_w40 > /tmp/demo_c.log 2>&1
echo "demo C exit: $?"

echo "=== [2/2] general-multi-lights soak (per-light SG sets)"
python examples/train_general_multilight_demo.py --iters 4000 \
  --out ./log/general_multilight_r2 > /tmp/general_r2.log 2>&1
echo "general exit: $?"
echo "=== queue B done"
