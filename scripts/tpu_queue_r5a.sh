#!/bin/bash
# Round-3 TPU queue, stage A: the two 5k quality gates. Harvest BOTH before
# launching the 20k flagship (stage B) so the flagship runs the final
# adopted config.
#   PYTHONPATH=/root/repo:$PYTHONPATH nohup bash scripts/tpu_queue_r5a.sh > /tmp/tpu_queue_r5a.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"

echo "=== [1/2] ab64 soak gate (VERDICT #4): demo-D config + app_bake 64"
python examples/train_synthetic_demo.py --iters 5000 --bake_reso 128 \
  --relight_cap 4096 --window 48 --window_back 16 --compact 0.5625 \
  --prepass 12 --dilate 3 --app_bake 64 \
  --out ./log/synthetic_demo_r3_ab64gate > /tmp/demo_ab64gate.log 2>&1
echo "ab64 gate exit: $?"

echo "=== [2/2] g4_gb96 gate (VERDICT #6): + grouped secondary march, 96^3 block bake"
python examples/train_synthetic_demo.py --iters 5000 --bake_reso 128 \
  --relight_cap 4096 --window 48 --window_back 16 --compact 0.5625 \
  --prepass 12 --dilate 3 --app_bake 96 --march_group 4 --group_bake 96 \
  --out ./log/synthetic_demo_r3_gb96gate > /tmp/demo_gb96gate.log 2>&1
echo "gb96 gate exit: $?"
echo "=== queue r5a done"
