#!/bin/bash
# Round-2 queue C: dilate-3 prepass-12 quality gate, then the final bench.
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"

echo "=== [1/2] demo D: dilate3 + prepass12 quality gate (vs demo B)"
python examples/train_synthetic_demo.py --iters 5000 --bake_reso 128 \
  --relight_cap 4096 --window 48 --window_back 16 --compact 0.5625 \
  --prepass 12 --dilate 3 \
  --out ./log/synthetic_demo_r2_d3p12 > /tmp/demo_d.log 2>&1
echo "demo D exit: $?"

echo "=== [2/2] canonical bench (scatter select adopted)"
python bench.py > /tmp/bench_r2c.log 2>&1
echo "bench exit: $?"
echo "=== queue C done"
