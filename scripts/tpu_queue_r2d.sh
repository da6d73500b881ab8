#!/bin/bash
# Round-2 queue D: final canonical bench (scatter + d3p12) + phase profile.
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"

echo "=== [1/2] final canonical bench (scatter + dilate3/prepass12)"
python bench.py > /tmp/bench_r2d.log 2>&1
echo "bench exit: $?"

echo "=== [2/2] phase-split profile at canonical config"
python scripts/ablate_step.py > /tmp/ablate_step_r2.log 2>&1
echo "ablate exit: $?"
echo "=== queue D done"

echo "=== [3/3] flagship quality run: 10k iters at final canonical (demo E)"
python examples/train_synthetic_demo.py --iters 10000 --bake_reso 128 \
  --relight_cap 4096 --window 48 --window_back 16 --compact 0.5625 \
  --prepass 12 --dilate 3 \
  --out ./log/synthetic_demo_r2_10k > /tmp/demo_e.log 2>&1
echo "demo E exit: $?"
echo "=== queue D done (incl. demo E)"
