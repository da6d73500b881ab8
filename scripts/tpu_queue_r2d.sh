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
