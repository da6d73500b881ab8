#!/bin/bash
# Round-3 queue B (written late round 2, session 5): next TPU session's
# first moves, in priority order.
#
# Canonical config as of this writing: bench.py with app_bake_reso=64
# (ab64 adopted; g4 grouped secondary march gate-REJECTED at -0.31dB BRDF
# — BASELINE.md). The grouped PRIMARY march (march_group/pg4) is EXACT,
# CPU-verified, and unmeasured on-chip — measure it first.
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
rm -f /tmp/skip_ablate

echo "=== [1/3] primary-group A/B at the adopted canonical (ab64)"
python scripts/ablate_group.py ab64 ab64_pg4 pg4 canonical \
  > /tmp/ablate_pgroup.log 2>&1
echo "pgroup A/B exit: $?"

echo "=== [2/3] phase profile at the adopted canonical"
python scripts/ablate_step.py > /tmp/ablate_step_r3.log 2>&1
echo "profile exit: $?"

echo "=== [3/3] 10k-iter flagship at the adopted canonical (+pg4 if [1]"
echo "    showed a win -- edit this line before running, it is EXACT so"
echo "    no quality gate is needed)"
python examples/train_synthetic_demo.py --iters 10000 --bake_reso 128 \
  --relight_cap 4096 --window 48 --window_back 16 --compact 0.5625 \
  --prepass 12 --dilate 3 --app_bake 64 \
  --out ./log/synthetic_demo_r3_10k > /tmp/demo_r3_10k.log 2>&1
echo "flagship exit: $?"
echo "=== queue r4 done"
