#!/bin/bash
# Round-3 queue A: quality gate for the grouped-march + app-bake winner,
# then a phase profile at the candidate config.
# Gate reference (demo D, log/synthetic_demo_r2_d3p12, 5k iters):
#   psnr_nvs 38.74 / psnr_nvs_brdf 36.84 / normal MAE 2.52 deg / albedo 20.92
# PASS = within run noise (~0.3dB BRDF / ~0.1 deg) of demo D.
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"

echo "=== [1/2] gate F: g4_gb64_ab64 (measured A/B winner, -25.8% step) at canonical demo config"
python examples/train_synthetic_demo.py --iters 5000 --bake_reso 128 \
  --relight_cap 4096 --window 48 --window_back 16 --compact 0.5625 \
  --prepass 12 --dilate 3 \
  --march_group 4 --group_bake 64 --app_bake 64 \
  --out ./log/synthetic_demo_r3_gateF > /tmp/demo_gateF.log 2>&1
echo "gate F exit: $?"

echo "=== [2/2] phase profile at the candidate config"
python scripts/ablate_step.py > /tmp/ablate_step_r3.log 2>&1
echo "profile exit: $?"
echo "=== queue r3a done"
