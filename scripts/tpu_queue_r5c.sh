#!/bin/bash
# Round-3 TPU queue, stage C (replaces the tail of r5a + reorders r5b):
# short jobs FIRST so the 20k flagship gets every remaining tunnel hour
# and the round-boundary driver bench never queues behind a long job.
#   PYTHONPATH=/root/repo:$PYTHONPATH nohup bash scripts/tpu_queue_r5c.sh > /tmp/tpu_queue_r5c.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"

echo "=== [1/4] canonical bench (validates the new MFU/HBM/row-budget fields on axon)"
python bench.py > /tmp/bench_r3.log 2>&1
echo "bench exit: $?"
cat /tmp/bench_r3.log

echo "=== [2/4] eval fast-march on-chip verification (ab64-gate checkpoint)"
python scripts/verify_eval_fast.py \
  ./log/synthetic_demo_r3_ab64gate/ckpt_final.npz 3 128 \
  > /tmp/eval_fast_r3.log 2>&1
echo "eval-fast exit: $?"
cat /tmp/eval_fast_r3.log

echo "=== [3/4] phase-time profile re-harvest (VERDICT #2)"
rm -f /tmp/skip_ablate
python scripts/ablate_step.py > /tmp/ablate_step_r3b.log 2>&1
echo "profile exit: $?"
tail -20 /tmp/ablate_step_r3b.log

echo "=== [4/4] 20k-iter flagship at the adopted canonical (ab64), periodic saves"
python examples/train_synthetic_demo.py --iters 20000 --bake_reso 128 \
  --relight_cap 4096 --window 48 --window_back 16 --compact 0.5625 \
  --prepass 12 --dilate 3 --app_bake 64 --save_iters 4000 \
  --out ./log/synthetic_demo_r3_20k > /tmp/demo_r3_20k.log 2>&1
echo "flagship exit: $?"
tail -12 /tmp/demo_r3_20k.log
echo "=== queue r5c done"
