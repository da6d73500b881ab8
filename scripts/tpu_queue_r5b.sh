#!/bin/bash
# Round-3 TPU queue, stage B — launch AFTER harvesting the stage-A gates
# (scripts/tpu_queue_r5a.sh). Set GB96=1 to run the flagship with the
# grouped secondary march (only if the gb96 gate PASSED).
#   GB96=0 PYTHONPATH=/root/repo:$PYTHONPATH nohup bash scripts/tpu_queue_r5b.sh > /tmp/tpu_queue_r5b.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
GB96="${GB96:-0}"

EXTRA=""
APPB=64
if [ "$GB96" = "1" ]; then
  EXTRA="--march_group 4 --group_bake 96"
  APPB=96
fi

echo "=== [1/7] 20k-iter flagship at the final adopted canonical (GB96=$GB96)"
python examples/train_synthetic_demo.py --iters 20000 --bake_reso 128 \
  --relight_cap 4096 --window 48 --window_back 16 --compact 0.5625 \
  --prepass 12 --dilate 3 --app_bake $APPB --save_iters 5000 $EXTRA \
  --out ./log/synthetic_demo_r3_20k > /tmp/demo_r3_20k.log 2>&1
echo "flagship exit: $?"

echo "=== [2/7] relighting benchmark refresh on the 20k checkpoint"
CKPT=$(ls -t ./log/synthetic_demo_r3_20k/*/ckpt_final.npz 2>/dev/null | head -1)
[ -z "$CKPT" ] && CKPT=$(find ./log/synthetic_demo_r3_20k -name "*.npz" -printf "%T@ %p\n" | sort -n | tail -1 | cut -d" " -f2-)
echo "ckpt: $CKPT"
python examples/relight_demo.py --ckpt "$CKPT" \
  --out ./log/relight_demo_r3 > /tmp/relight_r3.log 2>&1
echo "relight exit: $?"

echo "=== [3/7] eval fast-march on-chip verification (VERDICT #7)"
python scripts/verify_eval_fast.py "$CKPT" 3 128 > /tmp/eval_fast_r3.log 2>&1
echo "eval-fast exit: $?"
cat /tmp/eval_fast_r3.log

echo "=== [4/7] phase-time profile re-harvest (VERDICT #2)"
rm -f /tmp/skip_ablate
python scripts/ablate_step.py > /tmp/ablate_step_r3b.log 2>&1
echo "profile exit: $?"

echo "=== [5/7] multi-light demos at cap 4096 + canonical fast march"
python examples/train_multilight_demo.py --iters 4000 \
  --out ./log/multilight_demo_r3 > /tmp/multilight_r3.log 2>&1
echo "multilight exit: $?"
python examples/train_general_multilight_demo.py --iters 4000 \
  --out ./log/general_multilight_r3 > /tmp/general_multilight_r3.log 2>&1
echo "general multilight exit: $?"

echo "=== [6/7] canonical bench (new MFU/HBM/row-budget fields)"
python bench.py > /tmp/bench_r3.log 2>&1
echo "bench exit: $?"
cat /tmp/bench_r3.log

echo "=== [7/7] pallas scatter/gather microbench (VERDICT #10 stretch) —"
echo "    LAST on purpose: pallas remote-compiles have wedged the tunnel"
python scripts/bench_pallas_scatter.py > /tmp/pallas_scatter_r3.log 2>&1
echo "pallas exit: $?"
tail -8 /tmp/pallas_scatter_r3.log
echo "=== queue r5b done"
