#!/bin/bash
# Round-3 TPU queue (sequential; the axon tunnel serializes sessions).
# Launch detached:
#   PYTHONPATH=/root/repo:$PYTHONPATH nohup bash scripts/tpu_queue_r5.sh > /tmp/tpu_queue_r5.log 2>&1 &
#
# Prior steps this round (already done): pg4 interleaved A/B — REJECTED
# (+3.5%, BASELINE.md); gb96 grouped-secondary A/B ran before this queue.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"

echo "=== [1/6] ab64 soak gate (VERDICT #4): demo-D config + app_bake 64, 5k iters"
python examples/train_synthetic_demo.py --iters 5000 --bake_reso 128 \
  --relight_cap 4096 --window 48 --window_back 16 --compact 0.5625 \
  --prepass 12 --dilate 3 --app_bake 64 \
  --out ./log/synthetic_demo_r3_ab64gate > /tmp/demo_ab64gate.log 2>&1
echo "ab64 gate exit: $?"
tail -3 ./log/synthetic_demo_r3_ab64gate/final_metrics.json 2>/dev/null || true

echo "=== [2/6] 20k-iter flagship at the adopted canonical (VERDICT #3)"
python examples/train_synthetic_demo.py --iters 20000 --bake_reso 128 \
  --relight_cap 4096 --window 48 --window_back 16 --compact 0.5625 \
  --prepass 12 --dilate 3 --app_bake 64 \
  --out ./log/synthetic_demo_r3_20k > /tmp/demo_r3_20k.log 2>&1
echo "flagship exit: $?"

echo "=== [3/6] relighting benchmark refresh on the 20k checkpoint"
CKPT=$(ls -t ./log/synthetic_demo_r3_20k/*/ckpt_final.npz 2>/dev/null | head -1)
[ -z "$CKPT" ] && CKPT=$(find ./log/synthetic_demo_r3_20k -name "*.npz" -printf "%T@ %p\n" | sort -n | tail -1 | cut -d" " -f2-)
echo "ckpt: $CKPT"
python examples/relight_demo.py --ckpt "$CKPT" \
  --out ./log/relight_demo_r3 > /tmp/relight_r3.log 2>&1
echo "relight exit: $?"

echo "=== [4/6] eval fast-march on-chip verification (VERDICT #7)"
python scripts/verify_eval_fast.py "$CKPT" 3 128 > /tmp/eval_fast_r3.log 2>&1
echo "eval-fast exit: $?"
cat /tmp/eval_fast_r3.log

echo "=== [5/6] multi-light demos at cap 4096 + canonical fast march"
python examples/train_multilight_demo.py --iters 4000 \
  --out ./log/multilight_demo_r3 > /tmp/multilight_r3.log 2>&1
echo "multilight exit: $?"
python examples/train_general_multilight_demo.py --iters 4000 \
  --out ./log/general_multilight_r3 > /tmp/general_multilight_r3.log 2>&1
echo "general multilight exit: $?"

echo "=== [6/6] canonical bench (new MFU/HBM/row-budget fields)"
python bench.py > /tmp/bench_r3.log 2>&1
echo "bench exit: $?"
cat /tmp/bench_r3.log
echo "=== queue r5 done"
