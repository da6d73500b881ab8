#!/bin/bash
# Round-2 TPU job queue: run sequentially so the serialized axon tunnel
# never sees concurrent claims. Launch detached:
#   PYTHONPATH=/root/repo:$PYTHONPATH nohup bash scripts/tpu_queue_r2.sh > /tmp/tpu_queue.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"

echo "=== [1/5] flagship demo A: round-1 config post-sRGB-fix (cap512, bake128)"
python examples/train_synthetic_demo.py --iters 5000 --bake_reso 128 \
  --out ./log/synthetic_demo_r2_cap512 > /tmp/demo_a.log 2>&1
echo "demo A exit: $?"

echo "=== [2/5] flagship demo B: new canonical perf config (cap4096, w48, c56)"
python examples/train_synthetic_demo.py --iters 5000 --bake_reso 128 \
  --relight_cap 4096 --window 48 --window_back 16 --compact 0.5625 \
  --out ./log/synthetic_demo_r2_cap4096 > /tmp/demo_b.log 2>&1
echo "demo B exit: $?"

echo "=== [3/5] relighting benchmark on demo B checkpoint"
CKPT=$(ls ./log/synthetic_demo_r2_cap4096/synthetic_demo/*.npz 2>/dev/null | tail -1)
[ -z "$CKPT" ] && CKPT=$(find ./log/synthetic_demo_r2_cap4096 -name "*.npz" | tail -1)
echo "ckpt: $CKPT"
python examples/relight_demo.py --ckpt "$CKPT" \
  --out ./log/relight_demo_r2 > /tmp/relight_r2.log 2>&1
echo "relight exit: $?"

echo "=== [4/5] multi-light rotated demo soak"
python examples/train_multilight_demo.py --iters 4000 \
  --out ./log/multilight_demo_r2 > /tmp/multilight_r2.log 2>&1
echo "multilight exit: $?"

echo "=== [5/5] canonical bench"
python bench.py > /tmp/bench_canonical_r2.log 2>&1
echo "bench exit: $?"
cat /tmp/bench_canonical_r2.log
echo "=== queue done"
