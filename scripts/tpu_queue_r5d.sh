#!/bin/bash
# Round-3 TPU queue, stage D — launch after the 20k flagship (queue r5c)
# finishes. Short harvest jobs, highest value first.
#   PYTHONPATH=/root/repo:$PYTHONPATH nohup bash scripts/tpu_queue_r5d.sh > /tmp/tpu_queue_r5d.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"

echo "=== [1/6] app-hoist / tile-size A/B (round-3 profile follow-up)"
ABLATE_ITERS=16 python scripts/ablate_group.py \
  ab64 hoist_ab64 t64k_ab64 ab64 hoist_ab64 hoist_t64k_ab64 \
  > /tmp/ablate_hoist.log 2>&1
echo "hoist A/B exit: $?"
grep -h '"variant"' /tmp/ablate_hoist.log

echo "=== [1b/6] XProf traces of the canonical step (app-stage ground truth)"
python scripts/trace_step.py ./log/trace_r3 > /tmp/trace_r3.log 2>&1
echo "trace exit: $?"
python scripts/trace_step.py ./log/trace_r3_hoist hoist > /tmp/trace_r3b.log 2>&1
echo "trace(hoist) exit: $?"

echo "=== [2/6] relighting benchmark refresh on the 20k checkpoint"
CKPT=$(ls -t ./log/synthetic_demo_r3_20k/ckpt_final.npz ./log/synthetic_demo_r3_20k/*/ckpt_final.npz 2>/dev/null | head -1)
[ -z "$CKPT" ] && CKPT=$(find ./log/synthetic_demo_r3_20k -name "*.npz" -printf "%T@ %p\n" | sort -n | tail -1 | cut -d" " -f2-)
echo "ckpt: $CKPT"
python examples/relight_demo.py --ckpt "$CKPT" \
  --out ./log/relight_demo_r3 > /tmp/relight_r3.log 2>&1
echo "relight exit: $?"
tail -4 /tmp/relight_r3.log

echo "=== [3/6] multi-light rotated demo at cap 4096 + canonical fast march"
python examples/train_multilight_demo.py --iters 4000 \
  --out ./log/multilight_demo_r3 > /tmp/multilight_r3.log 2>&1
echo "multilight exit: $?"

echo "=== [4/6] general multi-light demo at cap 4096 + canonical fast march"
python examples/train_general_multilight_demo.py --iters 4000 \
  --out ./log/general_multilight_r3 > /tmp/general_multilight_r3.log 2>&1
echo "general multilight exit: $?"

echo "=== [5/6] final canonical bench"
python bench.py > /tmp/bench_r3_final.log 2>&1
echo "bench exit: $?"
cat /tmp/bench_r3_final.log

echo "=== [6/6] pallas scatter/gather microbench — LAST (wedge risk)"
python scripts/bench_pallas_scatter.py > /tmp/pallas_scatter_r3.log 2>&1
echo "pallas exit: $?"
grep -h '"phase"' /tmp/pallas_scatter_r3.log | tail -10
echo "=== queue r5d done"
