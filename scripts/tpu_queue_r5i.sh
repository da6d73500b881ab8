#!/bin/bash
# Round-3 TPU queue, stage I — tile-size controls (never measured: the
# stage-D hoist crash killed the A/B before t64k ran) + the combined
# final-candidate canonical (p8 + acap12_pf44), then a fresh bench.
# Waits for stage H.
#   PYTHONPATH=/root/repo:$PYTHONPATH nohup bash scripts/tpu_queue_r5i.sh > /tmp/tpu_queue_r5i.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"

echo "=== waiting for stage H to release the tunnel"
while ! grep -q "queue r5h done" /tmp/tpu_queue_r5h.log 2>/dev/null; do
  sleep 60
done

echo "=== [1/2] tile-size + combined-candidate A/B (interleaved)"
ABLATE_ITERS=16 python scripts/ablate_group.py \
  p8_ab64 t64k_p8_ab64 acap12_pf44_p8_ab64 \
  p8_ab64 t64k_p8_ab64 acap12_pf44_p8_ab64 \
  > /tmp/ablate_tiles.log 2>&1
echo "tiles A/B exit: $?"
grep -h '"variant"' /tmp/ablate_tiles.log

echo "=== [2/2] fresh canonical bench (current bench.py config)"
python bench.py > /tmp/bench_r3_final3.log 2>&1
echo "bench exit: $?"
tail -1 /tmp/bench_r3_final3.log
echo "=== queue r5i done"
