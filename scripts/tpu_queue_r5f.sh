#!/bin/bash
# Round-3 TPU queue, stage F — app-row cap A/B (trace-guided; BASELINE.md
# "XProf trace: app stage attribution"). Waits for stage E.
#   PYTHONPATH=/root/repo:$PYTHONPATH nohup bash scripts/tpu_queue_r5f.sh > /tmp/tpu_queue_r5f.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"

echo "=== waiting for stage E to release the tunnel"
while ! grep -q "queue r5e done" /tmp/tpu_queue_r5e.log 2>/dev/null; do
  sleep 60
done

echo "=== [1/2] app-cap A/B, interleaved (drift discipline, CLAUDE.md)"
# stats_ab64 vs ab64 also measures the telemetry's own overhead; the cap
# variants carry stats so overflow/occupancy land in the same log.
ABLATE_ITERS=16 python scripts/ablate_group.py \
  ab64 stats_ab64 acap8_ab64 pf25_ab64 acap8_pf25_ab64 acap8_pf12_ab64 acap12_pf44_ab64 p8_ab64 \
  ab64 stats_ab64 acap8_ab64 pf25_ab64 acap8_pf25_ab64 acap8_pf12_ab64 acap12_pf44_ab64 p8_ab64 \
  > /tmp/ablate_caps.log 2>&1
echo "caps A/B exit: $?"
grep -h '"variant"' /tmp/ablate_caps.log

echo "=== [2/2] final canonical bench (unchanged config, fresh number)"
python bench.py > /tmp/bench_r3_final2.log 2>&1
echo "bench exit: $?"
tail -1 /tmp/bench_r3_final2.log
echo "=== queue r5f done"
