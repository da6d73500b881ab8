#!/bin/bash
# Round-3 session-3 queue (post machine-reset; all stage F-K state in
# /tmp and log/ was wiped). Lean re-run ordered by value-per-minute for
# a ~1h window:
#   [1] tile-size A/B (t64k is EXACT — adoptable without a quality gate
#       if loss-identical and faster)
#   [2] fresh canonical bench (current bench.py knobs)
#   [3] ml_bisect 'bake' probe — fills the stage-G bisection matrix
#   [4] multilight fix demo (fast_march_start 1800) — if time remains
# Every step checks the deadline file so we never hold the axon tunnel
# into the round boundary (SIGKILL mid-compile wedges it ~20-30 min).
#   DEADLINE=$(( $(date +%s) + 2400 )) PYTHONPATH=/root/repo:$PYTHONPATH \
#     nohup bash scripts/tpu_queue_r5s3.sh > /tmp/tpu_queue_r5s3.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
DEADLINE=${DEADLINE:-$(( $(date +%s) + 2400 ))}

gate () {  # skip remaining steps past the deadline or on stop-file
  if [ -f /tmp/stop_queue ] || [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "=== deadline/stop reached before: $1 — skipping rest"
    echo "=== queue r5s3 done"
    exit 0
  fi
}

gate "tile A/B"
echo "=== [1/4] tile-size A/B (interleaved, exact knob)"
ABLATE_ITERS=16 python scripts/ablate_group.py \
  p8_ab64 t64k_p8_ab64 p8_ab64 t64k_p8_ab64 \
  > /tmp/ablate_tiles.log 2>&1
echo "tiles A/B exit: $?"
grep -h '"variant"' /tmp/ablate_tiles.log

gate "bench"
echo "=== [2/4] fresh canonical bench"
python bench.py > /tmp/bench_r3_s3.log 2>&1
echo "bench exit: $?"
tail -1 /tmp/bench_r3_s3.log

gate "bake probe"
echo "=== [3/4] multilight probe: bake (ab64 only, no window)"
python examples/train_multilight_demo.py --iters 2000 \
  --out ./log/ml_bisect_bake --window 0 --window_back 0 --compact 0 \
  > /tmp/ml_bisect_bake.log 2>&1
echo "bake exit: $?"
python - <<'PY'
import json
try:
    m = json.load(open("./log/ml_bisect_bake/final_metrics.json"))
    row = {k: round(v["psnr_nvs_brdf"], 2) for k, v in m.items()
           if isinstance(v, dict)}
    mae = next(v["normal_mae_deg"] for v in m.values() if isinstance(v, dict))
    print(json.dumps({"probe": "bake", "brdf": row,
                      "normal_mae_deg": round(mae, 2)}))
except Exception as e:
    print("harvest failed:", e)
PY

gate "multilight fix"
echo "=== [4/4] multilight demo, fast_march_start fix (window from iter 1800)"
python examples/train_multilight_demo.py --iters 4000 \
  --fast_march_start 1800 --sec_stats 1 \
  --out ./log/multilight_demo_r3_fix > /tmp/multilight_fix.log 2>&1
echo "multilight fix exit: $?"
python - <<'PY'
import json
try:
    m = json.load(open("./log/multilight_demo_r3_fix/final_metrics.json"))
    row = {k: round(v["psnr_nvs_brdf"], 2) for k, v in m.items()
           if isinstance(v, dict)}
    mae = next(v["normal_mae_deg"] for v in m.values() if isinstance(v, dict))
    print(json.dumps({"run": "multilight_fix", "brdf": row,
                      "normal_mae_deg": round(mae, 2)}))
except Exception as e:
    print("harvest failed:", e)
PY

echo "=== queue r5s3 done"
