#!/bin/bash
# Round-3 TPU queue, stage H — 20k flagship rerun with the phase schedule
# ANCHORED at the 5k-proven absolute positions (single-variable fix for
# the 20k normals equilibrium, BASELINE.md ckpt-series analysis).
# Waits for stage G.
#   PYTHONPATH=/root/repo:$PYTHONPATH nohup bash scripts/tpu_queue_r5h.sh > /tmp/tpu_queue_r5h.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"

echo "=== waiting for stage G to release the tunnel"
while ! grep -q "queue r5g done" /tmp/tpu_queue_r5g.log 2>/dev/null; do
  sleep 60
done

echo "=== [1/4] 5k quality gate: acap12 + pf0.4375 (demo-scene zero-overflow caps)"
python examples/train_synthetic_demo.py --iters 5000 \
  --bake_reso 128 --relight_cap 4096 --window 48 --window_back 16 \
  --compact 0.5625 --prepass 12 --dilate 3 --app_bake 64 \
  --app_cap_secondary 12 --pair_frac 0.4375 --sec_stats 1 \
  --out ./log/synthetic_demo_r3_capgate > /tmp/demo_capgate.log 2>&1
echo "cap gate exit: $?"
tail -12 /tmp/demo_capgate.log

echo "=== [2/4] multilight demo, fast_march_start fix (window from iter 1800)"
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

echo "=== [3/4] general multilight demo, fast_march_start fix"
python examples/train_general_multilight_demo.py --iters 4000 \
  --fast_march_start 1800 \
  --out ./log/general_multilight_r3_fix > /tmp/general_multilight_fix.log 2>&1
echo "general fix exit: $?"
python - <<'PY'
import json
try:
    m = json.load(open("./log/general_multilight_r3_fix/final_metrics.json"))
    row = {k: round(v["psnr_nvs_brdf"], 2) for k, v in m.items()
           if isinstance(v, dict)}
    mae = next(v["normal_mae_deg"] for v in m.values() if isinstance(v, dict))
    print(json.dumps({"run": "general_fix", "brdf": row,
                      "normal_mae_deg": round(mae, 2)}))
except Exception as e:
    print("harvest failed:", e)
PY

echo "=== queue r5h done"
