#!/bin/bash
# Round-3 stage G2 — cap-only multilight probe (disambiguates the
# relight_cap 512->4096 confound if BOTH 'win' and 'bake' collapse).
# Launch manually after stage G's verdicts; waits for stage G.
#   PYTHONPATH=/root/repo:$PYTHONPATH nohup bash scripts/tpu_queue_r5g2.sh > /tmp/tpu_queue_r5g2.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"

while ! grep -q "queue r5g done" /tmp/tpu_queue_r5g.log 2>/dev/null; do
  sleep 60
done

echo "=== multilight probe: cap4096 only (no fast knobs)"
python examples/train_multilight_demo.py --iters 2000 \
  --out ./log/ml_bisect_cap --window 0 --window_back 0 --compact 0 \
  --app_bake 0 > /tmp/ml_bisect_cap.log 2>&1
echo "cap exit: $?"
python - <<'PY'
import json
m = json.load(open("./log/ml_bisect_cap/final_metrics.json"))
row = {k: round(v["psnr_nvs_brdf"], 2) for k, v in m.items()
       if isinstance(v, dict)}
mae = next(v["normal_mae_deg"] for v in m.values() if isinstance(v, dict))
print(json.dumps({"probe": "cap", "brdf": row,
                  "normal_mae_deg": round(mae, 2)}))
PY
echo "=== queue r5g2 done"
