#!/bin/bash
# Round-3 TPU queue, stage G — multilight normal-collapse bisection.
# Both r3 multilight demos (rotated + general) collapsed to inverted
# normals (MAE ~40 deg, BRDF ~19) under the canonical fast-march knobs,
# while every single-light gate stayed healthy — knob x multilight is the
# suspect. Short 2000-iter runs; the full-knob control goes FIRST (if the
# collapse needs >2000 iters these short probes prove nothing).
# Waits for stage F.
#   PYTHONPATH=/root/repo:$PYTHONPATH nohup bash scripts/tpu_queue_r5g.sh > /tmp/tpu_queue_r5g.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"

echo "=== waiting for stage F to release the tunnel"
while ! grep -q "queue r5f done" /tmp/tpu_queue_r5f.log 2>/dev/null; do
  sleep 60
done

run () {  # name, extra args...
  local name=$1; shift
  echo "=== multilight probe: $name"
  python examples/train_multilight_demo.py --iters 2000 \
    --out "./log/ml_bisect_$name" "$@" > "/tmp/ml_bisect_$name.log" 2>&1
  echo "$name exit: $?"
  python - "$name" <<'PY'
import json, sys
try:
    m = json.load(open(f"./log/ml_bisect_{sys.argv[1]}/final_metrics.json"))
    row = {k: round(v["psnr_nvs_brdf"], 2) for k, v in m.items()
           if isinstance(v, dict)}
    mae = next(v["normal_mae_deg"] for v in m.values() if isinstance(v, dict))
    print(json.dumps({"probe": sys.argv[1], "brdf": row,
                      "normal_mae_deg": round(mae, 2)}))
except Exception as e:
    print("harvest failed:", e)
PY
}

# control: full canonical knobs (expect the collapse to reproduce)
run full --sec_stats 1
# r2 repro: knobs off, cap 512
run off --window 0 --window_back 0 --compact 0 --app_bake 0 --relight_cap 512
# window/compact only (no app bake)
run win --app_bake 0
# app bake only (full exact march otherwise)
run bake --window 0 --window_back 0 --compact 0

echo "=== queue r5g done"
