#!/bin/bash
# Round-4 kickoff queue — the round-3 work lost to the two machine
# resets, in priority order. Launch FIRST THING in round 4:
#   PYTHONPATH=/root/repo:$PYTHONPATH nohup bash scripts/tpu_queue_r6_kickoff.sh > /tmp/tpu_queue_r6.log 2>&1 &
# Context (BASELINE.md round-3 sections):
#   - acap12_pf44 measured -140 ms, +0.0002 loss; needs the 5k demo gate
#     before adoption (zero-overflow predicted on the demo scene).
#   - multilight collapse: window march on soft density is the prime
#     suspect (bisection table); fast_march_start 1800 is the mitigation.
#     If the s3 'bake' probe also collapsed, the app bake is implicated
#     too -> raise fast_march_start coverage to ALL lossy knobs (it
#     already flips all of them).
#   - 20k flagship must use --phase_anchor 5000 (ckpt-series finding).
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"

harvest_ml () {  # run-dir label
  python - "$1" "$2" <<'PY'
import json, sys
try:
    m = json.load(open(f"./log/{sys.argv[1]}/final_metrics.json"))
    row = {k: round(v["psnr_nvs_brdf"], 2) for k, v in m.items()
           if isinstance(v, dict)}
    mae = next(v["normal_mae_deg"] for v in m.values() if isinstance(v, dict))
    print(json.dumps({"run": sys.argv[2], "brdf": row,
                      "normal_mae_deg": round(mae, 2)}))
except Exception as e:
    print("harvest failed:", e)
PY
}

echo "=== [0/5] ml_bisect 'bake' probe (completes the stage-G matrix)"
python examples/train_multilight_demo.py --iters 2000 \
  --out ./log/ml_bisect_bake --window 0 --window_back 0 --compact 0 \
  > /tmp/ml_bisect_bake.log 2>&1
echo "exit: $?"; harvest_ml ml_bisect_bake bake_probe

echo "=== [1/5] multilight fix demo (fast_march_start 1800)"
python examples/train_multilight_demo.py --iters 4000 \
  --fast_march_start 1800 --sec_stats 1 \
  --out ./log/multilight_demo_r4_fix > /tmp/multilight_fix.log 2>&1
echo "exit: $?"; harvest_ml multilight_demo_r4_fix multilight_fix

echo "=== [2/5] general multilight fix demo"
python examples/train_general_multilight_demo.py --iters 4000 \
  --fast_march_start 1800 \
  --out ./log/general_multilight_r4_fix > /tmp/general_fix.log 2>&1
echo "exit: $?"; harvest_ml general_multilight_r4_fix general_fix

echo "=== [3/5] 5k cap-tightening gate (acap12 + pf0.4375)"
python examples/train_synthetic_demo.py --iters 5000 \
  --bake_reso 128 --relight_cap 4096 --window 48 --window_back 16 \
  --compact 0.5625 --prepass 8 --dilate 3 --app_bake 64 \
  --app_cap_secondary 12 --pair_frac 0.4375 --sec_stats 1 \
  --out ./log/synthetic_demo_r4_capgate > /tmp/demo_capgate.log 2>&1
echo "exit: $?"; tail -12 /tmp/demo_capgate.log

echo "=== [4/5] 20k anchored flagship (phase_anchor 5000, save_iters 4000)"
python examples/train_synthetic_demo.py --iters 20000 --phase_anchor 5000 \
  --bake_reso 128 --relight_cap 4096 --window 48 --window_back 16 \
  --compact 0.5625 --prepass 8 --dilate 3 --app_bake 64 \
  --sec_stats 1 --save_iters 4000 \
  --out ./log/synthetic_demo_r4_20k_anchor > /tmp/demo_20k_anchor.log 2>&1
echo "exit: $?"; tail -12 /tmp/demo_20k_anchor.log

echo "=== [5/5] relight refresh on the anchored 20k ckpt"
CKPT=$(ls -t ./log/synthetic_demo_r4_20k_anchor/ckpt_final.npz \
  ./log/synthetic_demo_r4_20k_anchor/*/ckpt_final.npz 2>/dev/null | head -1)
[ -z "$CKPT" ] && CKPT=$(find ./log/synthetic_demo_r4_20k_anchor -name "*.npz" \
  -printf "%T@ %p\n" | sort -n | tail -1 | cut -d" " -f2-)
echo "ckpt: $CKPT"
python examples/relight_demo.py --ckpt "$CKPT" \
  --out ./log/relight_r4_20k > /tmp/relight_r4.log 2>&1
echo "exit: $?"; tail -4 /tmp/relight_r4.log

echo "=== queue r6 kickoff done"
