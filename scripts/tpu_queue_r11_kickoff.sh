#!/bin/bash
# Round-5 kickoff queue — launch FIRST THING in round 5:
#   PYTHONPATH=/root/repo:$PYTHONPATH QUEUE_SECONDS=39600 \
#     nohup bash scripts/tpu_queue_r11_kickoff.sh > /tmp/tpu_queue_r11.log 2>&1 &
# Context (BASELINE.md r4):
#   - acap12/pf44 ADOPTED (gate passed). bench.py already reflects it.
#   - multilight collapse mechanism settled (relight pressure on soft
#     density); relight_cap_start curriculum is the fix; r10's demo-scale
#     arms (B1/D/C) are the round-4 results to build on — check
#     /tmp/tpu_queue_r10.log harvests or BASELINE.md before rerunning.
#   - [1] anchored 20k flagship (VERDICT r3 #4) with periodic ckpts;
#     resumable via --resume log/synthetic_demo_r5_20k/ckpt_NNN.npz if a
#     reset kills it.
#   - [2] relight refresh on the 20k ckpt (VERDICT r3 #4 second half).
#   - [3]+[4] protocol-cost A/B at matched cap 1024 (VERDICT r3 #5).
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
export TENSOIR_STOP_FILE=/tmp/stop_train
rm -f /tmp/stop_train
T0=$(date +%s)
HARD_STOP=$(( T0 + ${QUEUE_SECONDS:-39600} ))
SOFT_STOP=$(( HARD_STOP - 900 ))

( while [ "$(date +%s)" -lt "$HARD_STOP" ]; do
    [ -f /tmp/stop_queue ] && break
    sleep 20
  done
  touch /tmp/stop_train ) &
WATCHDOG=$!

gate () {
  if [ -f /tmp/stop_queue ] || [ -f /tmp/stop_train ] \
     || [ "$(date +%s)" -ge "$SOFT_STOP" ]; then
    echo "=== deadline/stop before: $1 — skipping rest"
    kill "$WATCHDOG" 2>/dev/null
    echo "=== queue r11 done"
    exit 0
  fi
}

RESUME=""
# r4 left a head-start run in this dir, ended via its per-run STOP file —
# remove the stale STOP or the resumed loop stops at its first refresh
rm -f ./log/synthetic_demo_r5_20k/STOP
LAST=$(ls -t ./log/synthetic_demo_r5_20k/ckpt_*.npz 2>/dev/null | head -1)
[ -n "$LAST" ] && RESUME="--resume $LAST" && echo "resuming 20k from $LAST"

gate "20k anchored flagship"
echo "=== [1/4] 20k anchored flagship (phase_anchor 5000, adopted caps)"
python examples/train_synthetic_demo.py --iters 20000 --phase_anchor 5000 \
  --bake_reso 128 --relight_cap 4096 --window 48 --window_back 16 \
  --compact 0.5625 --prepass 12 --dilate 3 --app_bake 64 \
  --app_cap_secondary 12 --pair_frac 0.4375 \
  --sec_stats 1 --save_iters 4000 $RESUME \
  --out ./log/synthetic_demo_r5_20k > /tmp/demo_20k_r5.log 2>&1
echo "exit: $?"; tail -12 /tmp/demo_20k_r5.log

gate "relight refresh"
echo "=== [2/4] relight refresh on the 20k ckpt"
CKPT=$(ls -t ./log/synthetic_demo_r5_20k/ckpt_final.npz 2>/dev/null | head -1)
[ -z "$CKPT" ] && CKPT=$(ls -t ./log/synthetic_demo_r5_20k/ckpt_*.npz \
  2>/dev/null | head -1)
echo "ckpt: $CKPT"
python examples/relight_demo.py --ckpt "$CKPT" \
  --out ./log/relight_r5_20k > /tmp/relight_r5.log 2>&1
echo "exit: $?"; tail -4 /tmp/relight_r5.log

gate "protocol A/B fast arm"
echo "=== [3/4] protocol A/B: FAST-trained arm (canonical knobs, cap 1024)"
python examples/train_synthetic_demo.py --iters 5000 \
  --bake_reso 128 --relight_cap 1024 --window 48 --window_back 16 \
  --compact 0.5625 --prepass 12 --dilate 3 --app_bake 64 --sec_stats 1 \
  --out ./log/proto_ab_fast > /tmp/proto_ab_fast.log 2>&1
echo "exit: $?"; tail -6 /tmp/proto_ab_fast.log

gate "protocol A/B exact arm"
echo "=== [4/4] protocol A/B: EXACT-trained arm (no lossy knobs, cap 1024)"
python examples/train_synthetic_demo.py --iters 5000 \
  --relight_cap 1024 --window 0 --window_back 0 --compact 0 \
  --app_bake 0 --sec_stats 1 \
  --out ./log/proto_ab_exact > /tmp/proto_ab_exact.log 2>&1
echo "exit: $?"; tail -6 /tmp/proto_ab_exact.log

kill "$WATCHDOG" 2>/dev/null
echo "=== queue r11 done"
