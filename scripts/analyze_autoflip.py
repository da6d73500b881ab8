"""Harvest an auto-flip (fast_march_start=-1) run's metrics.jsonl.

Prints the window-truncation residual trajectory (sec/window_resid_rel),
the relight-cap curriculum state, and the detected flip iteration (the
refresh where the probe disappears / the cap jumps to full), then one
JSON summary line for BASELINE.md rows.

Usage:
  python scripts/analyze_autoflip.py <log_dir-or-metrics.jsonl> [--every N]
      [--train_log /tmp/run.log]
"""
from __future__ import annotations

import argparse
import json
import os
import re
import sys


def scan_train_log(path):
    """Return the flip iteration printed by the loop, or None.

    Fallback for runs whose flip lands on the FINAL relight refresh (no
    later metrics row exists to witness the probe's disappearance): the
    loop's '[loop] fast-march AUTO flip at iter N' line is authoritative.
    """
    try:
        with open(path) as f:
            for line in f:
                m = re.search(r"fast-march AUTO flip at iter (\d+)", line)
                if m:
                    return int(m.group(1))
    except OSError:
        pass
    return None


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("path", help="run log dir or metrics.jsonl")
    ap.add_argument("--every", type=int, default=1,
                    help="print every Nth refresh row")
    ap.add_argument("--train_log", default=None,
                    help="stdout log of the run (flip-line fallback)")
    args = ap.parse_args(argv)

    path = args.path
    if os.path.isdir(path):
        path = os.path.join(path, "metrics.jsonl")
    rows = []
    with open(path) as f:
        for line in f:
            m = json.loads(line)
            it = m.get("train/iteration", m.get("step"))
            if it is None:
                continue
            rows.append({
                "it": int(it),
                "resid": m.get("train/sec/window_resid_rel"),
                "cap": m.get("train/relight_cap_eff"),
                "psnr": m.get("train/psnr"),
            })

    probe_rows = [r for r in rows if r["resid"] is not None]
    relight_rows = [r for r in rows if r["cap"] is not None]
    # flip = first relight refresh AFTER the last probe reading (the flip
    # rebuild compiles the probe out); cap-jump is the cross-check
    flip_it = None
    flip_src = None
    if probe_rows:
        last_probe = probe_rows[-1]["it"]
        after = [r for r in relight_rows
                 if r["it"] > last_probe and r["resid"] is None]
        if after:
            flip_it, flip_src = after[0]["it"], "metrics"
    if flip_it is None:
        # flip on the final refresh leaves no later cap row — fall back to
        # the loop's printed flip line (authoritative), checking the
        # explicit --train_log first, then train.log beside metrics.jsonl
        candidates = [args.train_log] if args.train_log else []
        candidates.append(os.path.join(os.path.dirname(path), "train.log"))
        for cand in candidates:
            if cand and os.path.exists(cand):
                flip_it = scan_train_log(cand)
                if flip_it is not None:
                    flip_src = "train_log"
                    break

    print(f"{'iter':>7} {'resid':>8} {'cap_eff':>8} {'psnr':>7}")
    for i, r in enumerate(relight_rows):
        if i % args.every and r is not relight_rows[-1]:
            continue
        resid = f"{r['resid']:.4f}" if r["resid"] is not None else "-"
        print(f"{r['it']:>7} {resid:>8} {int(r['cap'] or 0):>8} "
              f"{(r['psnr'] or 0):>7.2f}")

    best = min((r["resid"] for r in probe_rows), default=None)
    summary = {
        "flip_iter": flip_it,
        "flip_source": flip_src,
        "probe_refreshes": len(probe_rows),
        "resid_first": probe_rows[0]["resid"] if probe_rows else None,
        "resid_best": best,
        "resid_last": probe_rows[-1]["resid"] if probe_rows else None,
        "cap_final": relight_rows[-1]["cap"] if relight_rows else None,
        "flipped": flip_it is not None,
    }
    print("SUMMARY:", json.dumps(summary))
    return 0 if summary["flipped"] else 1


if __name__ == "__main__":
    sys.exit(main())
