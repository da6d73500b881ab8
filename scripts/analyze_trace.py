"""Aggregate an XProf chrome trace into a per-kernel time table.

Input: a directory written by `scripts/trace_step.py` (jax.profiler trace,
`plugins/profile/<ts>/*.trace.json.gz`) or the .json.gz file itself.
Output: top-K kernels by total self time on the DEVICE tracks (process
names containing 'TPU' — falls back to all non-host tracks, then to
everything, for CPU smoke traces), plus a grouped view that collapses
XLA fusion-name noise (fusion.123 -> fusion) and buckets by the HLO op
class so gather/scatter/fusion/copy shares are readable at a glance.

  python scripts/analyze_trace.py log/trace_r3 [topk]
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys


def find_trace(path: str) -> str:
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(os.path.join(
        path, "plugins", "profile", "*", "*.trace.json.gz")))
    if not hits:
        raise SystemExit(f"no trace.json.gz under {path}")
    return hits[-1]


def base_name(name: str) -> str:
    # fusion.1234 -> fusion ; dynamic-update-slice.5 -> dynamic-update-slice
    return re.sub(r"\.\d+$", "", name)


def main():
    path = find_trace(sys.argv[1])
    topk = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    d = json.load(gzip.open(path, "rt"))
    ev = d.get("traceEvents", [])

    proc_names = {e["pid"]: e["args"].get("name", "")
                  for e in ev if e.get("ph") == "M"
                  and e.get("name") == "process_name"}
    thread_names = {(e["pid"], e.get("tid")): e["args"].get("name", "")
                    for e in ev if e.get("ph") == "M"
                    and e.get("name") == "thread_name"}
    device_pids = {p for p, n in proc_names.items() if "TPU" in n.upper()}
    if not device_pids:
        device_pids = {p for p, n in proc_names.items()
                       if "host" not in n.lower()}
    if not device_pids:
        device_pids = set(proc_names)

    # XProf device pids carry "XLA Modules" / "Steps" container tracks
    # alongside "XLA Ops" — summing all of them double-counts every kernel
    # (a 30 ms step shows up once as the module event and again as its
    # ops). Restrict to the op-level threads when they exist.
    op_tids = {(p, t) for (p, t), n in thread_names.items()
               if p in device_pids and "XLA Ops" in n}

    # Even within one ops thread, container HLOs (while/fusion bodies,
    # jit_* module events) NEST their children as overlapping X events —
    # raw dur sums double-count. Attribute SELF time: per (pid, tid),
    # sweep events by start time with a stack and subtract each child's
    # duration from its enclosing parent.
    per_track = collections.defaultdict(list)
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        if op_tids and (e.get("pid"), e.get("tid")) not in op_tids:
            continue
        name = e.get("name", "")
        if name.startswith("$"):   # python host frames
            continue
        per_track[(e.get("pid"), e.get("tid"))].append(e)

    total = collections.Counter()
    count = collections.Counter()
    for track in per_track.values():
        track.sort(key=lambda e: (e["ts"], -e.get("dur", 0.0)))
        stack = []  # (end_ts, name, self_dur_accum_index)
        selfs = []
        for e in track:
            ts, dur = e["ts"], e.get("dur", 0.0)
            while stack and stack[-1][0] <= ts + 1e-9:
                end, nm, sd = stack.pop()
                selfs.append((nm, sd))
            if stack:
                end, nm, sd = stack[-1]
                stack[-1] = (end, nm, sd - dur)  # child steals parent time
            stack.append((ts + dur, e.get("name", ""), dur))
        while stack:
            _, nm, sd = stack.pop()
            selfs.append((nm, sd))
        for nm, sd in selfs:
            total[base_name(nm)] += max(sd, 0.0)
            count[base_name(nm)] += 1

    grand = sum(total.values())
    print(f"trace: {path}")
    print(f"device tracks: {[proc_names[p] for p in sorted(device_pids)][:4]}")
    print(f"total device-track time: {grand/1e3:.1f} ms (all events)\n")
    print(f"{'kernel':<58}{'ms':>9}{'n':>7}{'%':>7}")
    for name, us in total.most_common(topk):
        print(f"{name[:57]:<58}{us/1e3:>9.2f}{count[name]:>7}"
              f"{100*us/grand:>6.1f}%")

    klass = collections.Counter()
    for name, us in total.items():
        klass[name.split(".")[0].split(" ")[0]] += us
    print("\nby op class:")
    for name, us in klass.most_common(12):
        print(f"  {name[:40]:<42}{us/1e3:>9.2f} ms  {100*us/grand:>5.1f}%")


if __name__ == "__main__":
    main()
