"""Summarize a jax.profiler trace: per-call device time and top ops.

Usage: python scripts/analyze_trace.py /tmp/trace_dir [--top 40] [--calls 3]

Finds the .trace.json.gz, keeps TPU-device-track complete events, and
reports total device time per benchmark call plus the top ops by summed
duration (with HLO category and a snippet of the long_name so fusions can
be mapped back to source).
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
from collections import defaultdict


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--calls", type=int, default=3,
                    help="number of traced benchmark calls (to divide totals)")
    ap.add_argument("--like", default=None,
                    help="only show ops whose name matches this regex")
    args = ap.parse_args()

    paths = glob.glob(os.path.join(args.trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace under {args.trace_dir}"
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]

    # map pid/tid -> track name; device tracks look like "/device:TPU:0" or
    # contain "TPU" / "XLA Op" in the thread name
    proc_names = {}
    thread_names = {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                proc_names[e["pid"]] = e["args"].get("name", "")
            elif e.get("name") == "thread_name":
                thread_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

    device_pids = {p for p, n in proc_names.items()
                   if "TPU" in n or "/device" in n.lower() or "Device" in n}

    ops = defaultdict(lambda: [0.0, 0, "", ""])  # name -> [dur, count, cat, long]
    total = 0.0
    tmin, tmax = float("inf"), 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        tname = thread_names.get((e["pid"], e.get("tid")), "")
        # skip derived "Steps"/"XLA Modules" rollup tracks; keep op tracks
        if "step" in tname.lower() or "module" in tname.lower():
            continue
        dur = float(e.get("dur", 0))
        a = e.get("args", {}) or {}
        cat = a.get("hlo_category", "")
        long = a.get("long_name", a.get("hlo_op", ""))
        rec = ops[e["name"]]
        rec[0] += dur
        rec[1] += 1
        rec[2] = cat
        rec[3] = str(long)[:160]
        total += dur
        tmin = min(tmin, e["ts"])
        tmax = max(tmax, e["ts"] + dur)

    n = args.calls
    print(f"trace: {path}")
    print(f"device op time total: {total/1e3:.2f} ms over span {(tmax-tmin)/1e3:.2f} ms"
          f" -> {total/1e3/n:.2f} ms/call (calls={n})")

    by_cat = defaultdict(float)
    for name, (dur, cnt, cat, _) in ops.items():
        by_cat[cat or "?"] += dur
    print("\nby hlo_category (ms/call):")
    for cat, dur in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {dur/1e3/n:8.2f}  {cat}")

    print(f"\ntop {args.top} ops (ms/call, count/call):")
    items = sorted(ops.items(), key=lambda kv: -kv[1][0])
    shown = 0
    for name, (dur, cnt, cat, long) in items:
        if args.like and not re.search(args.like, name):
            continue
        print(f"  {dur/1e3/n:8.3f} x{cnt//n:<5} [{cat:<12.12}] {name[:60]}")
        if long and long != name:
            print(f"           {long[:150]}")
        shown += 1
        if shown >= args.top:
            break


if __name__ == "__main__":
    main()
