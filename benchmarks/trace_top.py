"""Rank device time by HLO op from a ``jax.profiler.trace`` directory.

The axon relay's profiler emits chrome-trace ``*.trace.json.gz`` files with
per-HLO-op device durations (and layouts in the ``long_name`` arg); the
tensorboard converter is broken in this image, so this parses the JSON
directly — the round-2 layout-copy findings were made this way.

Usage:
    python benchmarks/trace_top.py /tmp/prof [--top 30] [--group-prefix]
"""
import argparse
import collections
import glob
import gzip
import json
import os


def load_events(trace_dir):
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", data if isinstance(data, list) else [])
    # name the (pid, tid) tracks from metadata events
    procs, threads = {}, {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                procs[e["pid"]] = e["args"].get("name", "")
            elif e.get("name") == "thread_name":
                threads[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    return events, procs, threads


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--group-prefix", action="store_true",
                    help="group op names by their prefix before the first "
                         "'.' (fusion families)")
    ap.add_argument("--like", default=None,
                    help="only ops whose name contains this substring "
                         "(prints each with its long_name)")
    args = ap.parse_args()

    events, procs, threads = load_events(args.trace_dir)
    device_pids = {pid for pid, n in procs.items()
                   if "TPU" in n or "/device" in n.lower()}

    totals = collections.Counter()
    counts = collections.Counter()
    long_names = {}
    total_dev_us = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pid = e.get("pid")
        if device_pids and pid not in device_pids:
            continue
        tname = threads.get((pid, e.get("tid")), "")
        if "step" in tname.lower():  # step-markers double-count op time
            continue
        name = e["name"]
        if args.like and args.like not in name:
            continue
        key = name.split(".")[0] if args.group_prefix else name
        totals[key] += e["dur"]
        counts[key] += 1
        ln = (e.get("args") or {}).get("long_name")
        if ln and key not in long_names:
            long_names[key] = ln
        total_dev_us += e["dur"]

    print(f"tracks: { {pid: procs.get(pid) for pid in device_pids} }")
    print(f"total device-op time: {total_dev_us / 1e3:.1f} ms")
    for name, us in totals.most_common(args.top):
        line = (f"{us / 1e3:9.2f} ms  x{counts[name]:<4} "
                f"{us / max(total_dev_us, 1) * 100:5.1f}%  {name}")
        if args.like and name in long_names:
            line += f"\n            {long_names[name][:240]}"
        print(line)


if __name__ == "__main__":
    main()
