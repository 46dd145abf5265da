#!/usr/bin/env python
"""Summarize a jax.profiler device trace by op: total device-time per
fusion/op name, grouped, sorted. The round-4/5 roofline audits
(README "Per-op roofline audit", train-step audit) are produced with this.

Usage:
  python bench.py --train --iters 20 --profile /tmp/trace_train
  python tools/trace_summary.py /tmp/trace_train [--top 40] [--iters 20]

With --iters the per-group totals are divided into per-step ms.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re


def load_trace_events(root: str) -> list:
    paths = glob.glob(
        os.path.join(root, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {root}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    return data["traceEvents"]


def device_pids(events) -> set:
    """TensorCore device lanes (exclude host threads and derived lanes
    like '#program' steps)."""
    pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if "TPU" in name or "/device:" in name or "Chip" in name:
                pids.add(e["pid"])
    return pids


_STRIP = re.compile(r"\.\d+$")


def group_name(name: str) -> str:
    """Collapse numbered instances (fusion.123 -> fusion) but keep the
    descriptive op class embedded by XLA (e.g. 'fusion.123' carries no
    class — fall back to long-name args when present)."""
    return _STRIP.sub("", name)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("root")
    parser.add_argument("--top", type=int, default=40)
    parser.add_argument("--iters", type=int, default=None,
                        help="divide totals by N steps for per-step ms")
    parser.add_argument("--by-instance", action="store_true",
                        help="do not collapse numbered op instances")
    args = parser.parse_args()

    events = load_trace_events(args.root)
    pids = device_pids(events)
    durs = collections.Counter()
    counts = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or (pids and e.get("pid") not in pids):
            continue
        # skip derived summary lanes
        if e.get("name", "").startswith(("Steps", "XLA Modules")):
            continue
        name = e["name"] if args.by_instance else group_name(e["name"])
        d = float(e.get("dur", 0.0))  # microseconds
        durs[name] += d
        counts[name] += 1
        total += d

    scale = 1e3 * (args.iters or 1)  # us -> ms, per step
    print(f"{'op group':58s} {'ms':>9s} {'%':>6s} {'n':>6s}")
    for name, d in durs.most_common(args.top):
        print(f"{name[:58]:58s} {d / scale:9.3f} {d / total * 100:6.1f} "
              f"{counts[name]:6d}")
    print(f"{'TOTAL device time':58s} {total / scale:9.3f}")


if __name__ == "__main__":
    main()
