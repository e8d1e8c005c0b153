#!/usr/bin/env python3
"""Join a jax.profiler trace with HLO op_name metadata for per-source-op and
per-module time attribution.

Usage:
    python tools/analyze_trace.py <trace_dir> <hlo.txt> [module_depth] [divisor]

``divisor``: divide all durations by this (e.g. the K of a chained-pass
harness, so numbers read as ms/pass).

The trace dir is what jax.profiler.trace() wrote (contains
plugins/profile/*/ *.trace.json.gz); the HLO text comes from
``fn.lower(*args).compile().as_text()``.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import re
import sys


def load_device_durations(trace_dir: str):
    paths = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise SystemExit(f"no trace files under {trace_dir}")
    data = json.load(gzip.open(paths[-1]))
    events = data["traceEvents"]
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev = {p for p, n in pids.items() if "TPU" in n}
    durs = collections.Counter()
    top = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev:
            if e["name"].startswith("jit_"):
                top = max(top, e.get("dur", 0))
                continue
            durs[e["name"]] += e.get("dur", 0)
    return durs, top


def load_opnames(hlo_path: str):
    hlo = open(hlo_path).read()
    return {
        m.group(1): m.group(2)
        for m in re.finditer(r"%([\w\.\-]+) = [^\n]*?op_name=\"([^\"]+)\"", hlo)
    }


def main():
    trace_dir, hlo_path = sys.argv[1], sys.argv[2]
    depth = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    div = float(sys.argv[4]) if len(sys.argv) > 4 else 1.0

    durs, top = load_device_durations(trace_dir)
    durs = collections.Counter({n: d / div for n, d in durs.items()})
    top = top / div
    opname = load_opnames(hlo_path)

    rollup = collections.Counter()
    for name, d in durs.items():
        op = opname.get(name, name)
        op = re.sub(r"^jit\([^)]*\)/", "", op)
        rollup[op] += d

    print(f"top-level jit: {top/1e3:.1f} ms")
    print("\nTOP 30 source ops (ms):")
    for op, d in rollup.most_common(30):
        print(f"{d/1e3:9.2f}  {op[:100]}")

    mod = collections.Counter()
    for op, d in rollup.items():
        mod["/".join(op.split("/")[:depth])] += d
    print(f"\nBY MODULE (depth {depth}):")
    for op, d in mod.most_common(25):
        print(f"{d/1e3:9.2f}  {op}")


if __name__ == "__main__":
    main()
