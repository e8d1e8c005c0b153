#!/usr/bin/env python3
"""Per-module perf budget of the benched serving program: measured ms vs
HBM-bytes floor vs MXU-FLOP floor, from the optimized HLO + device trace.

The round-3 verdict's demand: no kernel work without a budget that says
where the bytes/FLOPs actually are.  This tool computes, for every
device-executed HLO op of the EXACT chained program bench.py measures
(tools/trace_chained.py writes its hlo.txt + profiler trace):

  bytes  = sum of operand + output buffer sizes (fusion internals never
           touch HBM, so operands+outputs IS the op's HBM traffic; an
           aliased in-place output is counted on both sides, matching what
           the memory system actually moves)
  flops  = 2 * MACs for convolution/dot ops (the MXU work; elementwise VPU
           flops are never the bound on this program and are ignored)

and rolls both up by named-scope module next to the trace's measured ms:

  floor_ms = max(bytes / HBM_BW, flops / MXU_RATE)

HBM_BW / MXU_RATE defaults are the v5e's practical numbers (819 GB/s
measured stream bandwidth, 197 bf16 TFLOP/s peak); override via env
UMT_HBM_GBPS / UMT_MXU_TFLOPS.

Usage:
    python tools/perf_budget.py <trace_dir> [k] [module_depth]

where <trace_dir> is tools/trace_chained.py's outdir (holds hlo.txt and the
profiler dump) and k the chained-pass count (default 3).
"""

from __future__ import annotations

import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from analyze_trace import load_device_durations  # noqa: E402

_DT_BYTES = {
    "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
    "pred": 1, "s64": 8, "u64": 8, "f64": 8, "s16": 2, "u16": 2,
}

_DEF_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w\.\-]+)\s*=\s*(.*?[\]})])\s+([a-z][\w\-]*)\((.*)$")
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
_OPND_RE = re.compile(r"%([\w\.\-]+)")
_OPNAME_RE = re.compile(r'op_name="([^"]+)"')
_DIMS_RE = re.compile(r"dim_labels=(\S+?)->")

# ops that are control / scheduling artifacts, not HBM work
_SKIP_KINDS = {"while", "call", "conditional", "parameter", "constant",
               "get-tuple-element", "tuple", "after-all", "bitcast",
               "copy-start", "slice-start", "all-reduce-start"}


def _shape_bytes(type_str: str) -> int:
    total = 0
    for m in _SHAPE_RE.finditer(type_str):
        dt, dims = m.group(1), m.group(2)
        if dt not in _DT_BYTES:
            continue
        n = 1
        for d in filter(None, dims.split(",")):
            n *= int(d)
        total += n * _DT_BYTES[dt]
    return total


_COMP_RE = re.compile(r"^%?([\w\.\-]+)\s*\([^)]*\)\s*->")


def _parse_hlo(hlo_path: str):
    """All def lines anywhere in the module (HLO names are module-unique):
    name -> dict(bytes_out, opnds, kind, line, op_name); name -> first shape
    dims; computation name -> member op names (for fusion-internal flops)."""
    ops, shapes, comps = {}, {}, {}
    cur = None
    for line in open(hlo_path):
        s = line.strip()
        if s == "}" or s.startswith("ENTRY"):
            cur = None  # computation body closed / ENTRY ops aren't members
            continue
        cm = _COMP_RE.match(s)
        if cm and "=" not in line.split("(")[0]:
            cur = cm.group(1)
            comps[cur] = []
            continue
        if "=" not in line:
            continue
        m = _DEF_RE.match(line)
        if not m:
            continue
        name, type_str, kind, rest = m.groups()
        out_b = _shape_bytes(type_str)
        sm = _SHAPE_RE.search(type_str)
        if sm:
            shapes[name] = tuple(
                int(d) for d in filter(None, sm.group(2).split(",")))
        opnds = _OPND_RE.findall(rest.split("op_name=")[0].split("calls=")[0])
        onm = _OPNAME_RE.search(rest)
        cl = re.search(r"calls=%([\w\.\-]+)", rest)
        ops[name] = dict(bytes_out=out_b, opnds=opnds, kind=kind, line=rest,
                         op_name=onm.group(1) if onm else name,
                         calls=cl.group(1) if cl else None)
        if cur is not None:
            comps[cur].append(name)
    return ops, shapes, comps


def _flops_for(name, op, shapes):
    kind, line = op["kind"], op["line"]
    oshape = shapes.get(name)
    if not oshape:
        return 0.0
    out_elems = 1
    for d in oshape:
        out_elems *= d
    if kind in ("convolution", "convolution-base-dilated"):
        if "rhs_reversal" in line or "lhs_dilate" in line:
            # einsum-as-conv / transposed-conv forms: the generic
            # out*kernel formula miscounts their contraction; they're all
            # tiny reductions (attention context, resize algebra) — skip
            return 0.0
        opnds = op["opnds"]
        if len(opnds) < 2 or opnds[1] not in shapes:
            return 0.0
        kshape = shapes[opnds[1]]
        dm = _DIMS_RE.search(line)
        if dm and len(kshape) == len(oshape):
            lbl = dm.group(1).split("_")[1]  # kernel labels e.g. 01io
            k = 1
            for ch, d in zip(lbl, kshape):
                if ch != "o":
                    k *= d  # spatial dims and input-feature dim
            bg = re.search(r"batch_group_count=(\d+)", line)
            if bg:
                # grouped-batch einsum-as-conv: the kernel 'i' dim spans all
                # groups; contraction per output element is i/groups
                k //= max(int(bg.group(1)), 1)
            return 2.0 * out_elems * k
        return 0.0
    if kind == "dot":
        opnds = op["opnds"]
        if not opnds or opnds[0] not in shapes:
            return 0.0
        lhs = shapes[opnds[0]]
        lm = re.search(r"lhs_contracting_dims=\{([\d,]+)\}", line)
        if not lm:
            return 0.0
        k = 1
        for d in lm.group(1).split(","):
            k *= lhs[int(d)]
        return 2.0 * out_elems * k
    return 0.0


def main():
    trace_dir = sys.argv[1]
    k = float(sys.argv[2]) if len(sys.argv) > 2 else 3.0
    depth = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    hbm = float(os.environ.get("UMT_HBM_GBPS", 819)) * 1e9
    mxu = float(os.environ.get("UMT_MXU_TFLOPS", 197)) * 1e12

    hlo_path = os.path.join(trace_dir, "hlo.txt")
    ops, shapes, comps = _parse_hlo(hlo_path)
    durs, _ = load_device_durations(trace_dir)

    def op_flops(tname, op):
        f = _flops_for(tname, op, shapes)
        if op["kind"] == "fusion" and op["calls"] in comps:
            for member in comps[op["calls"]]:
                f += _flops_for(member, ops[member], shapes)
        return f

    per_mod = collections.defaultdict(lambda: [0.0, 0.0, 0.0])  # ms, GB, GF
    per_op = []
    unmatched_ms = 0.0
    for tname, dur in durs.items():
        ms = dur / k / 1e3
        op = ops.get(tname)
        if op is None or op["kind"] in _SKIP_KINDS:
            if op is None and ms > 0.02:
                unmatched_ms += ms
            continue
        b = op["bytes_out"] + sum(
            ops[o]["bytes_out"] for o in op["opnds"] if o in ops)
        if ms < 0.05:
            # slice / dynamic-update-slice / bitcast fusions that XLA
            # aliases in place: they report GB-sized operands but measure
            # ~0 — they move (almost) nothing, so they contribute no
            # bytes to the floor either
            b = 0
        f = op_flops(tname, op)
        onm = re.sub(r"^jit\([^)]*\)/", "", op["op_name"])
        onm = re.sub(r"while/body/closed_call/", "", onm)
        mod = "/".join(onm.split("/")[:depth]) or onm
        per_mod[mod][0] += ms
        per_mod[mod][1] += b / 1e9
        per_mod[mod][2] += f / 1e9
        per_op.append((ms, b / 1e9, f / 1e9, onm, tname))

    print(f"{'module':<22}{'meas ms':>9}{'GB':>8}{'bw ms':>8}"
          f"{'GFLOP':>9}{'mxu ms':>8}{'floor':>8}{'gap':>7}")
    tot = [0.0, 0.0, 0.0, 0.0]
    rows = sorted(per_mod.items(), key=lambda kv: -kv[1][0])
    for mod, (ms, gb, gf) in rows:
        bw_ms = gb * 1e9 / hbm * 1e3
        mx_ms = gf * 1e9 / mxu * 1e3
        fl = max(bw_ms, mx_ms)
        tot[0] += ms
        tot[1] += gb
        tot[2] += gf
        tot[3] += fl
        if ms < 0.05 and gb < 0.05:
            continue
        print(f"{mod[:21]:<22}{ms:9.2f}{gb:8.2f}{bw_ms:8.2f}"
              f"{gf:9.1f}{mx_ms:8.2f}{fl:8.2f}{ms - fl:7.2f}")
    bw_ms = tot[1] * 1e9 / hbm * 1e3
    mx_ms = tot[2] * 1e9 / mxu * 1e3
    print(f"{'TOTAL':<22}{tot[0]:9.2f}{tot[1]:8.2f}{bw_ms:8.2f}"
          f"{tot[2]:9.1f}{mx_ms:8.2f}{tot[3]:8.2f}{tot[0]-tot[3]:7.2f}")
    if unmatched_ms > 0.1:
        print(f"(+{unmatched_ms:.2f} ms of traced ops with no HLO def match)")
    print(f"\nfloor = per-module max(bw, mxu).  The floor TOTAL "
          f"({tot[3]:.2f} ms) is the ceiling for THIS op graph; fusing ops "
          f"lowers the graph's bytes and with it the floor itself.")

    print("\nTOP 30 ops by measured ms:")
    per_op.sort(key=lambda r: -r[0])
    for ms, gb, gf, onm, tname in per_op[:30]:
        bw_ms = gb * 1e9 / hbm * 1e3
        mx_ms = gf * 1e9 / mxu * 1e3
        print(f"{ms:7.2f} ms  bw{bw_ms:6.2f}  mxu{mx_ms:6.2f}  "
              f"{onm[:70]}  [{tname[:36]}]")


if __name__ == "__main__":
    main()
