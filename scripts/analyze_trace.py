#!/usr/bin/env python
"""Attribute a jax.profiler device trace to model ops via HLO metadata.

Methodology (docs/PERF.md): every leaf device event in the trace is an HLO
instruction name; the optimized HLO text (``jitted.lower(...).compile()
.as_text()`` — ``--xla_dump_to`` does not work against the remote
compiler) carries ``metadata={op_name="jit(train_step)/..."}`` for each
instruction.  Joining the two gives per-model-op device time.  Buckets are
assigned from the op_name (NOT the instruction name: TPU fusions are named
after their root instruction, so a conv fusion whose root is the
bf16->f32 stats convert is called ``convert_reduce_fusion.N`` — bucketing
by instruction name misfiles ~40% of conv time as "dtype convert").

Usage:
  python scripts/analyze_trace.py <trace_dir> <optimized_hlo.txt> <n_steps>

where <trace_dir> holds plugins/profile/*/: produced by
``jax.profiler.trace`` around exactly <n_steps> bench steps.
"""
import glob
import gzip
import json
import re
import sys
from collections import defaultdict


def load_device_events(trace_dir):
    paths = glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz")
    if not paths:
        raise SystemExit(f"no trace under {trace_dir}")
    with gzip.open(paths[0], "rt") as f:
        data = json.load(f)
    ev = data["traceEvents"]
    names = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    device_pids = {p for p, n in names.items() if "TPU" in n}
    out = defaultdict(float)
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        nm = e.get("name", "")
        # container events: whole-program + region scopes
        if nm.startswith("jit_") or re.fullmatch(r"\d+", nm):
            continue
        out[nm] += e.get("dur", 0) / 1e3  # us -> ms
    return out


def load_op_names(hlo_path):
    meta = {}
    pat = re.compile(r"%?([\w\.\-]+) = .*metadata=\{.*?op_name=\"([^\"]+)\"")
    for line in open(hlo_path):
        m = pat.search(line)
        if m:
            meta[m.group(1)] = m.group(2)
    return meta


def bucket(op_name):
    if op_name is None:
        return "unmatched (XLA-internal: reverse/copy-done/...)"
    s = op_name.lower()
    if "conv_general_dilated" in s:
        return "conv fusions (fwd)" if "transpose(" not in s \
            else "conv fusions (bwd)"
    if re.search(r"/dot", s) or "einsum" in s:
        return "matmul"
    return s.rsplit("/", 1)[-1]


def main():
    trace_dir, hlo_path, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
    instr_ms = load_device_events(trace_dir)
    meta = load_op_names(hlo_path)
    buckets = defaultdict(float)
    opname_ms = defaultdict(float)
    total = 0.0
    for nm, ms in instr_ms.items():
        total += ms
        op = meta.get(nm)
        buckets[bucket(op)] += ms
        if op:
            opname_ms[op] += ms
    matched = sum(v for k, v in buckets.items() if not k.startswith("unmatched"))
    print(f"leaf device time: {total / n:.1f} ms/step ({n} steps traced), "
          f"HLO-metadata matched {100 * matched / total:.1f}%")
    for k, v in sorted(buckets.items(), key=lambda kv: -kv[1]):
        if v / total < 0.001:
            continue
        print(f"  {v / n:8.2f} ms/step  {100 * v / total:5.1f}%  {k}")
    print("\ntop 15 op_names:")
    for k, v in sorted(opname_ms.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {v / n:8.2f} ms/step  {k[-100:]}")


if __name__ == "__main__":
    main()
