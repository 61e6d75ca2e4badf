#!/usr/bin/env python
"""Capture an XLA trace of the benchmark workload and attribute device time.

Per-op trace attribution for the TPU kernels (SURVEY.md §5.1 says the
reference has no profiler at all; this is the --profile flag's offline
companion). Runs the same eval/train workload as bench.py for a few steps
under jax.profiler.trace, parses the resulting .xplane.pb with
jax.profiler.ProfileData, and prints device-time buckets:

  python tools/profile_bench.py                 # eval workload
  BENCH_MODE=train python tools/profile_bench.py
  python tools/profile_bench.py --trace-dir /tmp/t --top 40

Buckets group XLA ops by their mnemonic prefix (fusion, copy, convert,
dot, reduce, ...), which is how relayout/copy overhead was found and
removed (BASELINE.md kernel log).
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _device_planes(pd):
    for plane in pd.planes:
        # TPU device planes: "/device:TPU:0 ..." ; CPU backend: "/host:CPU"
        if plane.name.startswith("/device:"):
            yield plane


# container ops span their whole body (their duration double-counts every
# nested op) — excluded from totals
_CONTAINER_RX = re.compile(r"^%?(while|conditional|call)\b|^%?(while|conditional|call)\.")

_CATEGORY_RULES = (
    # async copy/slice-start/done spans overlap compute; duration =
    # start->done wait, so report separately rather than as real copy cost
    # (the train profile once showed a phantom 49% "copy" bucket that was
    # 68k slice-start WAIT spans — the sync copies were ~12%)
    ("async-copy (span)", re.compile(r"^%?(copy|slice|collective-permute)-"
                                     r"(start|done)", re.I)),
    ("pallas", re.compile(r"pallas|custom-call|tpu_custom_call|mosaic", re.I)),
    ("matmul (dot/conv)", re.compile(r"^%?(dot|convolution|conv)\b", re.I)),
    ("copy/relayout", re.compile(r"^%?(copy|transpose|bitcast|reshape|slice|"
                                 r"dynamic-slice|dynamic-update-slice|concatenate|pad|gather|scatter)", re.I)),
    ("convert/reduce", re.compile(r"^%?(convert|reduce|all-reduce)", re.I)),
    ("elementwise", re.compile(r"^%?(add|multiply|subtract|divide|exponential|"
                               r"tanh|maximum|minimum|select|compare|rsqrt|power)", re.I)),
    ("infeed/outfeed", re.compile(r"infeed|outfeed|host", re.I)),
)


# opcode = the call token on the RHS, e.g. "copy-start(", "custom-call(",
# "fusion(". Lowercase-only so shape/layout tokens like T(8,128) / S(1)
# never match; operand names can't match (they are preceded by '%').
_OPCODE_RX = re.compile(r"(?:^|[\s)\}\]])([a-z][a-z0-9_-]*)\(")


def _categorize(name: str) -> str:
    # XLA event names look like "%fusion.123 = ...", "%copy.4", "%dot.17",
    # "%attn.217 = ... custom-call(...)", "loop_fusion" etc. Categorize on
    # the DEFINING name + opcode only: matching the whole string let
    # operand names hijack the bucket (a %copy-start whose operand is
    # %convert_reduce_fusion.N took the fusion branch and its overlapped
    # DMA wait span polluted copy/relayout — found round 3).
    lhs = name.lstrip("%").split(" ")[0]
    rhs = name.split(" = ", 1)[1] if " = " in name else name
    m = _OPCODE_RX.search(rhs)
    head = lhs + " " + (m.group(1) if m else "")
    base = lhs.split(".")[0]
    if base == "fusion" or base.endswith("_fusion"):
        # convert_reduce_fusion etc. keep their own bucket below if matched
        for cat, rx in _CATEGORY_RULES[2:]:
            if rx.search(lhs):
                return cat
        return "fusion"
    for cat, rx in _CATEGORY_RULES:
        if rx.search(head):
            return cat
    return "other"


def summarize(trace_dir: str, top: int = 25):
    from jax.profiler import ProfileData

    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        raise SystemExit(f"no .xplane.pb under {trace_dir}")
    pd = ProfileData.from_file(paths[-1])

    per_op = collections.Counter()
    per_cat = collections.Counter()
    n_events = 0
    for plane in _device_planes(pd):
        for line in plane.lines:
            if "XLA Ops" not in line.name and "Ops" != line.name.strip():
                continue
            for ev in line.events:
                if _CONTAINER_RX.match(ev.name):
                    continue
                per_op[ev.name] += ev.duration_ns
                per_cat[_categorize(ev.name)] += ev.duration_ns
                n_events += 1
    if not per_op:
        # fall back: take every device-plane line (some backends label
        # the op line differently)
        for plane in _device_planes(pd):
            for line in plane.lines:
                for ev in line.events:
                    per_op[ev.name] += ev.duration_ns
                    per_cat[_categorize(ev.name)] += ev.duration_ns
                    n_events += 1
    total = sum(per_cat.values()) or 1
    print(f"\n== device time by category ({n_events} events, "
          f"{total / 1e6:.2f} ms total) ==")
    for cat, ns in per_cat.most_common():
        print(f"  {cat:<22} {ns / 1e6:9.2f} ms  {100 * ns / total:5.1f}%")
    print(f"\n== top {top} ops ==")
    for name, ns in per_op.most_common(top):
        print(f"  {name[:70]:<70} {ns / 1e6:8.2f} ms  {100 * ns / total:5.1f}%")
    return per_cat, per_op


def run_workload(trace_dir: str):
    """Run bench.py's workload for a few steps under the profiler."""
    os.environ.setdefault("BENCH_ITERS", "4")
    import jax

    import bench

    with jax.profiler.trace(trace_dir):
        bench.main()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default=None,
                    help="existing trace dir to summarize (skips running)")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--json-out", default=None,
                    help="also dump {category: ns} json")
    args = ap.parse_args()

    trace_dir = args.trace_dir
    ran = False
    if trace_dir is None or not glob.glob(
            os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True):
        trace_dir = trace_dir or tempfile.mkdtemp(prefix="clover_trace_")
        print(f"capturing trace into {trace_dir} ...", file=sys.stderr)
        run_workload(trace_dir)
        ran = True
    per_cat, per_op = summarize(trace_dir, args.top)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"categories": dict(per_cat),
                       "top_ops": dict(per_op.most_common(100))}, f, indent=2)
    if ran:
        print(f"\ntrace kept at {trace_dir}", file=sys.stderr)


if __name__ == "__main__":
    main()
