#!/usr/bin/env python
"""Aggregate an XLA trace by op-family + shape signature.

Finer companion to tools/profile_bench.py: groups device events by the op
name with trailing `.NNN` indices stripped plus the leading result-shape
token, so 50 `%fusion.15646 = (f32[512], bf16[200704,512]...` instances and
their siblings collapse into one row. This is the view that answers "which
GEMM/kernel family is the time going to" rather than "how much fusion
overall".

  python tools/trace_groups.py /tmp/trace_b16 --top 40
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.profile_bench import (_CONTAINER_RX, _categorize,  # noqa: E402
                                 _device_planes)

_IDX_RX = re.compile(r"\.\d+")
_SHAPE_RX = re.compile(r"=\s*\(?([a-z0-9]+\[[0-9,]*\])")


def group_key(name: str) -> str:
    base = name.lstrip("%").split(" ")[0]
    base = _IDX_RX.sub("", base)
    m = _SHAPE_RX.search(name)
    shape = m.group(1) if m else "?"
    return f"{base:<28} {shape}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--cat", default=None,
                    help="only ops whose profile_bench category matches")
    args = ap.parse_args()

    from jax.profiler import ProfileData
    paths = sorted(glob.glob(os.path.join(args.trace_dir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        raise SystemExit(f"no .xplane.pb under {args.trace_dir}")
    pd = ProfileData.from_file(paths[-1])

    per_group = collections.Counter()
    group_count = collections.Counter()
    total = 0
    for plane in _device_planes(pd):
        for line in plane.lines:
            if "XLA Ops" not in line.name and line.name.strip() != "Ops":
                continue
            for ev in line.events:
                if _CONTAINER_RX.match(ev.name):
                    continue
                cat = _categorize(ev.name)
                if cat == "async-copy (span)":
                    continue          # overlapped DMA wait spans, not compute
                total += ev.duration_ns
                if args.cat and args.cat not in cat:
                    continue
                k = f"[{cat[:12]:<12}] {group_key(ev.name)}"
                per_group[k] += ev.duration_ns
                group_count[k] += 1
    print(f"total real device time {total / 1e6:.2f} ms "
          f"(async wait spans excluded)")
    for k, ns in per_group.most_common(args.top):
        print(f"  {k[:100]:<100} {ns / 1e6:9.2f} ms {100 * ns / total:5.1f}% "
              f" x{group_count[k]}")


if __name__ == "__main__":
    main()
