#!/usr/bin/env python
"""Per-region HBM-byte attribution from an optimized HLO dump (VERDICT r4
item 8 — the byte analogue of ``tools/trace_groups.py --hlo``).

The 8-frame eval step is HBM-bound (docs/SOL_EVAL.md: 32.3 GB/step at
819 GB/s is the binding 39.4 ms floor), so the actionable attribution is
*bytes*, not time. This walks the ENTRY computation (plus while-loop
bodies, for scan programs) of an optimized HLO text
(tools/dump_eval_hlo.py / BENCH_DUMP_HLO) and charges every top-level
instruction its fusion-boundary traffic — operand reads + output writes,
the same convention as XLA's cost-analysis ``bytes accessed`` — then
groups by the trace_groups region rules and by instruction family.

Static-analysis caveats: small operands that stay VMEM-resident are still
counted (over-counts by a few %%); get-tuple-element/bitcast/tuple are
free; a value read by k consumers is charged 1 write + k reads.

  python tools/hbm_bytes.py /tmp/eval.hlo --top 25
"""

from __future__ import annotations

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.trace_groups import (  # noqa: E402
    _HLO_COMP_RX,
    _HLO_INSTR_RX,
    _HLO_META_OP,
    _HLO_META_SRC,
    parse_hlo_instrs,
    region_of,
)

_DTYPE_BYTES = {"pred": 1, "s8": 1, "u8": 1, "bf16": 2, "f16": 2, "s16": 2,
                "u16": 2, "f32": 4, "s32": 4, "u32": 4, "f64": 8, "s64": 8,
                "u64": 8}
_SHAPE_RX = re.compile(r"(\w+)\[([0-9,]*)\](\{[^}]*\})?")
_FREE_OPS = {"get-tuple-element", "bitcast", "tuple", "parameter",
             "constant", "after-all", "partition-id", "replica-id"}
_OPERAND_RX = re.compile(r"%[\w.\-]+")


def type_bytes(type_str: str) -> int:
    """Bytes of a (possibly tuple) HLO result type string. Shapes whose
    layout pins them to scoped memory (``S(1)`` = VMEM) are free — they
    never cross HBM (e.g. ConcatBitcast staging of sliced prefetches)."""
    total = 0
    for dt, dims, layout in _SHAPE_RX.findall(type_str):
        if dt not in _DTYPE_BYTES or "S(1)" in layout:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def parse_entry(path: str):
    """Yield (name, opcode, result_bytes, operand_names, src, opn) for every
    instruction in ENTRY and in while-loop body/condition computations
    (scan programs schedule the step inside a while body)."""
    # pass 1: find computations reachable as while bodies/conditions
    while_comps = set()
    with open(path) as f:
        text = f.read()
    for m in re.finditer(r"while\(.*?\), condition=(%[\w.\-]+), "
                         r"body=(%[\w.\-]+)", text):
        while_comps.update(m.groups())
    # computation headers may have tuple-typed args (nested parens), which
    # trace_groups' header regex does not cross — use a greedy form here
    comp_rx = re.compile(r"^(?:ENTRY\s+)?(%[\w.\-]+)\s+\(.*\)\s*->")
    entries = []
    cur = None
    include = False
    for line in text.splitlines():
        cm = comp_rx.match(line)
        if cm:
            cur = cm.group(1)
            include = line.startswith("ENTRY") or cur in while_comps
            continue
        if not include:
            continue
        im = _HLO_INSTR_RX.match(line)
        if not im:
            continue
        name, opcode = im.group(1).lstrip("%"), im.group(2)
        head, _, _ = line.partition(f" {opcode}(")
        _, _, type_str = head.partition("=")
        args = line[len(head) + len(opcode) + 2:]
        depth, end = 1, 0
        for i, ch in enumerate(args):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    end = i
                    break
        operands = [o.lstrip("%") for o in _OPERAND_RX.findall(args[:end])]
        sm = _HLO_META_SRC.search(line)
        src = f"{sm.group(1).split('/')[-1]}:{sm.group(2)}" if sm else ""
        om = _HLO_META_OP.search(line)
        opn = om.group(1) if om else ""
        entries.append((name, opcode, type_bytes(type_str), operands,
                        src, opn))
    return entries


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("hlo")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--region", default=None,
                    help="only list families in this region")
    args = ap.parse_args()

    entries = parse_entry(args.hlo)
    result_bytes = {name: rb for name, _, rb, _, _, _ in entries}
    hlo_map = parse_hlo_instrs(args.hlo)

    per_region = collections.Counter()
    per_family = collections.Counter()
    family_region = {}
    total = 0
    idx_rx = re.compile(r"\.\d+")
    for name, opcode, rb, operands, src, opn in entries:
        if opcode in _FREE_OPS or opcode.endswith("-done"):
            # the -done half is the same transfer as its -start
            continue
        if opcode.endswith("-start"):
            # async copy/slice: result tuple aliases the operand + holds the
            # payload, so its own bytes ~= read + write of the transfer;
            # charging operand reads too would double-count (and a
            # slice-start reads only the slice, not the full operand)
            b = rb
        else:
            reads = sum(result_bytes.get(o, 0) for o in operands)
            b = rb + reads
        total += b
        ropcode, rsrc, ropn = hlo_map.get(name, (opcode, src, opn))
        reg = region_of(ropcode or opcode, rsrc or src, ropn or opn)
        if reg.startswith("UNATTRIBUTED") and opcode.endswith("-start"):
            # scheduler-inserted prefetch DMAs carry no metadata
            reg = "async-dma (scheduler prefetch)"
        per_region[reg] += b
        fam = f"{idx_rx.sub('', name):<40} {reg}"
        per_family[fam] += b
        family_region[fam] = reg
    print(f"total boundary traffic {total / 2 ** 30:.2f} GiB "
          f"(reads + writes; VMEM-resident small operands over-counted)")
    print("\n== per-region bytes ==")
    for reg, b in per_region.most_common():
        print(f"  {reg:<28} {b / 2 ** 30:7.2f} GiB {100 * b / total:5.1f}%")
    print("\n== largest families ==")
    shown = 0
    for fam, b in per_family.most_common():
        if args.region and args.region not in family_region[fam]:
            continue
        print(f"  {fam:<60} {b / 2 ** 30:7.2f} GiB {100 * b / total:5.1f}%")
        shown += 1
        if shown >= args.top:
            break


if __name__ == "__main__":
    main()
