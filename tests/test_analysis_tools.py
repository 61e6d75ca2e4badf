"""Unit tests for the r5 offline analysis tools: the HBM-byte attribution
parser (tools/hbm_bytes.py) and the audit error-row formatter
(tools/hbm_audit.py) — pinned on a tiny synthetic HLO so parser
regressions show up without a chip."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.hbm_audit import _compile_error_row  # noqa: E402
from tools.hbm_bytes import parse_entry, type_bytes  # noqa: E402

TOY_HLO = """\
HloModule toy

%fused_computation.1 (p0: f32[8,4]) -> f32[8,4] {
  %p0 = f32[8,4]{1,0} parameter(0)
  ROOT %neg = f32[8,4]{1,0} negate(%p0)
}

%wide.body (arg: (s32[], f32[8,4])) -> (s32[], f32[8,4]) {
  %arg = (s32[], f32[8,4]{1,0}) parameter(0)
  %i = s32[]{:T(128)} get-tuple-element(%arg), index=0
  %x = f32[8,4]{1,0} get-tuple-element(%arg), index=1
  %fusion.1 = f32[8,4]{1,0} fusion(%x), kind=kLoop, calls=%fused_computation.1, metadata={op_name="jit(f)/while/body/backbone/stage_0_block_0/attn/qkv/add" source_file="/repo/clover_tpu/ops/window_attention.py" source_line=10}
  %vmemval = bf16[8,4]{1,0:T(8,128)(2,1)S(1)} convert(%fusion.1)
  %one = s32[]{:T(128)} constant(1)
  %next = s32[]{:T(128)} add(%i, %one)
  ROOT %tup = (s32[], f32[8,4]{1,0}) tuple(%next, %fusion.1)
}

%wide.cond (arg: (s32[], f32[8,4])) -> pred[] {
  %arg = (s32[], f32[8,4]{1,0}) parameter(0)
  %i = s32[]{:T(128)} get-tuple-element(%arg), index=0
  %n = s32[]{:T(128)} constant(3)
  ROOT %lt = pred[]{:T(128)} compare(%i, %n), direction=LT
}

ENTRY %main (a: f32[8,4]) -> f32[8,4] {
  %a = f32[8,4]{1,0} parameter(0)
  %init = s32[]{:T(128)} constant(0)
  %tuple.0 = (s32[], f32[8,4]{1,0}) tuple(%init, %a)
  %while.1 = (s32[], f32[8,4]{1,0}) while(%tuple.0), condition=%wide.cond, body=%wide.body
  ROOT %out = f32[8,4]{1,0} get-tuple-element(%while.1), index=1
}
"""


@pytest.fixture()
def toy_hlo(tmp_path):
    p = tmp_path / "toy.hlo"
    p.write_text(TOY_HLO)
    return str(p)


def test_type_bytes_tuples_and_vmem():
    assert type_bytes("f32[8,4]{1,0}") == 8 * 4 * 4
    assert type_bytes("(s32[]{:T(128)}, f32[8,4]{1,0})") == 4 + 128
    # S(1) = scoped VMEM placement -> never crosses HBM -> free
    assert type_bytes("bf16[8,4]{1,0:T(8,128)(2,1)S(1)}") == 0
    assert type_bytes("bf16[8,4]{1,0:T(8,128)(2,1)}") == 8 * 4 * 2


def test_parse_entry_walks_entry_and_while_body(toy_hlo):
    entries = parse_entry(toy_hlo)
    names = {name for name, *_ in entries}
    # ENTRY members present
    assert "tuple.0" in names and "while.1" in names
    # while body/cond members included (scan programs schedule there)
    assert "fusion.1" in names and "lt" in names
    row = {name: (opcode, rb, operands, src, opn)
           for name, opcode, rb, operands, src, opn in entries}
    opcode, rb, operands, src, opn = row["fusion.1"]
    assert opcode == "fusion"
    assert rb == 8 * 4 * 4
    assert operands == ["x"]
    assert src == "window_attention.py:10"
    assert "attn/qkv/add" in opn
    # the S(1) convert result is byte-free
    assert row["vmemval"][1] == 0


def test_compile_error_row_extracts_vmem_detail():
    err = RuntimeError(
        "INTERNAL: remote compile failed\n"
        "  some unrelated line\n"
        "  Ran out of memory in memory space vmem while allocating on "
        "stack for %stage_2._mlp_half = bf16[37632,512] custom-call(...)\n"
        "  Scoped allocation with size 16.61M and limit 16.00M exceeded\n")
    row = _compile_error_row("8f-B24", err, scan=True)
    assert row == {
        "label": "8f-B24", "ok": False, "scan": True,
        "error": "INTERNAL: remote compile failed",
        "detail": [
            "Ran out of memory in memory space vmem while allocating on "
            "stack for %stage_2._mlp_half = bf16[37632,512] "
            "custom-call(...)",
            "Scoped allocation with size 16.61M and limit 16.00M exceeded",
        ],
    }
