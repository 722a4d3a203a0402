"""Unit tests for the roofline ledger's HLO parsing (tools/step_roofline).

The ledger's conclusions (docs/step_roofline_r4.json) rest on two parsing
primitives: tile-padded, memory-space-aware shape byte counts, and
valid-tap convolution flop counts (XLA writes backward convs as
big-window heavily-padded convolutions). The flop counts are checked
against an INDEPENDENT oracle: a lax.conv of all-ones indicator tensors
with the identical window config counts exactly the valid taps per
output position.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import step_roofline as R


def test_shape_bytes_tiling_and_spaces():
    cases = [
        # plain layouts
        ("f32[8,32,32,64]{3,2,1,0}", 8 * 32 * 32 * 64 * 4),
        # bf16 (2,1)-packed: minor pads to 128 lanes, 2nd-minor to 16
        ("bf16[256,56,56,64]{3,2,1,0:T(8,128)(2,1)}",
         256 * 56 * 56 * 128 * 2),
        # batch-minor permutation avoids the channel padding
        ("bf16[256,56,56,64]{0,3,2,1:T(8,128)(2,1)}",
         256 * 56 * 56 * 64 * 2),
        ("f32[256,56,56,64]{3,2,1,0:T(8,128)}", 256 * 56 * 56 * 128 * 4),
        ("bf16[256,7,7,2048]{3,2,1,0:T(8,128)(2,1)}",
         256 * 8 * 7 * 2048 * 2),
        ("f32[]", 4),
        ("(bf16[2,2]{1,0}, f32[3]{0})", 2 * 2 * 2 + 3 * 4),
        # VMEM/SMEM-resident buffers cost no HBM traffic
        ("f32[1,1,64,64]{3,2,1,0:T(8,128)S(1)}", 0),
        ("u32[]{:S(2)}", 0),
        ("(f32[256]{0:T(256)}, f32[256]{0:T(256)S(1)})", 256 * 4),
    ]
    for text, want in cases:
        assert R.shape_bytes(text) == want, text


def _oracle_macs(I, K, stride, pad, lhs_dil, rhs_dil, cin, cout, batch):
    """Valid MACs via indicator conv: ones-lhs (1,H,W,1) x ones-kernel
    counts valid taps per output position."""
    x = jnp.ones((1, I[0], I[1], 1), jnp.float32)
    w = jnp.ones((K[0], K[1], 1, 1), jnp.float32)
    y = lax.conv_general_dilated(
        x, w, window_strides=stride, padding=pad,
        lhs_dilation=lhs_dil, rhs_dilation=rhs_dil,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return int(np.sum(np.asarray(y))) * cin * cout * batch, y.shape


@pytest.mark.parametrize("I,K,stride,pad,lhs_dil,rhs_dil", [
    ((14, 14), (3, 3), (1, 1), ((1, 1), (1, 1)), (1, 1), (1, 1)),
    ((14, 14), (3, 3), (2, 2), ((1, 0), (1, 0)), (1, 1), (1, 1)),
    # dgrad of a stride-2 conv: input-dilated
    ((7, 7), (3, 3), (1, 1), ((1, 2), (1, 2)), (2, 2), (1, 1)),
    # wgrad: big window, heavy padding, rhs-dilated
    ((28, 28), (14, 14), (1, 1), ((0, -1), (0, -1)), (1, 1), (2, 2)),
    ((1, 1), (56, 56), (1, 1), ((55, 55), (55, 55)), (1, 1), (1, 1)),
])
def test_conv_flops_valid_taps_vs_indicator_oracle(
    I, K, stride, pad, lhs_dil, rhs_dil
):
    cin, cout, batch = 8, 16, 4
    macs, oshape = _oracle_macs(I, K, stride, pad, lhs_dil, rhs_dil,
                                cin, cout, batch)
    # synthesize the HLO line the tool would parse
    def w(v):
        return "x".join(str(t) for t in v)

    win = [f"size={w(K)}"]
    if stride != (1, 1):
        win.append(f"stride={w(stride)}")
    win.append(f"pad={pad[0][0]}_{pad[0][1]}x{pad[1][0]}_{pad[1][1]}")
    if lhs_dil != (1, 1):
        win.append(f"lhs_dilate={w(lhs_dil)}")
    if rhs_dil != (1, 1):
        win.append(f"rhs_dilate={w(rhs_dil)}")
    line = (
        f"  %conv.1 = f32[{batch},{oshape[1]},{oshape[2]},{cout}]"
        "{3,2,1,0} convolution(%lhs.1, %rhs.1), "
        f"window={{{' '.join(win)}}}, dim_labels=b01f_01io->b01f"
    )
    shapes = {
        "%lhs.1": f"f32[{batch},{I[0]},{I[1]},{cin}]{{3,2,1,0}}",
        "%rhs.1": f"f32[{K[0]},{K[1]},{cin},{cout}]{{3,2,1,0}}",
    }
    got = R._conv_flops(line, shapes)
    assert got == 2 * macs, (got, 2 * macs)


def test_dot_flops():
    line = ("  %dot.3 = f32[128,256]{1,0} dot(%a.1, %b.2), "
            "lhs_contracting_dims={1}, rhs_contracting_dims={0}")
    shapes = {"%a.1": "f32[128,512]{1,0}", "%b.2": "f32[512,256]{1,0}"}
    assert R._dot_flops(line, shapes) == 2 * 128 * 256 * 512


def test_start_done_accounting():
    """copy-start counts src read + HBM dest write once; copy-done and
    gtes are free; a VMEM-prefetch start costs only the HBM src read."""
    txt = """
HloModule m

ENTRY %main (p0: f32[1024]) -> f32[1024] {
  %p0 = f32[1024]{0:T(1024)} parameter(0)
  %copy-start.1 = (f32[1024]{0:T(1024)S(1)}, f32[1024]{0:T(1024)}, u32[]{:S(2)}) copy-start(%p0)
  %copy-done.1 = f32[1024]{0:T(1024)S(1)} copy-done(%copy-start.1)
  %add.1 = f32[1024]{0:T(1024)} add(%copy-done.1, %copy-done.1)
  ROOT %copy.9 = f32[1024]{0:T(1024)} copy(%add.1)
}
"""
    rows = R.build_ledger(txt)
    by = {r["name"]: r for r in rows}
    # prefetch start: reads p0 from HBM (4KB); dest is VMEM (free)
    assert by["copy-start.1"]["bytes"] == 4096
    assert "copy-done.1" not in by  # free alias
    # add reads VMEM operands (free), writes HBM output
    assert by["add.1"]["bytes"] == 4096
    assert by["copy.9"]["bytes"] == 8192  # HBM read + write


def test_slice_start_counts_extent_not_source():
    """An async VMEM slice prefetch reads only its slice EXTENT from the
    HBM source. Charging the full operand overcounts a tensor prefetched
    in N row-chunks N times — the bug that inflated the r4 ledger's
    'other' category from 4.1GB to 9.3GB (docs/step_roofline_r4.json
    provenance note)."""
    txt = """
HloModule m

ENTRY %main (p0: bf16[256,14,14,1024]) -> bf16[256,4,14,1024] {
  %p0 = bf16[256,14,14,1024]{3,0,2,1:T(8,128)(2,1)} parameter(0)
  %slice-start.1 = ((bf16[256,14,14,1024]{3,0,2,1:T(8,128)(2,1)}), bf16[256,4,14,1024]{3,0,2,1:T(8,128)(2,1)S(1)}, s32[]{:S(2)}) async-start(%p0), calls=%async_computation.1
  %slice-done.1 = bf16[256,4,14,1024]{3,0,2,1:T(8,128)(2,1)S(1)} async-done(%slice-start.1)
  ROOT %neg.1 = bf16[256,4,14,1024]{3,0,2,1:T(8,128)(2,1)} negate(%slice-done.1)
}
"""
    rows = R.build_ledger(txt)
    by = {r["name"]: r for r in rows}
    # slice extent (layout {3,0,2,1}: minor dims 1024,256 both
    # tile-aligned -> logical bytes), NOT the 14-row source
    extent = 256 * 4 * 14 * 1024 * 2
    assert by["slice-start.1"]["bytes"] == extent
    # destination is VMEM: no HBM write side
    assert by["slice-start.1"]["out_bytes"] == 0
    assert "slice-done.1" not in by


def test_slice_start_vmem_source_is_free():
    """A slice whose source already lives in VMEM moves no HBM bytes."""
    txt = """
HloModule m

ENTRY %main (p0: f32[64,64]) -> f32[8,64] {
  %p0 = f32[64,64]{1,0:T(8,128)S(1)} parameter(0)
  %slice-start.7 = ((f32[64,64]{1,0:T(8,128)S(1)}), f32[8,64]{1,0:T(8,128)S(1)}, s32[]{:S(2)}) async-start(%p0), calls=%ac.7
  %slice-done.7 = f32[8,64]{1,0:T(8,128)S(1)} async-done(%slice-start.7)
  ROOT %neg.7 = f32[8,64]{1,0:T(8,128)} negate(%slice-done.7)
}
"""
    rows = R.build_ledger(txt)
    by = {r["name"]: r for r in rows}
    assert by["slice-start.7"]["bytes"] == 0


def test_while_body_expanded_by_trip_count():
    """A lax.scan (grad_accum) lowers to a while loop: the ledger must
    charge the body's traffic once PER ITERATION (trip count inferred
    from the condition's `compare(counter, constant N), direction=LT`)
    and charge the while instruction itself nothing — its operand/result
    carry is buffer-aliased in place. Before round 5 the parser saw only
    entry instructions, silently uncounting the whole microbatch loop
    (the dataflow that measured BELOW the accum=1 floor,
    docs/accum_sweep_r5.jsonl)."""
    txt = """
HloModule m

%cond.1 (c: (s32[], f32[1024])) -> pred[] {
  %c = (s32[]{:T(128)}, f32[1024]{0:T(1024)}) parameter(0)
  %gte.1 = s32[]{:T(128)} get-tuple-element(%c), index=0
  %const.2 = s32[]{:T(128)} constant(2)
  ROOT %lt.1 = pred[]{:T(128)} compare(%gte.1, %const.2), direction=LT
}

%body.1 (b: (s32[], f32[1024])) -> (s32[], f32[1024]) {
  %b = (s32[]{:T(128)}, f32[1024]{0:T(1024)}) parameter(0)
  %gte.2 = s32[]{:T(128)} get-tuple-element(%b), index=0
  %gte.3 = f32[1024]{0:T(1024)} get-tuple-element(%b), index=1
  %one.1 = s32[]{:T(128)} constant(1)
  %next.1 = s32[]{:T(128)} add(%gte.2, %one.1)
  %mul.1 = f32[1024]{0:T(1024)} multiply(%gte.3, %gte.3)
  ROOT %tup.1 = (s32[]{:T(128)}, f32[1024]{0:T(1024)}) tuple(%next.1, %mul.1)
}

ENTRY %main (p0: (s32[], f32[1024])) -> (s32[], f32[1024]) {
  %p0 = (s32[]{:T(128)}, f32[1024]{0:T(1024)}) parameter(0)
  ROOT %while.1 = (s32[]{:T(128)}, f32[1024]{0:T(1024)}) while(%p0), condition=%cond.1, body=%body.1
}
"""
    rows = R.build_ledger(txt)
    by = {r["name"]: r for r in rows}
    assert "while.1" not in by  # aliased carry: charged nothing itself
    # body multiply(x, x): two operand reads + one write = 12KB per
    # iteration (per-reference accounting, same convention as entry
    # rows), x2 iterations
    assert by["mul.1"]["bytes"] == (2 * 4096 + 4096) * 2
    assert by["mul.1"]["loop"] == "while.1x2"


def test_tuple_index_comments_stripped():
    """Real XLA dumps annotate wide tuples with /*index=N*/ comments;
    the '=' inside them defeated the instruction regex's tuple-shape
    alternative, silently dropping the while row (and with it the whole
    scanned-body expansion) on the captured accum=2 HLO. The parser
    must strip comments before matching."""
    txt = """
HloModule m

%cond.3 (c: (s32[], f32[1024], f32[8])) -> pred[] {
  %c = (s32[]{:T(128)}, f32[1024]{0:T(1024)}, f32[8]{0:T(128)}) parameter(0)
  %gte.31 = s32[]{:T(128)} get-tuple-element(%c), index=0
  %const.32 = s32[]{:T(128)} constant(3)
  ROOT %lt.3 = pred[]{:T(128)} compare(%gte.31, %const.32), direction=LT
}

%body.3 (b: (s32[], f32[1024], f32[8])) -> (s32[], f32[1024], f32[8]) {
  %b = (s32[]{:T(128)}, f32[1024]{0:T(1024)}, f32[8]{0:T(128)}) parameter(0)
  %gte.33 = s32[]{:T(128)} get-tuple-element(%b), index=0
  %gte.34 = f32[1024]{0:T(1024)} get-tuple-element(%b), index=1
  %gte.35 = f32[8]{0:T(128)} get-tuple-element(%b), index=2
  %one.3 = s32[]{:T(128)} constant(1)
  %next.3 = s32[]{:T(128)} add(%gte.33, %one.3)
  %mul.3 = f32[1024]{0:T(1024)} multiply(%gte.34, %gte.34)
  ROOT %tup.3 = (s32[]{:T(128)}, f32[1024]{0:T(1024)}, /*index=2*/f32[8]{0:T(128)}) tuple(%next.3, %mul.3, %gte.35)
}

ENTRY %main (p0: (s32[], f32[1024], f32[8])) -> (s32[], f32[1024], f32[8]) {
  %p0 = (s32[]{:T(128)}, f32[1024]{0:T(1024)}, f32[8]{0:T(128)}) parameter(0)
  ROOT %while.3 = (s32[]{:T(128)}, f32[1024]{0:T(1024)}, /*index=2*/f32[8]{0:T(128)}) while(%p0), condition=%cond.3, body=%body.3
}
"""
    rows = R.build_ledger(txt)
    by = {r["name"]: r for r in rows}
    assert by["mul.3"]["bytes"] == (2 * 4096 + 4096) * 3
    assert by["mul.3"]["loop"] == "while.3x3"


def test_while_dynamic_bound_charged_once():
    """No static trip count (condition isn't a counter-LT-constant):
    charge the body once and mark the loop tag with '?'."""
    txt = """
HloModule m

%cond.9 (c: (pred[], f32[1024])) -> pred[] {
  %c = (pred[]{:T(128)}, f32[1024]{0:T(1024)}) parameter(0)
  ROOT %gte.9 = pred[]{:T(128)} get-tuple-element(%c), index=0
}

%body.9 (b: (pred[], f32[1024])) -> (pred[], f32[1024]) {
  %b = (pred[]{:T(128)}, f32[1024]{0:T(1024)}) parameter(0)
  %gte.8 = pred[]{:T(128)} get-tuple-element(%b), index=0
  %gte.7 = f32[1024]{0:T(1024)} get-tuple-element(%b), index=1
  %mul.9 = f32[1024]{0:T(1024)} multiply(%gte.7, %gte.7)
  ROOT %tup.9 = (pred[]{:T(128)}, f32[1024]{0:T(1024)}) tuple(%gte.8, %mul.9)
}

ENTRY %main (p0: (pred[], f32[1024])) -> (pred[], f32[1024]) {
  %p0 = (pred[]{:T(128)}, f32[1024]{0:T(1024)}) parameter(0)
  ROOT %while.9 = (pred[]{:T(128)}, f32[1024]{0:T(1024)}) while(%p0), condition=%cond.9, body=%body.9
}
"""
    rows = R.build_ledger(txt)
    by = {r["name"]: r for r in rows}
    assert by["mul.9"]["bytes"] == 2 * 4096 + 4096
    assert by["mul.9"]["loop"] == "while.9x?"
