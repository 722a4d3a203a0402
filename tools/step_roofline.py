"""Whole-step HBM roofline ledger for the b256 train step.

The round-3 plateau claim ("~2600 img/s is the dataflow floor of this
stack") lived in per-stage prose; this tool makes it a checkable artifact
(round-4 verdict item #1). It AOT-compiles the EXACT bench.py headline
step, parses the optimized HLO module, and models every top-level
instruction as one HBM pass:

    bytes_i = padded(output) + sum(padded(operands))   [TPU tile layouts]
    flops_i = MXU flops of convs/dots (incl. inside called fusions)
    t_i     = max(bytes_i / BW_measured, flops_i / PEAK_measured)

Sum(t_i) is the memory/compute roofline the measured step time should be
compared against — the analogue of the reference's measured cudaMalloc
cost model (resnet_cudnn_fast.cu:1290-1297): a measured model, not an
asserted one. BW and matmul peak are measured on the same chip in the
same process; the step time is slope-timed like bench.py.

Padded bytes honor the layout annotation (e.g. bf16[...]{3,2,1,0:
T(8,128)(2,1)}): the minor dim pads to the 128-lane tile and the
second-minor to the (packed) sublane tile — a 64-channel bf16 activation
really occupies (and streams) 2x its logical bytes on TPU.

Usage (real chip, ~5 min incl. compile):
    python tools/step_roofline.py --out docs/step_roofline_r4.json
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DTYPE_BYTES = {
    "pred": 1, "s2": 1, "s4": 1, "u4": 1, "s8": 1, "u8": 1,
    "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4,
    "s64": 8, "u64": 8, "f64": 8, "c64": 8, "c128": 16,
    "token": 0, "opaque": 0,
}

_SHAPE_RE = re.compile(
    r"(\w+)\[([\d,]*)\](?:\{([\d,]*)"          # dtype [dims] {perm
    r"(?::T\(([\dx,()]+)\)((?:\(\d+,\d+\))?))?"  # :T(tile)(pack)
    r"([^}]*)\})?"                                 # trailer (may hold S(k))
)


def _parse_shape(text, pos=0, hbm_only=True, padded=True):
    """Parse one (possibly tuple) shape; return (bytes, end).

    With hbm_only, buffers annotated into another memory space
    (S(1) = VMEM, S(2) = SMEM/sflag) count 0 bytes — they never touch HBM.
    With padded=False, tile layouts are ignored (LOGICAL bytes) — the
    padded-vs-logical delta is the tile-padding tax the audit reports.
    """
    if text[pos] == "(":
        total, p = 0, pos + 1
        while True:
            b, p = _parse_shape(text, p, hbm_only, padded)
            total += b
            if text[p] == ",":
                p += 1
                while text[p] == " ":
                    p += 1
            elif text[p] == ")":
                return total, p + 1
    m = _SHAPE_RE.match(text, pos)
    if not m:
        return 0, pos + 1
    dtype, dims_s, perm_s, tile_s, pack_s, trailer = m.groups()
    if dtype not in _DTYPE_BYTES:
        return 0, m.end()
    if hbm_only and trailer and "S(" in trailer:
        return 0, m.end()
    esize = _DTYPE_BYTES[dtype]
    dims = [int(d) for d in dims_s.split(",")] if dims_s else []
    if not dims:
        return esize, m.end()
    if perm_s and tile_s and padded:
        # physical order: perm lists minor-to-major LOGICAL dim indices
        perm = [int(d) for d in perm_s.split(",")]
        # first tile group only (e.g. "8,128" of "T(8,128)(2,1)"); nested
        # groups beyond the first parenthesis were captured separately
        tile = [int(t) for t in re.split(r"[x,]", tile_s.split(")")[0]) if t]
        pack = 1
        if pack_s:
            pack = int(pack_s.strip("()").split(",")[0])
        phys = [dims[perm[i]] for i in range(len(perm))]  # minor..major
        # tile applies to the len(tile) minormost dims, minor last in tile
        for k, t in enumerate(reversed(tile)):
            if k < len(phys):
                if k == 1 and pack > 1:
                    t *= pack  # packed sublanes widen the 2nd-minor tile
                phys[k] = -(-phys[k] // t) * t
        n = 1
        for d in phys:
            n *= d
        return n * esize, m.end()
    n = 1
    for d in dims:
        n *= d
    return n * esize, m.end()


def shape_bytes(text, hbm_only=True, padded=True):
    b, _ = _parse_shape(text, 0, hbm_only, padded)
    return b


_INSTR_RE = re.compile(
    r"^\s*(ROOT\s+)?(%[\w.\-]+)\s*=\s*"
    r"((?:\([^=]*?\)|\w+\[[^\]]*\](?:\{[^}]*\})?))\s+"
    r"([\w\-]+)\("
)


def _conv_flops(line, shapes):
    """2 * MACs with only VALID window taps counted — backward convs are
    big-window heavily-padded convolutions (e.g. window=56x56 pad=55_55)
    whose naive out*K*Cin count is ~10x the real MAC count."""
    m = _INSTR_RE.match(line)
    ops = _operands(line)
    if len(ops) < 2:
        return 0
    lhs = shapes.get(ops[0])
    rhs = shapes.get(ops[1])
    dl = re.search(r"dim_labels=([\w?]+)_([\w?]+)->([\w?]+)", line)
    if lhs is None or rhs is None or not dl:
        return 0
    llab, rlab, olab = dl.groups()
    ldims, rdims, odims = _dims(lhs), _dims(rhs), _dims(m.group(3))
    if len(llab) != len(ldims) or len(rlab) != len(rdims) \
            or len(olab) != len(odims):
        return 0
    spatial = sorted(c for c in llab if c not in "bf")
    I = [ldims[llab.index(c)] for c in spatial]
    O = [odims[olab.index(c)] for c in spatial]
    cin = rdims[rlab.index("i")]
    b_out = odims[olab.index("b")]
    f_out = odims[olab.index("f")]

    def field(name, default, nd):
        g = re.search(name + r"=([\d\-x_]+)", line)
        if not g:
            return [default] * nd
        return [int(v.split("_")[0]) for v in g.group(1).split("x")]

    def field_pairs(nd):
        g = re.search(r"pad=([\d\-x_]+)", line)
        if not g:
            return [(0, 0)] * nd
        out = []
        for v in g.group(1).split("x"):
            lohi = v.split("_")
            out.append((int(lohi[0]), int(lohi[1])))
        return out

    nd = len(spatial)
    K = field(r"size", 1, nd)
    S = field(r"stride", 1, nd)
    LD = field(r"lhs_dilate", 1, nd)
    RD = field(r"rhs_dilate", 1, nd)
    P = field_pairs(nd)
    valid = 1
    for d in range(nd):
        v = 0
        span = (I[d] - 1) * LD[d]
        for o in range(O[d]):
            base = o * S[d] - P[d][0]
            for k in range(K[d]):
                pos = base + k * RD[d]
                if 0 <= pos <= span and pos % LD[d] == 0:
                    v += 1
        valid *= v
    return 2 * b_out * f_out * cin * valid


def _dot_flops(line, shapes):
    m = _INSTR_RE.match(line)
    out_elems = _elems(m.group(3))
    ops = _operands(line)
    if not ops:
        return 0
    lhs = shapes.get(ops[0])
    cd = re.search(r"lhs_contracting_dims=\{([\d,]*)\}", line)
    if lhs is None or not cd or not cd.group(1):
        return 0
    ldims = _dims(lhs)
    k = 1
    for i in cd.group(1).split(","):
        k *= ldims[int(i)]
    return 2 * out_elems * k


def _dims(shape_text):
    m = re.search(r"\[([\d,]*)\]", shape_text)
    if not m or not m.group(1):
        return []
    return [int(d) for d in m.group(1).split(",")]


def _elems(shape_text):
    n = 1
    for d in _dims(shape_text):
        n *= d
    return n


def _operands(line):
    """Operand names of the top-level call: the first (...) after opcode."""
    m = _INSTR_RE.match(line)
    if not m:
        return []
    start = m.end() - 1
    depth = 0
    for i in range(start, len(line)):
        if line[i] == "(":
            depth += 1
        elif line[i] == ")":
            depth -= 1
            if depth == 0:
                seg = line[start + 1:i]
                return re.findall(r"%[\w.\-]+", seg)
    return []


_FREE_OPS = {
    "parameter", "constant", "get-tuple-element", "tuple", "bitcast",
    "after-all", "partition-id", "replica-id",
    # *-done ops return an alias of the buffer the matching *-start already
    # produced (and whose traffic the start accounted): free
    "copy-done", "async-done", "slice-done", "all-gather-done",
    "all-reduce-done", "collective-permute-done", "recv-done", "send-done",
}


def _tuple_elem_shape(shape_text, idx):
    """Text of tuple element idx of a top-level tuple shape (no nesting
    in TPU start-op results)."""
    if not shape_text.startswith("("):
        return shape_text if idx == 0 else ""
    # split top-level commas respecting [] {} () nesting
    parts = []
    depth = 0
    cur = []
    for ch in shape_text[1:-1]:
        if ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return parts[idx] if idx < len(parts) else ""


def parse_module(txt):
    """Split HLO text into computations; return (entry_lines, comp_flops,
    entry_shapes, comps) where comp_flops maps computation name ->
    conv/dot flops inside it, entry_shapes maps %name -> shape text
    (entry only), and comps maps every computation name -> (lines,
    local_shapes) so while-loop bodies can be ledgered per iteration."""
    # strip /*index=N*/ element comments: the '=' inside them defeats the
    # instruction regex's tuple-shape alternative (seen on the while
    # carry's 436-element tuple), and no downstream parse needs them
    txt = re.sub(r"/\*.*?\*/", "", txt)
    comp_flops = {}
    comps = {}
    entry_lines = []
    cur_name, cur_lines = None, []
    shapes = {}  # per-computation local name -> shape text

    def finish(name, lines):
        local = {}
        for l in lines:
            m = _INSTR_RE.match(l)
            if m:
                local[m.group(2)] = m.group(3)
        # parameters appear in the signature, shapes inline on param lines
        fl = 0
        for l in lines:
            m = _INSTR_RE.match(l)
            if not m:
                continue
            op = m.group(4)
            if op == "convolution":
                fl += _conv_flops(l, local)
            elif op == "dot":
                fl += _dot_flops(l, local)
        comp_flops[name] = fl
        return local

    lines = txt.split("\n")
    entry_shapes = {}
    i = 0
    while i < len(lines):
        l = lines[i]
        # computation headers sit at column 0 and end with '{'; the param
        # list can nest parens arbitrarily deep (a while body's carry is a
        # tuple of shapes whose layouts carry T(...)/S(...) annotations),
        # so don't try to balance them — instruction lines are indented
        # and can't false-match an anchored pattern
        mh = re.match(r"(ENTRY\s+)?(%[\w.\-]+)\s*\(.*\{\s*$", l)
        if mh:
            is_entry = bool(mh.group(1))
            name = mh.group(2)
            body = []
            i += 1
            while i < len(lines) and not lines[i].startswith("}"):
                body.append(lines[i])
                i += 1
            local = finish(name, body)
            comps[name] = (body, local)
            if is_entry:
                entry_lines = body
                entry_shapes = local
        i += 1
    return entry_lines, comp_flops, entry_shapes, comps


def _while_trip_count(cond_lines):
    """Infer a while loop's static trip count from its condition
    computation: the standard lax.scan lowering compares the induction
    counter (init 0, +1 per iteration) against a scalar constant with
    direction=LT. Returns None when the pattern doesn't match (dynamic
    bound) — callers then charge the body once and flag the row."""
    consts = {}
    compare = None
    for l in cond_lines:
        m = re.match(r"\s*(ROOT\s+)?(%[\w.\-]+)\s*=\s*\S+\s+constant\((\d+)\)", l)
        if m:
            consts[m.group(2)] = int(m.group(3))
        if " compare(" in l and "direction=LT" in l:
            compare = l
    if compare is None:
        return None
    for o in _operands(compare):
        if o in consts:
            return consts[o]
    return None


def build_ledger(txt):
    entry_lines, comp_flops, entry_shapes, comps = parse_module(txt)
    rows = []
    _ledger_lines(entry_lines, entry_shapes, comp_flops, comps, rows,
                  scale=1, loop="")
    return rows


def _ledger_lines(lines, shapes, comp_flops, comps, rows, scale, loop):
    for l in lines:
        m = _INSTR_RE.match(l)
        if not m:
            continue
        name, shape_text, op = m.group(2), m.group(3), m.group(4)
        if op in _FREE_OPS:
            continue
        ops_names = _operands(l)
        if op == "while":
            # expand the body per iteration: the carry lives in place
            # (XLA aliases the while operand/result buffers), so the real
            # HBM traffic is the body's instructions x trip count — the
            # while instruction itself is an alias, charged nothing.
            # (grad_accum lowers lax.scan here; before round 5 the ledger
            # saw only entry instructions and would silently uncount the
            # whole microbatch loop.)
            body_m = re.search(r"body=(%[\w.\-]+)", l)
            cond_m = re.search(r"condition=(%[\w.\-]+)", l)
            trip = None
            if cond_m and cond_m.group(1) in comps:
                trip = _while_trip_count(comps[cond_m.group(1)][0])
            if body_m and body_m.group(1) in comps:
                b_lines, b_shapes = comps[body_m.group(1)]
                _ledger_lines(
                    b_lines, b_shapes, comp_flops, comps, rows,
                    scale=scale * (trip if trip else 1),
                    loop=(loop + "/" if loop else "")
                    + f"{name.lstrip('%')}x{trip if trip else '?'}",
                )
            continue
        if op == "copy-start":
            # result tuple = (dest, src-alias, ctx): count the fresh dest
            # write (elem 0) plus the HBM-resident operand read below
            out_b = shape_bytes(_tuple_elem_shape(shape_text, 0))
            in_b = sum(
                shape_bytes(shapes[o]) for o in ops_names if o in shapes
            )
            log_b = shape_bytes(
                _tuple_elem_shape(shape_text, 0), padded=False
            ) + sum(
                shape_bytes(shapes[o], padded=False)
                for o in ops_names if o in shapes
            )
        elif op.endswith("-start"):
            # async slice prefetch (VMEM operand staging): tuple =
            # ((src-alias), dest, ctx). The READ touches only the slice
            # EXTENT of the HBM source — charging the full source operand
            # would overcount a tensor prefetched in N row-chunks N times.
            # Read side = dest extent ignoring its memory space (the bytes
            # still stream FROM HBM when the source lives there); write
            # side = dest only if it is HBM-resident.
            dest = _tuple_elem_shape(shape_text, 1)
            out_b = shape_bytes(dest)
            src_hbm = any(
                shape_bytes(shapes[o]) > 0 for o in ops_names if o in shapes
            )
            in_b = shape_bytes(dest, hbm_only=False) if src_hbm else 0
            log_b = shape_bytes(dest, padded=False) + (
                shape_bytes(dest, hbm_only=False, padded=False)
                if src_hbm else 0
            )
        else:
            out_b = shape_bytes(shape_text)
            in_b = sum(
                shape_bytes(shapes[o]) for o in ops_names if o in shapes
            )
            log_b = shape_bytes(shape_text, padded=False) + sum(
                shape_bytes(shapes[o], padded=False)
                for o in ops_names if o in shapes
            )
        fl = 0
        if op == "convolution":
            fl = _conv_flops(l, shapes)
        elif op == "dot":
            fl = _dot_flops(l, shapes)
        elif op == "fusion":
            c = re.search(r"calls=(%[\w.\-]+)", l)
            if c:
                fl = comp_flops.get(c.group(1), 0)
        meta = re.search(r'op_name="([^"]*)"', l)
        cyc = re.search(r'"estimated_cycles":"(\d+)"', l)
        src = re.search(r'source_file="[^"]*/([^/"]+)" source_line=(\d+)', l)
        row = {
            "name": name.lstrip("%"),
            "op": op,
            "bytes": (out_b + in_b) * scale,
            "out_bytes": out_b * scale,
            "logical_bytes": log_b * scale,
            "flops": fl * scale,
            "op_name": meta.group(1) if meta else "",
            "source": f"{src.group(1)}:{src.group(2)}" if src else "",
            "xla_cycles": int(cyc.group(1)) if cyc else 0,
        }
        if loop:
            row["loop"] = loop  # body row, already multiplied by trips
        rows.append(row)


def categorize(op_name, source=""):
    s = op_name.lower()
    if "adam.py" in source or "sgd" in source or "adam" in s:
        return "optimizer"
    if "transpose(" in s or "vjp" in s or "backward" in s:
        return "backward"
    if "jvp(" in s or "forward" in s:
        return "forward"
    if s or source:
        return "forward"
    return "other"


def measure_bandwidth(dev):
    """Best streaming read+write GB/s over several access patterns,
    dispatch-chained (async dispatch pipelines over the tunnel; a
    device-side fori_loop measures HALF this — the loop carry copy
    doubles the traffic). The ledger divides by the best the chip
    demonstrably sustains, so the floor is conservative."""
    import jax
    import jax.numpy as jnp

    best = 0.0
    details = []
    for dtype, esize, shape, passes in [
        (jnp.bfloat16, 2, (512, 1024, 1024), 2),   # 1GB x+1: R+W
        (jnp.float32, 4, (256, 1024, 1024), 2),    # 1GB f32 x+1
        (jnp.bfloat16, 2, (512, 1024, 1024), 3),   # x+y: 2R+W
    ]:
        n = int(np.prod(shape))
        if passes == 3:
            y0 = jax.device_put(jnp.ones(shape, dtype))
            f = jax.jit(lambda a, b: a + b)
            step = lambda x: f(x, y0)
        else:
            f = jax.jit(lambda a: a + a.dtype.type(1))
            step = f
        x = jax.device_put(jnp.ones(shape, dtype))

        def run(k, x):
            t0 = time.perf_counter()
            for _ in range(k):
                x = step(x)
            _ = float(jax.device_get(x.ravel()[0]))
            return time.perf_counter() - t0, x

        _, x = run(3, x)
        t1, x = run(4, x)
        t2, x = run(24, x)
        dt = (t2 - t1) / 20
        details.append({
            "pattern": f"{'x+y' if passes == 3 else 'x+1'}"
                       f" {str(np.dtype('float32' if esize == 4 else 'bfloat16'))}"
                       f" {shape}",
            "gbs": round((passes * n * esize) / dt / 1e9, 1),
        })
        best = max(best, (passes * n * esize) / dt / 1e9)
        del x
    return best, details


def measure_matmul_peak(dtype="bfloat16"):
    """MXU TFLOP/s from a large square bf16 matmul, dispatch-chained.
    Values scaled ~1/k to stay finite; slope is min-of-3 against queue
    noise."""
    import jax
    import jax.numpy as jnp

    k = 8192
    # random operand: a uniform-constant matrix lets XLA's algebraic
    # simplifier rewrite a@y into a reduction and skip the MXU entirely
    a = jax.device_put(
        (jax.random.normal(jax.random.key(0), (k, k), jnp.float32)
         * (1.0 / k)).astype(jnp.bfloat16)
    )

    @jax.jit
    def f(y):
        return a @ y

    def run(n, y):
        t0 = time.perf_counter()
        for _ in range(n):
            y = f(y)
        _ = float(jax.device_get(y[0, 0]))
        return time.perf_counter() - t0

    run(3, a)
    t1 = min(run(4, a) for _ in range(3))
    t2 = min(run(16, a) for _ in range(3))
    dt = (t2 - t1) / 12
    return 2 * k**3 / dt / 1e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--dim", type=int, default=224)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--kernels", default="xla")
    ap.add_argument("--grad-accum", type=int, default=1,
                    help="microbatch accumulation depth — r5 measured "
                         "accum=2 BELOW the accum=1 ledger floor, so the "
                         "ledger must be rebuildable for that dataflow")
    ap.add_argument("--projections", default="standard",
                    choices=["standard", "reference"])
    ap.add_argument("--no-measure", action="store_true",
                    help="parse + model only (CPU dev mode); BW/peak from"
                         " --bw/--peak, no step timing")
    ap.add_argument("--bw", type=float, default=0.0, help="GB/s override")
    ap.add_argument("--peak", type=float, default=0.0,
                    help="TFLOP/s override")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--out", default="")
    ap.add_argument("--rows-out", default="",
                    help="write the FULL per-instruction ledger as JSONL"
                         " (every pass, not just --top) for offline"
                         " decomposition of e.g. the 'other' category")
    ap.add_argument("--hlo-out", default="",
                    help="save the optimized HLO text — lets the ledger be"
                         " re-built offline (tunnel outages) without"
                         " recompiling on the chip")
    ap.add_argument("--hlo-in", default="",
                    help="rebuild the ledger from a saved optimized-HLO"
                         " text instead of compiling (no chip needed);"
                         " pass --bw/--peak/--step-ms from the measured"
                         " artifact, implies --no-measure")
    ap.add_argument("--step-ms", type=float, default=0.0,
                    help="previously measured step time (with --hlo-in)")
    args = ap.parse_args()

    if args.hlo_in:
        _main_from_hlo(args)
        return

    import jax

    from resnet_tpu.config import (
        DataConfig,
        ExecutionConfig,
        OptimizerConfig,
        TrainConfig,
        model_config,
    )
    from resnet_tpu.train import init_train_state
    from resnet_tpu.train.step import train_step

    on_tpu = jax.devices()[0].platform == "tpu"
    batch = args.batch if on_tpu else min(args.batch, 16)
    dim = args.dim if on_tpu else min(args.dim, 64)

    cfg = TrainConfig(
        model=model_config(
            args.model if hasattr(args, "model") else "resnet50",
            input_dim=dim,
            stride_projection_kernel=3 if args.projections == "reference"
            else 1,
        ),
        execution=ExecutionConfig(
            kernels=args.kernels, compute_dtype="bfloat16",
            matmul_precision="default", space_to_depth=True,
            grad_accum=args.grad_accum,
        ),
        optimizer=OptimizerConfig(),
        data=DataConfig(batch_size=batch, synthetic=True),
    )
    state = init_train_state(cfg)
    rng = np.random.default_rng(0)
    b = {
        "images": jax.device_put(
            rng.normal(0, 50, (batch, dim, dim, 3)).astype(np.float32)
        ),
        "labels": jax.device_put(
            rng.integers(0, 1000, (batch,)).astype(np.int32)
        ),
    }
    fn = functools.partial(train_step, cfg=cfg)
    print("lowering + compiling...", file=sys.stderr)
    compiled = jax.jit(fn, donate_argnums=0).lower(state, b).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    txt = compiled.as_text()
    if args.hlo_out:
        with open(args.hlo_out, "w") as f:
            f.write(txt)
        print(f"wrote {args.hlo_out}", file=sys.stderr)
    rows = build_ledger(txt)

    bw = args.bw
    peak = args.peak
    step_ms = None
    bw_details = []
    if not args.no_measure:
        print("measuring bandwidth...", file=sys.stderr)
        bw_details = []
        if not bw:
            bw, bw_details = measure_bandwidth(jax.devices()[0])
        print(f"  BW = {bw:.1f} GB/s", file=sys.stderr)
        print("measuring matmul peak...", file=sys.stderr)
        peak = peak or measure_matmul_peak()
        print(f"  peak = {peak:.1f} TFLOP/s", file=sys.stderr)
        print("timing step...", file=sys.stderr)

        def run(s, n):
            t0 = time.perf_counter()
            m = None
            for _ in range(n):
                s, m = compiled(s, b)
            _ = float(jax.device_get(m["loss"]))
            return time.perf_counter() - t0, s

        _, state = run(state, 3)
        n_small = max(2, args.steps // 4)
        t_small, state = run(state, n_small)
        t_big, state = run(state, args.steps)
        step_ms = (t_big - t_small) / (args.steps - n_small) * 1000

    config = {
        "model": "resnet50", "batch": batch, "dim": dim,
        "dtype": "bfloat16", "engine": args.kernels,
        "topology": args.projections, "space_to_depth": True,
        "grad_accum": args.grad_accum,
        "platform": jax.devices()[0].platform,
        # binds the ledger (and the floor bench.py carries) to THIS HLO:
        # a floor quoted against a different compile is detectably stale
        "hlo_sha256": _sha256(txt),
    }
    ca_dict = {
        "flops": ca.get("flops"),
        "bytes_accessed": ca.get("bytes accessed"),
    }
    _emit(rows, args, bw, peak, step_ms, config, ca_dict, bw_details)


def _main_from_hlo(args):
    """Offline mode: rebuild the ledger from a saved optimized-HLO text
    (no chip, no compile). BW / peak / step_ms come from the measured
    artifact the HLO was captured alongside."""
    if args.hlo_in.endswith(".gz"):
        import gzip

        txt = gzip.open(args.hlo_in, "rt").read()
    else:
        txt = open(args.hlo_in).read()
    rows = build_ledger(txt)
    config = {
        "model": "resnet50", "batch": args.batch, "dim": args.dim,
        "dtype": "bfloat16", "engine": args.kernels,
        "topology": args.projections, "space_to_depth": True,
        "grad_accum": args.grad_accum,
        "platform": "offline-hlo", "hlo_in": args.hlo_in,
        "hlo_sha256": _sha256(txt),
    }
    _emit(rows, args, args.bw, args.peak, args.step_ms or None, config,
          {"flops": None, "bytes_accessed": None}, [])


def _sha256(txt: str) -> str:
    import hashlib

    return hashlib.sha256(txt.encode()).hexdigest()


def _conclusion(step_ms, floor_ms, floor_ms_datasheet, target_ms):
    if floor_ms_datasheet > target_ms:
        return (
            "step is at its roofline: the floor at DATASHEET bandwidth"
            " (819 GB/s, never reached by any streaming microbenchmark on"
            " this chip) already exceeds the step time the 3000 img/s"
            " target requires — this HLO's HBM traffic forbids the target;"
            " only traffic REMOVAL (a different dataflow) can reach it,"
            " and docs/perf_ceiling_r2.md + docs/granularity_r3.md record"
            " the measured negatives for every Pallas fusion granularity"
            " on this stack"
        )
    if floor_ms > target_ms:
        return (
            "the floor at MEASURED bandwidth exceeds the target step time,"
            " but the floor at datasheet bandwidth (819 GB/s) does not:"
            " the gap is achievable-bandwidth-bound — the target becomes"
            " reachable only if the real access patterns sustain more"
            " GB/s than the streaming microbenchmark demonstrates"
        )
    return "floor leaves headroom below the target step time"


def _emit(rows, args, bw, peak, step_ms, config, ca_dict, bw_details):
    batch = config["batch"]
    bw = bw or 819.0  # v5e datasheet
    peak = peak or 197.0
    total_bytes = sum(r["bytes"] for r in rows)
    total_flops = sum(r["flops"] for r in rows)

    for r in rows:
        r["t_bytes_ms"] = r["bytes"] / bw / 1e6
        r["t_flops_ms"] = r["flops"] / peak / 1e9
        r["t_floor_ms"] = max(r["t_bytes_ms"], r["t_flops_ms"])
        r["bound"] = "flops" if r["t_flops_ms"] > r["t_bytes_ms"] else "bytes"
        r["category"] = categorize(r["op_name"], r["source"])

    floor_ms = sum(r["t_floor_ms"] for r in rows)
    DATASHEET_BW = 819.0  # v5e HBM GB/s — the most optimistic bound
    floor_ms_datasheet = sum(
        max(r["bytes"] / DATASHEET_BW / 1e6, r["t_flops_ms"]) for r in rows
    )
    total_cycles = sum(r["xla_cycles"] for r in rows)
    floor_bytes_ms = total_bytes / bw / 1e6
    floor_flops_ms = total_flops / peak / 1e9
    by_cat = {}
    for r in rows:
        c = by_cat.setdefault(
            r["category"], {"bytes": 0, "flops": 0, "t_floor_ms": 0.0,
                            "n": 0}
        )
        c["bytes"] += r["bytes"]
        c["flops"] += r["flops"]
        c["t_floor_ms"] += r["t_floor_ms"]
        c["n"] += 1
    for c in by_cat.values():
        c["t_floor_ms"] = round(c["t_floor_ms"], 2)

    # decompose the metadata-less 'other' category (copies / bitcasts /
    # async transfers / spills) by HLO opcode so its 13ms-scale floor
    # share is attributable, not a black box
    other_by_op = {}
    for r in rows:
        if r["category"] != "other":
            continue
        c = other_by_op.setdefault(
            r["op"], {"bytes": 0, "t_floor_ms": 0.0, "n": 0}
        )
        c["bytes"] += r["bytes"]
        c["t_floor_ms"] += r["t_floor_ms"]
        c["n"] += 1
    for c in other_by_op.values():
        c["t_floor_ms"] = round(c["t_floor_ms"], 2)

    # tile-padding audit (round-4 verdict item #3c): padded-vs-logical
    # HBM bytes — how much of the floor is the TPU tile tax (bf16
    # T(8,128): a 64-channel tensor streams 2x its logical bytes), and
    # where. Waste concentrated in one source site = a layout/channel
    # choice worth changing; waste spread thin = irreducible.
    total_logical = sum(r.get("logical_bytes", 0) for r in rows)
    waste_by_src = {}
    for r in rows:
        w = r["bytes"] - r.get("logical_bytes", r["bytes"])
        if w <= 0:
            continue
        key = r["source"] or r["op"]
        e = waste_by_src.setdefault(
            key, {"waste_bytes": 0, "padded_bytes": 0, "n": 0}
        )
        e["waste_bytes"] += w
        e["padded_bytes"] += r["bytes"]
        e["n"] += 1
    top_waste = sorted(
        ({"source": k, **v} for k, v in waste_by_src.items()),
        key=lambda e: -e["waste_bytes"],
    )[:12]
    for e in top_waste:
        e["waste_ms_at_bw"] = round(e["waste_bytes"] / bw / 1e6, 2)
    padding_audit = {
        "total_padded_bytes": total_bytes,
        "total_logical_bytes": total_logical,
        "padding_waste_bytes": total_bytes - total_logical,
        "padding_waste_pct": round(
            100.0 * (total_bytes - total_logical) / max(1, total_bytes), 2
        ),
        "padding_waste_floor_ms_at_bw": round(
            (total_bytes - total_logical) / bw / 1e6, 2
        ),
        "top_waste_by_source": top_waste,
    }

    rows.sort(key=lambda r: -r["t_floor_ms"])
    top_other = [
        {k: (round(v, 3) if isinstance(v, float) else v)
         for k, v in r.items()}
        for r in rows if r["category"] == "other"
    ][: args.top // 2]
    out = {
        "config": config,
        "measured": {
            "step_ms": round(step_ms, 2) if step_ms else None,
            "hbm_bw_gbs": round(bw, 1),
            "hbm_bw_patterns": bw_details,
            "matmul_peak_tflops": round(peak, 1),
        },
        "cost_analysis": ca_dict,
        "ledger": {
            "n_passes": len(rows),
            "total_hbm_bytes": total_bytes,
            "total_mxu_flops": total_flops,
            "floor_ms_sum_of_max": round(floor_ms, 2),
            "floor_ms_at_819gbs_datasheet": round(floor_ms_datasheet, 2),
            "floor_ms_bytes_only": round(floor_bytes_ms, 2),
            "floor_ms_flops_only": round(floor_flops_ms, 2),
            "model": "per top-level HLO instruction: max(padded HBM bytes"
                     " / measured BW, MXU flops / measured peak); padded"
                     " bytes honor TPU tile layouts",
        },
        "by_category": by_cat,
        "padding_audit": padding_audit,
        "other_by_op": other_by_op,
        "top_other_passes": top_other,
        # XLA:TPU's own classic cost model (backend_config estimated_cycles
        # per emitted fusion) — auxiliary: its absolute scale is pessimistic
        # (no DMA/compute overlap assumption), useful for relative ranking
        "xla_classic_cost_model": {
            "total_cycles": total_cycles,
            "ms_at_940mhz": round(total_cycles / 0.94e9 * 1000, 2),
        },
        "gap": {
            "step_vs_floor_ms": round(step_ms - floor_ms, 2)
            if step_ms else None,
            "step_vs_floor_ratio": round(step_ms / floor_ms, 3)
            if step_ms else None,
        },
        "conclusion": {
            "target_step_ms_for_3000_img_s": round(batch / 3000.0 * 1000, 2),
            "statement": _conclusion(
                step_ms, floor_ms, floor_ms_datasheet,
                batch / 3000.0 * 1000
            ),
        },
        "top_passes": [
            {k: (round(v, 3) if isinstance(v, float) else v)
             for k, v in r.items()}
            for r in rows[:args.top]
        ],
    }
    if args.rows_out:
        with open(args.rows_out, "w") as f:
            for r in rows:
                f.write(json.dumps(
                    {k: (round(v, 4) if isinstance(v, float) else v)
                     for k, v in r.items()}
                ) + "\n")
        print(f"wrote {args.rows_out} ({len(rows)} rows)", file=sys.stderr)
    js = json.dumps(out, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(js)
        print(f"wrote {args.out}", file=sys.stderr)
    print(json.dumps({
        "step_ms": out["measured"]["step_ms"],
        "floor_ms": out["ledger"]["floor_ms_sum_of_max"],
        "ratio": out["gap"]["step_vs_floor_ratio"],
        "bw_gbs": out["measured"]["hbm_bw_gbs"],
        "peak_tflops": out["measured"]["matmul_peak_tflops"],
        "n_passes": out["ledger"]["n_passes"],
    }))


if __name__ == "__main__":
    main()
