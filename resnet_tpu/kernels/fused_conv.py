"""Fused convolution block ops: prologue-BN-apply + conv + stats epilogue.

The HBM roofline, not the MXU, bounds this model's step time: measured on
v5e, the standalone batch-stats pass alone costs ~40% of the forward
(47ms -> 28ms when stats are removed). The reference hit the same wall in
CUDA and answered with fused kernels (doBatchNormAndActivate fuses
stats+affine+ReLU, resnet.cu:289; the clean variant recomputes rather than
re-reads, resnet_clean.cu:656). The TPU answer fuses harder, around the
convs themselves:

  fused_conv(x, w, scale, shift) -> (y, sums)
    1. prologue: u = relu(x * scale + shift) applied to the VMEM-resident
       input tile — the *previous* layer's BN affine rides the conv's
       input read, so no standalone normalize pass ever touches HBM.
    2. conv: k*k tap matmuls on the MXU (implicit GEMM, conv.py).
    3. epilogue: per-channel [sum(y), sum(y^2)] accumulate in VMEM while
       y is written — the *current* layer's BN statistics come free with
       the conv's output write, so no standalone stats pass either.

  fused_join(e, scale_e, shift_e, r, scale_r, shift_r)
       = relu(bn_e(e) + bn_r(r)) — the residual join applying both
       pending BN affines in one pass (the identity path passes
       scale=1, shift=0).

Net effect: every activation tensor is written once by its producer and
read once by its consumer. BN math lives in plain jnp on (2, C) sums, so
autodiff of mean/var/scale/shift comes free; only the conv ops carry
custom VJPs (recompute strategy: u is rebuilt from x in backward rather
than stored, exactly the resnet_clean.cu economics).

Used by ExecutionConfig(kernels='fused') via models/fused_resnet.py.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.padding import reference_padding


def _fused_conv_kernel(
    x_ref, w_ref, scale_ref, shift_ref, o_ref, sums_ref, acc_ref, *scratch,
    kh, kw, stride, ho, wo, nb, prologue, relu, cap, valid,
):
    xbuf_ref = scratch[0] if scratch else None  # big-kernel tap buffer only
    """Grid (co_tiles, n/nb): image-batch innermost so the sums block stays
    resident in VMEM across the accumulation. nb images per step keeps the
    tap matmuls MXU-sized even at 7x7 spatial (M = nb*ho*wo rows)."""
    step = pl.program_id(1)
    s = stride
    cin = x_ref.shape[3]

    @pl.when(step == 0)
    def _():
        sums_ref[:] = jnp.zeros_like(sums_ref)

    x = x_ref[:].astype(jnp.float32)
    if prologue:
        x = x * scale_ref[0, :] + shift_ref[0, :]
        if relu:
            x = jnp.maximum(x, 0.0)
            if cap is not None:  # clipped ReLU (resnet_cudnn_fast.cu:1143)
                x = jnp.minimum(x, cap)
        # the affine must not leak into the zero padding (shift != 0 would
        # turn pad zeros into relu(shift)); mask the halo back to 0
        r_lo, r_hi, c_lo, c_hi = valid
        hp_, wp_ = x.shape[1], x.shape[2]
        rows = jax.lax.broadcasted_iota(jnp.int32, (1, hp_, wp_, 1), 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, hp_, wp_, 1), 2)
        ok = (rows >= r_lo) & (rows < r_hi) & (cols >= c_lo) & (cols < c_hi)
        x = jnp.where(ok, x, 0.0)
    x = x.astype(o_ref.dtype)

    acc_ref[:] = jnp.zeros_like(acc_ref)

    def tap(win, wt):
        if s > 1:
            win = win.reshape(nb, ho, s, wo, s, cin)[:, :, 0, :, 0, :]
        acc_ref[:] += jnp.dot(
            win.reshape(nb * ho * wo, cin), wt,
            preferred_element_type=jnp.float32,
        )

    if kh * kw <= 9:
        # small kernels: unroll (best scheduling)
        for i in range(kh):
            for j in range(kw):
                tap(x[:, i : i + ho * s, j : j + wo * s, :], w_ref[i, j])
    else:
        # large kernels (7x7 stem): loop the H taps, unroll the W taps —
        # full 49-tap unrolling OOM-killed the XLA compile helper, and
        # Mosaic requires static (tile-aligned) offsets on the sublane (W)
        # dim, so only the H offset may be a loop index
        def tap_row(i, _):
            for j in range(kw):
                win = xbuf_ref[:, pl.ds(i, ho * s), j : j + wo * s, :]
                wt = w_ref[pl.ds(i, 1), j].reshape(cin, w_ref.shape[3])
                tap(win, wt)
            return 0

        xbuf_ref[:] = x
        jax.lax.fori_loop(0, kh, tap_row, 0)
    y = acc_ref[:]
    o_ref[:] = y.reshape(nb, ho, wo, o_ref.shape[3]).astype(o_ref.dtype)
    sums_ref[0, :] += jnp.sum(y, axis=0)
    sums_ref[1, :] += jnp.sum(y * y, axis=0)


def _fused_conv_raw(
    x, w, scale, shift, *, stride, padding, prologue, relu, cap=None,
    interpret=False,
):
    n, h, wdt, cin = x.shape
    kh, kw, _, cout = w.shape
    (ph_lo, ph_hi), (pw_lo, pw_hi) = padding
    ho = (h + ph_lo + ph_hi - kh) // stride + 1
    wo = (wdt + pw_lo + pw_hi - kw) // stride + 1
    need_h = (kh - 1) + ho * stride - (h + ph_lo + ph_hi)
    need_w = (kw - 1) + wo * stride - (wdt + pw_lo + pw_hi)
    xp = jnp.pad(
        x,
        ((0, 0), (ph_lo, ph_hi + max(0, need_h)),
         (pw_lo, pw_hi + max(0, need_w)), (0, 0)),
    )
    hp, wp = xp.shape[1], xp.shape[2]

    # images per grid step: target >= ~2048 matmul rows, bounded by VMEM
    big_kernel = kh * kw > 9
    el = x.dtype.itemsize

    def vmem_need(nb, bco):
        # in/out/w blocks are double-buffered across grid steps by the
        # Mosaic pipeline; acc/xbuf scratch are single instances
        xb = 2 * nb * hp * wp * cin * el
        wb = 2 * kh * kw * cin * bco * el
        ob = 2 * nb * ho * wo * bco * el
        ac = 4 * nb * ho * wo * bco  # fp32 accumulator
        xbuf = nb * hp * wp * cin * el if big_kernel else 0
        return xb + wb + ob + ac + xbuf

    # Mosaic's real stack allocation runs ~1.35x this estimate (measured on
    # the 2x2x2048->1024 phase-plane conv: est 12.9MB -> 17.44MB actual), so
    # budget well under the 16MB scoped-vmem default; if even one image per
    # step overflows, shrink the output-channel tile before giving up
    BUDGET = 10 * 1024 * 1024

    def pick_nb(bco):
        nb = max(1, min(n, 2048 // (ho * wo)))
        while n % nb:
            nb -= 1
        while nb > 1 and vmem_need(nb, bco) > BUDGET:
            nb = max(1, nb // 2)
            while n % nb:
                nb -= 1
        return nb

    block_co = min(cout, 256)
    nb = pick_nb(block_co)
    while block_co > 128 and vmem_need(nb, block_co) > BUDGET:
        block_co //= 2
        nb = pick_nb(block_co)

    copad = (-cout) % block_co
    wpad = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, copad))) if copad else w
    coutp = cout + copad
    scale_row = jnp.broadcast_to(
        jnp.asarray(scale, jnp.float32).reshape(1, -1), (1, cin)
    )
    shift_row = jnp.broadcast_to(
        jnp.asarray(shift, jnp.float32).reshape(1, -1), (1, cin)
    )

    out, sums = pl.pallas_call(
        functools.partial(
            _fused_conv_kernel, kh=kh, kw=kw, stride=stride, ho=ho, wo=wo,
            nb=nb, prologue=prologue, relu=relu, cap=cap,
            valid=(ph_lo, ph_lo + h, pw_lo, pw_lo + wdt),
        ),
        grid=(coutp // block_co, n // nb),
        in_specs=[
            pl.BlockSpec((nb, hp, wp, cin), lambda j, i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kh, kw, cin, block_co), lambda j, i: (0, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((nb, ho, wo, block_co), lambda j, i: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, block_co), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, ho, wo, coutp), x.dtype),
            jax.ShapeDtypeStruct((2, coutp), jnp.float32),
        ),
        scratch_shapes=(
            [pltpu.VMEM((nb * ho * wo, block_co), jnp.float32)]
            # tap buffer only for large (7x7 stem) kernels — allocating it
            # unconditionally doubled input VMEM and OOM'd the 16MB scoped
            # budget on the phase-decomposed projection convs
            + ([pltpu.VMEM((nb, hp, wp, cin), x.dtype)] if big_kernel else [])
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * ho * wo * kh * kw * cin * cout,
            bytes_accessed=(n * hp * wp * cin + n * ho * wo * cout) * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xp, wpad.astype(x.dtype), scale_row, shift_row)
    return out[..., :cout], sums[:, :cout]


def _prologue_bwd_xla(x, du, scale, shift, *, relu, cap=None):
    """(dx, dscale, dshift) for u = relu(x*scale+shift), as plain jnp: XLA
    fuses the gate recompute, dx, and the two sibling channel reductions
    into the surrounding backward — a Pallas kernel here (one existed; see
    git history) is a fusion barrier that costs more than the one fused
    read it saves (measured: every in-step Pallas site boundary runs ~2ms
    of layout/pad fixups at b256, tools/bench_engine_split.py)."""
    xf = x.astype(jnp.float32)
    dv = du.astype(jnp.float32)
    if relu:
        v = xf * jnp.asarray(scale, jnp.float32) + jnp.asarray(shift, jnp.float32)
        gate = (v > 0) if cap is None else (v > 0) & (v < cap)
        dv = jnp.where(gate, dv, 0.0)
    axes = tuple(range(x.ndim - 1))
    dx = (dv * jnp.asarray(scale, jnp.float32)).astype(x.dtype)
    dscale = jnp.sum(dv * xf, axis=axes)
    dshift = jnp.sum(dv, axis=axes)
    return dx, dscale, dshift


def _resolve_pad(x, w, stride, padding):
    if padding is not None:
        return padding
    return (
        reference_padding(x.shape[1], w.shape[0], stride),
        reference_padding(x.shape[2], w.shape[1], stride),
    )


def _phase_decompose(x, w, stride):
    """Rewrite a strided conv as a dense stride-1 conv on phase planes.

    Mosaic rejects the in-kernel strided reshape-slice a stride-2 window
    gather needs (strided offsets on the tiled W dim), so the decimation
    moves OUTSIDE the kernel: the input splits into stride^2 phase planes
    stacked on the channel dim (z[...,(pa*s+pb)*Ci:] = x[pa::s, pb::s]),
    and each original tap (i,j) lands in the phase-matched channel block of
    a smaller dense kernel at offset floor((i-hk)/s). out = conv_s1(z, w4)
    with asymmetric padding — exactly the reference's centered-window
    stride geometry (doConvolution, resnet.cu:123-152), space-to-depth
    style. Returns (z, w4, padding, per-phase channel tiling factor).
    """
    n, h, wd, cin = x.shape
    kh, kw, _, co = w.shape
    s = stride
    assert h % s == 0 and wd % s == 0, "phase decomposition needs dim % stride == 0"
    hk_h, hk_w = kh // 2, kw // 2

    def geom(hk):
        d_lo = -((hk + s - 1) // s)  # floor(-hk/s)
        d_hi = hk // s
        return d_lo, d_hi - d_lo + 1

    d_lo_h, taps_h = geom(hk_h)
    d_lo_w, taps_w = geom(hk_w)

    z = jnp.concatenate(
        [x[:, a::s, b::s, :] for a in range(s) for b in range(s)], axis=-1
    )
    w4 = jnp.zeros((taps_h, taps_w, s * s * cin, co), w.dtype)
    for i in range(kh):
        for j in range(kw):
            ih, jw = i - hk_h, j - hk_w
            pa, pb = ih % s, jw % s
            r_h = (ih - pa) // s - d_lo_h
            r_w = (jw - pb) // s - d_lo_w
            blk = (pa * s + pb) * cin
            w4 = w4.at[r_h, r_w, blk : blk + cin, :].set(w[i, j])
    padding = ((-d_lo_h, taps_h - 1 + d_lo_h), (-d_lo_w, taps_w - 1 + d_lo_w))
    return z, w4, padding, s * s


def _fused_conv_any_stride(
    x, w, scale, shift, *, stride, prologue, relu, cap, interpret
):
    """Forward dispatch: stride 1 runs the kernel directly; stride > 1 goes
    through the phase decomposition (dense s1 conv, same output and the
    same [sum(y), sum(y^2)] epilogue)."""
    if stride == 1:
        padding = _resolve_pad(x, w, 1, None)
        return _fused_conv_raw(
            x, w, scale, shift, stride=1, padding=padding,
            prologue=prologue, relu=relu, cap=cap, interpret=interpret,
        )
    z, w4, padding, tile = _phase_decompose(x, w, stride)
    cin = x.shape[-1]

    def per_phase(v):  # broadcast (1,)-placeholders to cin, then tile
        vv = jnp.broadcast_to(jnp.asarray(v, jnp.float32).reshape(-1), (cin,))
        return jnp.tile(vv, tile)

    scale4 = per_phase(scale)
    shift4 = per_phase(shift)
    return _fused_conv_raw(
        z, w4, scale4, shift4, stride=1, padding=padding,
        prologue=prologue, relu=relu, cap=cap, interpret=interpret,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def fused_conv(
    x, w, scale, shift, stride=1, padding=None, prologue=True, relu=True,
    interpret=False, cap=None,
):
    """(y, sums): y = conv(relu(x*scale+shift), w); sums = [Σy, Σy²] (2, Co).

    With prologue=False, scale/shift are ignored (pass ones/zeros).
    sums are per-channel over batch and space, for the consumer's BN.
    cap clips the prologue ReLU (the fast variant's clipped activation,
    resnet_cudnn_fast.cu:1143-1145).
    """
    if padding is not None:
        # explicit padding: direct kernel path (strided window gather in
        # kernel — interpret-mode only for stride > 1)
        return _fused_conv_raw(
            x, w, scale, shift, stride=stride, padding=padding,
            prologue=prologue, relu=relu, cap=cap, interpret=interpret,
        )
    return _fused_conv_any_stride(
        x, w, scale, shift, stride=stride,
        prologue=prologue, relu=relu, cap=cap, interpret=interpret,
    )


def _fused_conv_fwd(x, w, scale, shift, stride, padding, prologue, relu,
                    interpret, cap):
    if padding is not None:
        y, sums = _fused_conv_raw(
            x, w, scale, shift, stride=stride, padding=padding,
            prologue=prologue, relu=relu, cap=cap, interpret=interpret,
        )
    else:
        y, sums = _fused_conv_any_stride(
            x, w, scale, shift, stride=stride,
            prologue=prologue, relu=relu, cap=cap, interpret=interpret,
        )
    return (y, sums), (x, w, scale, shift, y)


def _conv_contract_bwd(u, x, w, scale, shift, y, dy, dsums, *, stride,
                       padding, prologue, relu, cap, precision=None):
    """Shared closed-form backward of the (prologue, conv, stats-epilogue)
    contract for both the Pallas fused conv and the XLA chain.

    Stats cotangents fold into dy (d(Σy)/dy = 1, d(Σy²)/dy = 2y); conv
    cotangents come from XLA's conv VJP (guaranteed consistent with the
    Pallas forward, which matches lax conv semantics bit-for-bit in fp32);
    the prologue's (dx, dscale, dshift) is one fused jnp pass.
    """
    from jax import lax

    yf = y.astype(jnp.float32)
    dy_tot = (
        dy.astype(jnp.float32)
        + dsums[0].astype(jnp.float32)
        + 2.0 * dsums[1].astype(jnp.float32) * yf
    ).astype(u.dtype)

    dn = ("NHWC", "HWIO", "NHWC")

    def conv_ref(u_, w_):
        return lax.conv_general_dilated(
            u_, w_, (stride, stride), padding, dimension_numbers=dn,
            precision=precision,
        )

    _, conv_vjp = jax.vjp(conv_ref, u, w.astype(u.dtype))
    du, dw = conv_vjp(dy_tot)
    dw = dw.astype(w.dtype)

    if prologue:
        dx, dscale, dshift = _prologue_bwd_xla(
            x, du, scale, shift, relu=relu, cap=cap
        )
        dscale = dscale.astype(jnp.asarray(scale).dtype)
        dshift = dshift.astype(jnp.asarray(shift).dtype)
    else:
        dx = du.astype(x.dtype)
        dscale = jnp.zeros_like(jnp.asarray(scale))
        dshift = jnp.zeros_like(jnp.asarray(shift))
    return dx, dw, dscale, dshift


def _fused_conv_bwd(stride, padding, prologue, relu, interpret, cap, res, cts):
    x, w, scale, shift, y = res
    dy, dsums = cts
    padding = _resolve_pad(x, w, stride, padding)

    # recompute u (resnet_clean recompute strategy; elementwise, XLA-fused
    # — the Pallas engine trades this recompute for not storing u)
    if prologue:
        v = x.astype(jnp.float32) * scale.astype(jnp.float32) + shift.astype(
            jnp.float32
        )
        u = jnp.maximum(v, 0.0) if relu else v
        if relu and cap is not None:
            u = jnp.minimum(u, cap)
        u = u.astype(x.dtype)
    else:
        u = x
    return _conv_contract_bwd(
        u, x, w, scale, shift, y, dy, dsums, stride=stride, padding=padding,
        prologue=prologue, relu=relu, cap=cap,
    )


fused_conv.defvjp(_fused_conv_fwd, _fused_conv_bwd)


# ------------------------------------------------- XLA chain, custom VJP


def _chain_xla_value(x, w, scale, shift, stride, prologue, relu, cap, prec):
    """XLA realization of the fused_conv contract: prologue BN-apply (XLA
    fuses it into the conv read), autotuned conv, sibling-sum stats on the
    output. Returns (y, sums, u) with sums = [sum(y), sum(y^2)] and u the
    prologue output (saved for backward — unlike the Pallas engine, the
    XLA chain is not memory-constrained, and x stays alive anyway for the
    prologue's dscale/dshift, so saving u costs no extra live memory and
    removes a full elementwise recompute pass per conv in backward)."""
    from ..ops.conv import conv2d

    if prologue:
        u = x.astype(jnp.float32) * jnp.asarray(scale, jnp.float32) + jnp.asarray(
            shift, jnp.float32
        )
        if relu:
            u = jnp.maximum(u, 0.0)
            if cap is not None:
                u = jnp.minimum(u, cap)
        u = u.astype(x.dtype)
    else:
        u = x
    y = conv2d(u, w.astype(x.dtype), stride=stride, layout="NHWC",
               precision=prec)
    yf = y.astype(jnp.float32)
    sums = jnp.stack(
        [jnp.sum(yf, axis=(0, 1, 2)), jnp.sum(yf * yf, axis=(0, 1, 2))]
    )
    return y, sums, u


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def conv_chain_xla(x, w, scale, shift, stride, prologue, relu, cap, prec):
    """fused_conv's contract on pure XLA ops with the closed-form backward.

    Autodiff of the stats path (sums -> mean/var -> next layer's affine)
    measured +18ms/step over the standard engine's backward (fusedxla bwd
    89.4ms vs xla 71.4, tools/bench_engine_split.py) — the moments VJP and
    the stack/unstack chain cost an extra full pass over y. The
    closed-form backward folds the sums cotangents into dy
    (d(sum y)/dy = 1, d(sum y^2)/dy = 2y) and reads the saved u (the
    recompute-u strategy is the Pallas engine's memory trade, pure cost
    here)."""
    y, sums, _ = _chain_xla_value(x, w, scale, shift, stride, prologue,
                                  relu, cap, prec)
    return y, sums


def _chain_xla_fwd(x, w, scale, shift, stride, prologue, relu, cap, prec):
    y, sums, u = _chain_xla_value(x, w, scale, shift, stride, prologue,
                                  relu, cap, prec)
    return (y, sums), (x, w, scale, shift, y, u)


def _chain_xla_bwd(stride, prologue, relu, cap, prec, res, cts):
    from ..ops.conv import _PRECISION

    x, w, scale, shift, y, u = res
    dy, dsums = cts
    return _conv_contract_bwd(
        u, x, w, scale, shift, y, dy, dsums, stride=stride,
        padding=_resolve_pad(x, w, stride, None), prologue=prologue,
        relu=relu, cap=cap,
        # gradient convs at the forward's matmul_precision — defaulting
        # here would silently drop fp32 configs to bf16-pass gradients
        precision=_PRECISION[prec],
    )


conv_chain_xla.defvjp(_chain_xla_fwd, _chain_xla_bwd)


# -------------------------------------------------------------- fused join


def _join_kernel(e_ref, r_ref, se_ref, te_ref, sr_ref, tr_ref, o_ref, *, cap):
    y = (
        e_ref[:].astype(jnp.float32) * se_ref[0, :] + te_ref[0, :]
        + r_ref[:].astype(jnp.float32) * sr_ref[0, :] + tr_ref[0, :]
    )
    y = jnp.maximum(y, 0.0)
    if cap is not None:
        y = jnp.minimum(y, cap)
    o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_join(e, scale_e, shift_e, r, scale_r, shift_r, interpret=False,
               cap=None):
    """relu(bn_e(e) + bn_r(r)) [clipped at cap] — residual join with both
    pending BN affines applied in the same pass (resnet.cu:1717-1723 ran add
    + relu as two kernels after two standalone BN kernels)."""
    return _join_raw(e, scale_e, shift_e, r, scale_r, shift_r, interpret, cap)


def _join_raw(e, scale_e, shift_e, r, scale_r, shift_r, interpret, cap=None):
    shape = e.shape
    c = shape[-1]
    e2 = e.reshape(-1, c)
    r2 = r.reshape(-1, c)
    m = e2.shape[0]
    bm = min(1024, m)
    bc = min(128 * ((c + 127) // 128), 512)
    pm, pc = (-m) % bm, (-c) % bc
    def pad2(t):
        return jnp.pad(t, ((0, pm), (0, pc))) if (pm or pc) else t
    def row(v):
        vv = jnp.asarray(v, jnp.float32).reshape(-1)
        return jnp.pad(vv, (0, pc)).reshape(1, -1) if pc else vv.reshape(1, -1)
    mp, cp = m + pm, c + pc
    tile = pl.BlockSpec((bm, bc), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    rowspec = pl.BlockSpec((1, bc), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_join_kernel, cap=cap),
        grid=(mp // bm, cp // bc),
        in_specs=[tile, tile, rowspec, rowspec, rowspec, rowspec],
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct((mp, cp), e.dtype),
        interpret=interpret,
    )(pad2(e2), pad2(r2), row(scale_e), row(shift_e), row(scale_r), row(shift_r))
    return out[:m, :c].reshape(shape)


def _join_fwd(e, scale_e, shift_e, r, scale_r, shift_r, interpret, cap):
    y = _join_raw(e, scale_e, shift_e, r, scale_r, shift_r, interpret, cap)
    return y, (e, scale_e, shift_e, r, scale_r, shift_r, y)


def _join_bwd(interpret, cap, res, dy):
    e, scale_e, shift_e, r, scale_r, shift_r, y = res
    yf = y.astype(jnp.float32)
    gate = (yf > 0) if cap is None else (yf > 0) & (yf < cap)
    gate = gate.astype(jnp.float32)
    dv = dy.astype(jnp.float32) * gate
    axes = tuple(range(e.ndim - 1))
    de = (dv * jnp.asarray(scale_e, jnp.float32)).astype(e.dtype)
    dr = (dv * jnp.asarray(scale_r, jnp.float32)).astype(r.dtype)
    dse = jnp.sum(dv * e.astype(jnp.float32), axis=axes).astype(
        jnp.asarray(scale_e).dtype
    )
    dte = jnp.sum(dv, axis=axes).astype(jnp.asarray(shift_e).dtype)
    dsr = jnp.sum(dv * r.astype(jnp.float32), axis=axes).astype(
        jnp.asarray(scale_r).dtype
    )
    dtr = jnp.sum(dv, axis=axes).astype(jnp.asarray(shift_r).dtype)
    return de, dse, dte, dr, dsr, dtr


fused_join.defvjp(_join_fwd, _join_bwd)


def bn_affine_from_sums(sums, gamma, beta, m: int, eps: float):
    """(scale, shift) from per-channel [Σy, Σy²] — plain jnp so autodiff
    handles the BN-statistics backward for free."""
    mean = sums[0] / m
    var = jnp.maximum(sums[1] / m - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + jnp.float32(eps))
    scale = gamma.astype(jnp.float32) * inv
    shift = beta.astype(jnp.float32) - scale * mean
    return scale, shift
