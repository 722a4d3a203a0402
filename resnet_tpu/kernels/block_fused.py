"""Whole-bottleneck-block fused kernel: ONE pallas_call per residual block.

Round 2 established that per-conv Pallas sites lose in-step to XLA because
every custom-call boundary pays ms-scale fixup cost
(docs/perf_ceiling_r2.md); this kernel amortizes one boundary over the
whole block — the round-3 granularity point between 'fused' (per-conv) and
'fusedxla' (zero custom calls).

Structure (no-projection stride-1 bottleneck; 12 of ResNet-50's 16 blocks):

    stage 0: r = x @ W1 (1x1 reduce)         + [Σr, Σr²] epilogue
    stage 1: u = clip(relu(bn_r(r)))          (affine from the completed
             s = conv3x3(u, W2)                stage-0 sums — BN statistics
                                               are a global-batch reduction,
                                               so stages run batch-complete,
             + [Σs, Σs²]                       stage-major)
    stage 2: v = clip(relu(bn_s(s))); e = v @ W3 + [Σe, Σe²]
    stage 3: out = clip(relu(bn_e(e) + x))    (residual join)

Each stage is a pltpu.emit_pipeline loop over batch tiles (double-buffered
HBM<->VMEM DMA); intermediates r/s/e go through HBM exactly once each
(write by producer, read by consumer) — the same traffic as the per-layer
fused engine, with 1 custom-call boundary instead of 4, and zero standalone
BN-affine or statistics passes (the reference's fusion endpoint,
doBatchNormAndActivate resnet.cu:289, taken to the whole block).

Backward is closed-form XLA (batch-stats BN backward composed through the
three convs; conv cotangents from lax VJPs), with gates recomputed from the
saved raw conv outputs — the resnet_clean.cu recompute economics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _affine_from_sums(sums_ref, gamma_ref, beta_ref, m, eps):
    """(scale, shift) rows from a completed [Σy, Σy²] VMEM accumulator."""
    mean = sums_ref[0, :] / m
    var = jnp.maximum(sums_ref[1, :] / m - mean * mean, 0.0)
    inv = lax.rsqrt(var + eps)
    sc = gamma_ref[0, :] * inv
    sh = beta_ref[0, :] - sc * mean
    return sc, sh


def _clip_relu(v, cap):
    v = jnp.maximum(v, 0.0)
    if cap is not None:
        v = jnp.minimum(v, cap)
    return v


def _block_kernel(
    x_hbm, w1_ref, w2_ref, w3_ref,
    g1_ref, b1_ref, g2_ref, b2_ref, g3_ref, b3_ref,
    out_hbm, r_hbm, s_hbm, e_hbm,
    sums_r_ref, sums_s_ref, sums_e_ref,
    ubuf_ref,
    *, nbs, h, w, w8, c, c4, m, eps, cap, dtype, prec,
):
    """Tensors cross HBM as 2-D (rows, channels) slabs — row blocks of
    nb*h*w are 8-sublane aligned by construction — except r, which the 3x3
    stage needs 4-D: it is stored (n, h, w8, c) with w padded up to the
    sublane tile so its DMA blocks have aligned extents."""
    nb0, nb1, nb2, nb3 = nbs
    n = x_hbm.shape[0] // (h * w)

    sums_r_ref[:] = jnp.zeros_like(sums_r_ref)
    sums_s_ref[:] = jnp.zeros_like(sums_s_ref)
    sums_e_ref[:] = jnp.zeros_like(sums_e_ref)
    # zero the conv buffer once; stage 1 only ever writes the interior,
    # so the halo (and the w8 padding columns) stay zero
    ubuf_ref[:] = jnp.zeros_like(ubuf_ref)

    rows = lambda i: (i, 0)
    tile4 = lambda i: (i, 0, 0, 0)

    # ---- stage 0: 1x1 reduce + stats epilogue
    def s0_body(x_blk, r_blk):
        y = lax.dot_general(
            x_blk[:], w1_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        r_blk[:, :, :w, :] = y.reshape(nb0, h, w, c).astype(dtype)
        if w8 > w:
            r_blk[:, :, w:, :] = jnp.zeros((nb0, h, w8 - w, c), dtype)
        sums_r_ref[0, :] += jnp.sum(y, axis=0)
        sums_r_ref[1, :] += jnp.sum(y * y, axis=0)

    pltpu.emit_pipeline(
        s0_body,
        grid=(n // nb0,),
        in_specs=[pl.BlockSpec((nb0 * h * w, c4), rows)],
        out_specs=[pl.BlockSpec((nb0, h, w8, c), tile4)],
    )(x_hbm, r_hbm)

    # ---- stage 1: bn_r affine+relu prologue, 3x3 conv, stats epilogue
    def s1_body(r_blk, s_blk):
        sc, sh = _affine_from_sums(sums_r_ref, g1_ref, b1_ref, m, eps)
        mrows1 = nb1 * h * w
        u = _clip_relu(
            r_blk[:, :, :w, :].astype(jnp.float32) * sc + sh, cap
        )
        ubuf_ref[:, 1 : h + 1, 1 : w + 1, :] = u.astype(dtype)
        acc = jnp.zeros((mrows1, c), jnp.float32)
        for i in range(3):
            for j in range(3):
                acc += lax.dot_general(
                    ubuf_ref[:, i : i + h, j : j + w, :].reshape(mrows1, c),
                    w2_ref[i, j],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )
        s_blk[:] = acc.astype(dtype)
        sums_s_ref[0, :] += jnp.sum(acc, axis=0)
        sums_s_ref[1, :] += jnp.sum(acc * acc, axis=0)

    pltpu.emit_pipeline(
        s1_body,
        grid=(n // nb1,),
        in_specs=[pl.BlockSpec((nb1, h, w8, c), tile4)],
        out_specs=[pl.BlockSpec((nb1 * h * w, c), rows)],
    )(r_hbm, s_hbm)

    # ---- stage 2: bn_s prologue, 1x1 expand, stats epilogue
    def s2_body(s_blk, e_blk):
        sc, sh = _affine_from_sums(sums_s_ref, g2_ref, b2_ref, m, eps)
        v = _clip_relu(s_blk[:].astype(jnp.float32) * sc + sh, cap)
        y = lax.dot_general(
            v.astype(dtype), w3_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        e_blk[:] = y.astype(dtype)
        sums_e_ref[0, :] += jnp.sum(y, axis=0)
        sums_e_ref[1, :] += jnp.sum(y * y, axis=0)

    pltpu.emit_pipeline(
        s2_body,
        grid=(n // nb2,),
        in_specs=[pl.BlockSpec((nb2 * h * w, c), rows)],
        out_specs=[pl.BlockSpec((nb2 * h * w, c4), rows)],
    )(s_hbm, e_hbm)

    # ---- stage 3: bn_e affine + residual join + clipped relu
    def s3_body(e_blk, x_blk, out_blk):
        sc, sh = _affine_from_sums(sums_e_ref, g3_ref, b3_ref, m, eps)
        a = (
            e_blk[:].astype(jnp.float32) * sc + sh
            + x_blk[:].astype(jnp.float32)
        )
        out_blk[:] = _clip_relu(a, cap).astype(dtype)

    pltpu.emit_pipeline(
        s3_body,
        grid=(n // nb3,),
        in_specs=[
            pl.BlockSpec((nb3 * h * w, c4), rows),
            pl.BlockSpec((nb3 * h * w, c4), rows),
        ],
        out_specs=[pl.BlockSpec((nb3 * h * w, c4), rows)],
    )(e_hbm, x_hbm, out_hbm)


def _pick_nb(n, h, w, per_img_bytes, budget=5 * 1024 * 1024):
    """Images per pipeline step for ONE stage: the largest divisor of n
    with 8-sublane-aligned row blocks (nb*h*w % 8 == 0) whose double-
    buffered working set fits the budget. The budget leaves headroom for
    weights, the conv scratch, accumulators, and Mosaic's ~1.35x stack
    factor inside the DEFAULT 16MB scoped-VMEM limit (a 14MB budget
    measured identical step time but OOM'd without the engine's raised
    scoped-vmem compiler option — tile size beyond ~4 images/step buys
    nothing: the pipeline is DMA-bound, not step-overhead-bound)."""
    def ok(v):
        return n % v == 0 and (v * h * w) % 8 == 0

    best = 0
    for nb in range(1, n + 1):
        if ok(nb) and nb * per_img_bytes <= budget:
            best = nb
    if best == 0:
        for nb in range(1, n + 1):
            if ok(nb):
                return nb  # smallest aligned tiling, budget be damned
        raise ValueError(
            f"no batch tiling with (nb*{h}*{w}) % 8 == 0 divides n={n}"
        )
    return best


def _block_fused_fwd_jnp(x, w1, w2, w3, g1, b1, g2, b2, g3, b3,
                         *, eps, cap, prec):
    """Pure-jnp mirror of the kernel (same fp32-accumulate / bf16-round
    points) — the interpret-mode path: emit_pipeline cannot run under the
    CPU interpreter (it queries the TPU generation), so CPU tests check
    this math and the VJP against autodiff, and tests/test_tpu_parity.py
    checks the compiled kernel against THIS on real hardware."""
    n, h, w_, c4 = x.shape
    c = w1.shape[-1]
    m = float(n * h * w_)
    dt = x.dtype

    def sums_of(yf):
        y2 = yf.reshape(-1, yf.shape[-1])
        return jnp.stack([jnp.sum(y2, axis=0), jnp.sum(y2 * y2, axis=0)])

    def aff(sums, g, b):
        return _affine(sums, g, b, m, eps)

    r_f = lax.dot_general(
        x.reshape(-1, c4).astype(dt), w1.astype(dt),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec,
    ).reshape(n, h, w_, c)
    sums_r = sums_of(r_f)
    r = r_f.astype(dt)

    sc1, sh1 = aff(sums_r, g1, b1)
    u = _clip_relu(r.astype(jnp.float32) * sc1 + sh1, cap).astype(dt)
    s_f = lax.conv_general_dilated(
        u, w2.astype(dt), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
        precision=prec,
    )
    sums_s = sums_of(s_f)
    s = s_f.astype(dt)

    sc2, sh2 = aff(sums_s, g2, b2)
    v = _clip_relu(s.astype(jnp.float32) * sc2 + sh2, cap).astype(dt)
    e_f = lax.dot_general(
        v.reshape(-1, c), w3.astype(dt),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec,
    ).reshape(n, h, w_, c4)
    sums_e = sums_of(e_f)
    e = e_f.astype(dt)

    sc3, sh3 = aff(sums_e, g3, b3)
    out = _clip_relu(
        e.astype(jnp.float32) * sc3 + sh3 + x.astype(jnp.float32), cap
    ).astype(dt)
    return out, r, s, e, sums_r, sums_s, sums_e


def _block_fused_fwd_raw(x, w1, w2, w3, g1, b1, g2, b2, g3, b3,
                         *, eps, cap, prec, interpret):
    if interpret:
        return _block_fused_fwd_jnp(
            x, w1, w2, w3, g1, b1, g2, b2, g3, b3, eps=eps, cap=cap,
            prec=prec,
        )
    n, h, w_, c4 = x.shape
    c = w1.shape[-1]
    assert c % 128 == 0, (
        "compiled path needs the interior width pre-padded to the 128-lane"
        " tile (use _pad_interior)"
    )
    m = float(n * h * w_)
    w8 = ((w_ + 7) // 8) * 8  # r's storage W, sublane-tile aligned
    mtot = n * h * w_
    it = x.dtype.itemsize
    hw = h * w_
    # per-stage double-buffered working set per image (bytes)
    nb0 = _pick_nb(n, h, w_, 2 * (hw * c4 + h * w8 * c) * it)
    nb1 = _pick_nb(n, h, w_, (2 * (h * w8 * c + hw * c)
                              + (h + 2) * (((w_ + 2 + 7) // 8) * 8) * c) * it)
    nb2 = _pick_nb(n, h, w_, 2 * (hw * c + hw * c4) * it)
    nb3 = _pick_nb(n, h, w_, 6 * hw * c4 * it)
    row = lambda v: jnp.asarray(v, jnp.float32).reshape(1, -1)

    kernel = functools.partial(
        _block_kernel, nbs=(nb0, nb1, nb2, nb3), h=h, w=w_, w8=w8, c=c,
        c4=c4, m=m, eps=eps, cap=cap, dtype=x.dtype, prec=prec,
    )
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    anys = lambda: pl.BlockSpec(memory_space=pltpu.ANY)
    out2, r4, s2, e2, sums_r, sums_s, sums_e = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[anys()] + [vmem()] * 9,
        out_specs=(
            anys(), anys(), anys(), anys(), vmem(), vmem(), vmem(),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((mtot, c4), x.dtype),       # out (rows)
            jax.ShapeDtypeStruct((n, h, w8, c), x.dtype),    # r (W-padded)
            jax.ShapeDtypeStruct((mtot, c), x.dtype),        # s (rows)
            jax.ShapeDtypeStruct((mtot, c4), x.dtype),       # e (rows)
            jax.ShapeDtypeStruct((2, c), jnp.float32),
            jax.ShapeDtypeStruct((2, c), jnp.float32),
            jax.ShapeDtypeStruct((2, c4), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((nb1, h + 2, ((w_ + 2 + 7) // 8) * 8, c), x.dtype)
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w_ * (c4 * c + 9 * c * c + c * c4),
            bytes_accessed=n * h * w_ * (4 * c4 + 2 * c) * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(
        x.reshape(mtot, c4),
        w1.astype(x.dtype), w2.astype(x.dtype), w3.astype(x.dtype),
        row(g1), row(b1), row(g2), row(b2), row(g3), row(b3),
    )
    out = out2.reshape(n, h, w_, c4)
    r = r4[:, :, :w_, :] if w8 > w_ else r4
    s = s2.reshape(n, h, w_, c)
    e = e2.reshape(n, h, w_, c4)
    return out, r, s, e, sums_r, sums_s, sums_e


def bn_stats_from_sums(sums, m):
    """(mean, biased var) from [Σy, Σy²] (fp32)."""
    mean = sums[0] / m
    var = jnp.maximum(sums[1] / m - mean * mean, 0.0)
    return mean, var


def _bn_bwd(da, y, gamma, sums, m, eps, dsums):
    """Closed-form batch-stats BN backward for a = bn(y) given da (fp32).

    Standard two-reduction form (the math of resnet_clean.cu:785-905):
      dgamma = Σ da·ŷ, dbeta = Σ da,
      dy = γ/σ · (da − (dbeta + ŷ·dgamma)/m)
    dsums folds the [Σy, Σy²] output cotangents into dy (d(Σy)/dy = 1,
    d(Σy²)/dy = 2y); they are zero in training, where stats are aux.
    """
    mean, var = bn_stats_from_sums(sums, m)
    inv = lax.rsqrt(var + jnp.float32(eps))
    yf = y.astype(jnp.float32)
    yhat = (yf - mean) * inv
    daf = da.astype(jnp.float32)
    dgamma = jnp.sum(daf * yhat, axis=(0, 1, 2))
    dbeta = jnp.sum(daf, axis=(0, 1, 2))
    sc = gamma.astype(jnp.float32) * inv
    dy = sc * (daf - (dbeta + yhat * dgamma) / m)
    if dsums is not None:
        dy = dy + dsums[0].astype(jnp.float32) + 2.0 * yf * dsums[1].astype(
            jnp.float32
        )
    # cotangents materialize in the forward dtype (autodiff's convention —
    # fp32 intermediates here measured +2x backward HBM traffic)
    return dy.astype(y.dtype), dgamma, dbeta


def _affine(sums, gamma, beta, m, eps):
    mean, var = bn_stats_from_sums(sums, m)
    inv = lax.rsqrt(var + jnp.float32(eps))
    sc = gamma.astype(jnp.float32) * inv
    sh = beta.astype(jnp.float32) - sc * mean
    return sc, sh


def _pad_interior(w1, w2, w3, g1, b1, g2, b2):
    """Zero-pad the block's interior width C up to the 128-lane tile
    (stage-0 blocks have C=64; Mosaic pipeline DMA needs 128-aligned lane
    extents). Zero weights + zero gamma/beta keep the padded channels
    EXACTLY zero through every stage — forward values are untouched and
    padded parameter gradients are analytically zero (sliced off at the
    end); the padded activations stay in the backward residuals so no
    full-batch slice copy is ever paid."""
    c = w1.shape[-1]
    cp = ((c + 127) // 128) * 128
    if cp == c:
        return (w1, w2, w3, g1, b1, g2, b2), c
    pc = cp - c
    return (
        jnp.pad(w1, ((0, 0), (0, pc))),
        jnp.pad(w2, ((0, 0), (0, 0), (0, pc), (0, pc))),
        jnp.pad(w3, ((0, pc), (0, 0))),
        jnp.pad(jnp.asarray(g1, jnp.float32), (0, pc)),
        jnp.pad(jnp.asarray(b1, jnp.float32), (0, pc)),
        jnp.pad(jnp.asarray(g2, jnp.float32), (0, pc)),
        jnp.pad(jnp.asarray(b2, jnp.float32), (0, pc)),
    ), c


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13))
def block_fused(x, w1, w2, w3, g1, b1, g2, b2, g3, b3,
                eps, cap, precision, interpret):
    """One-pallas_call bottleneck block (stride 1, identity shortcut).

    x: (N,H,W,4C) activated block input; w1: (4C,C); w2: (3,3,C,C);
    w3: (C,4C); g/b: BN gamma/beta per conv. Returns
    (out, sums_r, sums_s, sums_e) where sums = [Σy, Σy²] per channel (fp32)
    of each raw conv output — the Cache_BatchNorm role (resnet.h:90-97).
    """
    (w1p, w2p, w3p, g1p, b1p, g2p, b2p), c_real = _pad_interior(
        w1, w2, w3, g1, b1, g2, b2
    )
    from ..ops.conv import _PRECISION

    out, _r, _s, _e, sums_r, sums_s, sums_e = _block_fused_fwd_raw(
        x, w1p, w2p, w3p, g1p, b1p, g2p, b2p, g3, b3,
        eps=eps, cap=cap, prec=_PRECISION[precision], interpret=interpret,
    )
    return out, sums_r[:, :c_real], sums_s[:, :c_real], sums_e


def _block_fused_vjp_fwd(x, w1, w2, w3, g1, b1, g2, b2, g3, b3,
                         eps, cap, precision, interpret):
    (w1p, w2p, w3p, g1p, b1p, g2p, b2p), c_real = _pad_interior(
        w1, w2, w3, g1, b1, g2, b2
    )
    from ..ops.conv import _PRECISION

    out, r, s, e, sums_r, sums_s, sums_e = _block_fused_fwd_raw(
        x, w1p, w2p, w3p, g1p, b1p, g2p, b2p, g3, b3,
        eps=eps, cap=cap, prec=_PRECISION[precision], interpret=interpret,
    )
    res = (x, r, s, e, out, sums_r, sums_s, sums_e,
           w1p, w2p, w3p, g1p, b1p, g2p, b2p, g3, b3, c_real)
    return (out, sums_r[:, :c_real], sums_s[:, :c_real], sums_e), res


def _block_fused_vjp_bwd(eps, cap, precision, interpret, res, cts):
    from ..ops.conv import _PRECISION

    (x, r, s, e, out, sums_r, sums_s, sums_e,
     w1, w2, w3, g1, b1, g2, b2, g3, b3, c_real) = res
    dout, dsr_ct, dss_ct, dse_ct = cts
    cpad = w1.shape[-1] - c_real
    if cpad:
        # sums cotangents arrive at the real width; the padded-channel
        # contribution is zero by construction
        dsr_ct = jnp.pad(dsr_ct, ((0, 0), (0, cpad)))
        dss_ct = jnp.pad(dss_ct, ((0, 0), (0, cpad)))
    prec = _PRECISION[precision]
    n, h, w_, c4 = x.shape
    c = w1.shape[-1]
    m = float(n * h * w_)
    dt = x.dtype

    def dot(a, b):
        return lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    def dot_tn(a, b):
        # aᵀ @ b with contraction over rows
        return lax.dot_general(
            a, b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    # ---- join: out = clip(relu(bn_e(e) + x))
    outf = out.astype(jnp.float32)
    gate = (outf > 0) if cap is None else (outf > 0) & (outf < cap)
    g = (dout.astype(jnp.float32) * gate).astype(dt)
    de, dg3, db3 = _bn_bwd(g, e, g3, sums_e, m, eps, dse_ct)
    # identity-shortcut branch of dx (the reference's toAdd accumulation,
    # resnet_cudnn.cu:1531-1536)
    dx_res = g

    # ---- expand 1x1: e = v @ W3, v = clip(relu(bn_s(s)))
    sc2, sh2 = _affine(sums_s, g2, b2, m, eps)
    v_pre = s.astype(jnp.float32) * sc2 + sh2
    gate_v = (v_pre > 0) if cap is None else (v_pre > 0) & (v_pre < cap)
    v = _clip_relu(v_pre, cap).astype(dt)
    dw3 = dot_tn(v.reshape(-1, c), de.reshape(-1, c4)).astype(w3.dtype)
    dv = dot(de.reshape(-1, c4), w3.astype(dt).T).reshape(n, h, w_, c)
    da2 = (dv * gate_v).astype(dt)
    ds, dg2, db2 = _bn_bwd(da2, s, g2, sums_s, m, eps, dss_ct)

    # ---- spatial 3x3: s = conv(u, W2), u = clip(relu(bn_r(r)))
    sc1, sh1 = _affine(sums_r, g1, b1, m, eps)
    u_pre = r.astype(jnp.float32) * sc1 + sh1
    gate_u = (u_pre > 0) if cap is None else (u_pre > 0) & (u_pre < cap)
    u = _clip_relu(u_pre, cap).astype(dt)
    dn = ("NHWC", "HWIO", "NHWC")

    def conv3(u_, w_):
        return lax.conv_general_dilated(
            u_, w_, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
            precision=prec,
        )

    w2_hwio = w2.astype(dt)
    _, conv_vjp = jax.vjp(conv3, u, w2_hwio)
    du, dw2 = conv_vjp(ds)
    dw2 = dw2.astype(w2.dtype)
    da1 = (du.astype(jnp.float32) * gate_u).astype(dt)
    dr, dg1, db1 = _bn_bwd(da1, r, g1, sums_r, m, eps, dsr_ct)

    # ---- reduce 1x1: r = x @ W1
    dw1 = dot_tn(x.reshape(-1, c4), dr.reshape(-1, c)).astype(w1.dtype)
    dx_conv = dot(dr.reshape(-1, c), w1.astype(dt).T).reshape(n, h, w_, c4)
    dx = (dx_res.astype(jnp.float32) + dx_conv).astype(x.dtype)

    if cpad:
        dw1 = dw1[:, :c_real]
        dw2 = dw2[:, :, :c_real, :c_real]
        dw3 = dw3[:c_real, :]
        dg1, db1 = dg1[:c_real], db1[:c_real]
        dg2, db2 = dg2[:c_real], db2[:c_real]
    return (
        dx, dw1, dw2, dw3,
        dg1.astype(jnp.float32), db1.astype(jnp.float32),
        dg2.astype(jnp.float32), db2.astype(jnp.float32),
        dg3.astype(g3.dtype), db3.astype(b3.dtype),
    )


block_fused.defvjp(_block_fused_vjp_fwd, _block_fused_vjp_bwd)
