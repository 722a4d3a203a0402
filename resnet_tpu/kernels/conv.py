"""Pallas implicit-GEMM 2-D convolution (NHWC).

The TPU counterpart of the reference's direct conv kernels (doConvolution
resnet.cu:109, convolutionDerivInput resnet.cu:166, convolutionDerivWeights
resnet.cu:227) — the kernels whose optimized CUDA versions the reference
author attempted and abandoned ("NOT WORKING", resnet_clean.cu:272-349).

Forward: one grid step per (image, Cout tile). The padded image lives in
VMEM; the kernel loops over the k*k taps, extracts the strided window as a
static reshape-slice (no gather), and accumulates tap matmuls
(Ho*Wo, Cin) @ (Cin, co_tile) in an fp32 VMEM accumulator — convolution as
a sum of k*k GEMMs on the MXU, which is exactly how the hardware wants it.

Backward (custom VJP):
  * grad-input = Pallas conv of the stride-dilated, edge-padded upstream
    grad with the spatially-flipped, in/out-transposed filter (the standard
    transposed-conv identity; dilation/flip are cheap jnp ops, all FLOPs
    stay in the Pallas kernel).
  * grad-filter: per-tap strided window of x (jnp slice) x upstream grad,
    contracted over (N, Ho, Wo) with the Pallas matmul kernel — the same
    decomposition as convolutionDerivWeights' thread-per-(ci,co,kh,kw)
    loop, but batched onto the MXU.

All shapes static; supports any kernel size/stride with the reference's
centered-window geometry (ops/padding.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.padding import reference_padding
from .matmul import _matmul_raw


def _conv_kernel(x_ref, w_ref, o_ref, acc_ref, *, kh, kw, stride, ho, wo):
    acc_ref[:] = jnp.zeros_like(acc_ref)
    s = stride
    cin = x_ref.shape[3]
    for i in range(kh):
        for j in range(kw):
            # strided window x_pad[i : i + ho*s : s, j : j + wo*s : s, :]
            # as static slice + reshape (no strided-gather on TPU)
            win = x_ref[0, i : i + ho * s, j : j + wo * s, :]
            if s > 1:
                win = win.reshape(ho, s, wo, s, cin)[:, 0, :, 0, :]
            win2 = win.reshape(ho * wo, cin)
            acc_ref[:] += jnp.dot(
                win2, w_ref[i, j], preferred_element_type=jnp.float32
            )
    o_ref[0] = acc_ref[:].reshape(ho, wo, o_ref.shape[3]).astype(o_ref.dtype)


def _conv_fwd_impl(
    x: jax.Array,
    w: jax.Array,
    *,
    stride: int,
    padding: Tuple[Tuple[int, int], Tuple[int, int]],
    interpret: bool = False,
) -> jax.Array:
    n, h, wdt, cin = x.shape
    kh, kw, _, cout = w.shape
    (ph_lo, ph_hi), (pw_lo, pw_hi) = padding
    ho = (h + ph_lo + ph_hi - kh) // stride + 1
    wo = (wdt + pw_lo + pw_hi - kw) // stride + 1
    # pad so every in-kernel tap slice [i : i + ho*s] stays in bounds
    need_h = max(kh - 1, stride - 1) + ho * stride - (h + ph_lo + ph_hi) + kh - 1
    need_w = max(kw - 1, stride - 1) + wo * stride - (wdt + pw_lo + pw_hi) + kw - 1
    xp = jnp.pad(
        x,
        (
            (0, 0),
            (ph_lo, ph_hi + max(0, need_h)),
            (pw_lo, pw_hi + max(0, need_w)),
            (0, 0),
        ),
    )
    hp, wp = xp.shape[1], xp.shape[2]

    block_co = min(cout, 256)
    copad = (-cout) % block_co
    wpad = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, copad))) if copad else w
    coutp = cout + copad

    out = pl.pallas_call(
        functools.partial(
            _conv_kernel, kh=kh, kw=kw, stride=stride, ho=ho, wo=wo
        ),
        grid=(n, coutp // block_co),
        in_specs=[
            pl.BlockSpec((1, hp, wp, cin), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kh, kw, cin, block_co), lambda i, j: (0, 0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ho, wo, block_co), lambda i, j: (i, 0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, ho, wo, coutp), x.dtype),
        scratch_shapes=[pltpu.VMEM((ho * wo, block_co), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * ho * wo * kh * kw * cin * cout,
            bytes_accessed=(n * hp * wp * cin + kh * kw * cin * cout
                            + n * ho * wo * cout) * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xp, wpad.astype(x.dtype))
    return out[..., :cout]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def conv2d_pallas(x, w, stride=1, padding=None, interpret=False):
    """NHWC conv, reference-centered windows by default. Differentiable."""
    padding = _resolve_padding(x, w, stride, padding)
    return _conv_fwd_impl(x, w, stride=stride, padding=padding, interpret=interpret)


def _resolve_padding(x, w, stride, padding):
    if padding is not None:
        return padding
    return (
        reference_padding(x.shape[1], w.shape[0], stride),
        reference_padding(x.shape[2], w.shape[1], stride),
    )


def _conv_fwd(x, w, stride, padding, interpret):
    padding = _resolve_padding(x, w, stride, padding)
    y = _conv_fwd_impl(x, w, stride=stride, padding=padding, interpret=interpret)
    return y, (x, w)


def _dilate(g, s):
    """Insert s-1 zeros between spatial elements (transposed-conv dilation)."""
    if s == 1:
        return g
    n, h, w, c = g.shape
    z = jnp.zeros((n, h, s, w, s, c), g.dtype)
    z = z.at[:, :, 0, :, 0, :].set(g)
    return z.reshape(n, h * s, w * s, c)[:, : (h - 1) * s + 1, : (w - 1) * s + 1, :]


def _conv_bwd(stride, padding, interpret, res, g):
    x, w = res
    n, h, wdt, cin = x.shape
    kh, kw, _, cout = w.shape
    (ph_lo, ph_hi), (pw_lo, pw_hi) = _resolve_padding(x, w, stride, padding)
    ho, wo = g.shape[1], g.shape[2]

    # ---- grad wrt input: conv(dilate(g), flip(w)^T), full padding
    gd = _dilate(g, stride)
    w_flip = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)  # (kh,kw,cout,cin)
    # output position h_in requires pad so that windows align:
    # dx = conv(gd, w_flip) with padding (kh-1-ph_lo, ...) cropped to (h, w)
    dx_full = _conv_fwd_impl(
        gd,
        w_flip.astype(g.dtype),
        stride=1,
        padding=((kh - 1 - ph_lo, kh - 1 - ph_hi + (h + ph_lo + ph_hi - kh) % stride),
                 (kw - 1 - pw_lo, kw - 1 - pw_hi + (wdt + pw_lo + pw_hi - kw) % stride)),
        interpret=interpret,
    )
    dx = dx_full[:, :h, :wdt, :].astype(x.dtype)

    # ---- grad wrt filter: per-tap strided window of x, contracted with g
    xp = jnp.pad(x, ((0, 0), (ph_lo, ph_hi), (pw_lo, pw_hi), (0, 0)))
    hp, wp = xp.shape[1], xp.shape[2]
    # guarantee slice bounds for the largest tap
    pad_h = max(0, (kh - 1) + (ho - 1) * stride + 1 - hp)
    pad_w = max(0, (kw - 1) + (wo - 1) * stride + 1 - wp)
    if pad_h or pad_w:
        xp = jnp.pad(xp, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    g2 = g.reshape(n * ho * wo, cout).astype(jnp.float32)
    taps = []
    for i in range(kh):
        row = []
        for j in range(kw):
            win = jax.lax.slice(
                xp,
                (0, i, j, 0),
                (n, i + (ho - 1) * stride + 1, j + (wo - 1) * stride + 1, cin),
                (1, stride, stride, 1),
            )
            x2 = win.reshape(n * ho * wo, cin).astype(jnp.float32)
            # (cin, M) @ (M, cout) on the Pallas MXU matmul
            row.append(_matmul_raw(x2.T, g2, interpret=interpret))
        taps.append(jnp.stack(row))
    dw = jnp.stack(taps).astype(w.dtype)  # (kh, kw, cin, cout)
    return dx, dw


conv2d_pallas.defvjp(_conv_fwd, _conv_bwd)
