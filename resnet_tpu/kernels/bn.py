"""Fused batch-norm (+ReLU) in Pallas, with a hand-written backward.

Forward replaces the reference's doBatchNormAndActivate (resnet.cu:289-343,
one thread per channel looping serially over N*H*W — the slowest kernel in
the naive variant) and its lean split getMeansAndVars +
doRecomputeBatchNormAndActivate (resnet_clean.cu:620-756). Here:

  stats kernel : sequential grid over row-blocks accumulating per-channel
                 (sum, sum of squares) in VMEM scratch -> (mean, var)
  apply kernel : elementwise y = [relu](x * scale + shift) with the affine
                 folded into one multiply-add per element

Backward replaces the three-kernel reduction pipeline of resnet_clean.cu
(batchNormDerivReduction:785 / finalizeReductionBatchNormDeriv:856 /
computeBatchNormInputDerivFromReduction:888) with two Pallas calls using the
same fused-form math:

  reduce kernel: per-channel s1 = sum(dy_g), s2 = sum(dy_g * x_hat), where
                 dy_g is the upstream grad gated by the recomputed ReLU mask
                 (recompute strategy — only (mean, inv_std) are cached,
                 like resnet_clean.h:90-95)
  dx kernel    : dx = gamma * inv_std * (dy_g - s1/M - x_hat * s2/M)
                 and dgamma = s2, dbeta = s1.

Operates on 2-D (rows, channels) = (N*H*W, C); ops/dispatch handles the
NHWC reshape (NHWC is the TPU-preferred layout: C maps to lanes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _block_c(c: int) -> int:
    if c <= 128:
        # sub-lane-width channel counts (e.g. ResNet's 64): take the tensor
        # as-is — jnp.pad to 128 lanes would cost a full HBM copy of the
        # activation before the kernel even runs
        return c
    return min(128 * ((c + 127) // 128), 512)


def _block_m(m: int) -> int:
    # 512 rows keeps (x, dy, dx) fp32 tiles + double buffering well inside
    # the 16MB VMEM budget at bc=512
    return min(512, max(8, m))


def _pad2(x, bm, bc):
    pm = (-x.shape[0]) % bm
    pc = (-x.shape[1]) % bc
    if pm or pc:
        x = jnp.pad(x, ((0, pm), (0, pc)))
    return x


def _pad_row(v, bc):
    pc = (-v.shape[0]) % bc
    if pc:
        v = jnp.pad(v, (0, pc))
    return v.reshape(1, -1)


# ---------------------------------------------------------------- stats


def _stats_kernel(x_ref, out_ref, acc_ref, *, n_m: int, m_true: int):
    @pl.when(pl.program_id(1) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xf = x_ref[:].astype(jnp.float32)
    acc_ref[0, :] += jnp.sum(xf, axis=0)
    acc_ref[1, :] += jnp.sum(xf * xf, axis=0)

    @pl.when(pl.program_id(1) == n_m - 1)
    def _():
        mean = acc_ref[0, :] / m_true
        var = jnp.maximum(acc_ref[1, :] / m_true - mean * mean, 0.0)
        out_ref[0, :] = mean
        out_ref[1, :] = var


def _moments(x2d, *, interpret=False):
    m, c = x2d.shape
    bm, bc = _block_m(m), _block_c(c)
    xp = _pad2(x2d, bm, bc)
    mp, cp = xp.shape
    out = pl.pallas_call(
        functools.partial(_stats_kernel, n_m=mp // bm, m_true=m),
        grid=(cp // bc, mp // bm),
        in_specs=[
            pl.BlockSpec((bm, bc), lambda j, i: (i, j), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((2, bc), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, cp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, bc), jnp.float32)],
        interpret=interpret,
    )(xp)
    return out[0, :c], out[1, :c]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def moments(x2d, interpret=False):
    """Differentiable one-read (mean, var) over rows: d(mean)/dx = 1/M,
    d(var)/dx = 2(x - mean)/M (biased variance)."""
    return _moments(x2d, interpret=interpret)


def _moments_fwd(x2d, interpret):
    mean, var = _moments(x2d, interpret=interpret)
    return (mean, var), (x2d, mean)


def _moments_bwd(interpret, res, cts):
    x2d, mean = res
    dmean, dvar = cts
    m = x2d.shape[0]
    dx = dmean / m + dvar * 2.0 * (x2d.astype(jnp.float32) - mean) / m
    return (dx.astype(x2d.dtype),)


moments.defvjp(_moments_fwd, _moments_bwd)


# ---------------------------------------------------------------- apply


def _apply_kernel(x_ref, scale_ref, shift_ref, y_ref, *, relu: bool, cap=None):
    y = x_ref[:].astype(jnp.float32) * scale_ref[0, :] + shift_ref[0, :]
    if relu:
        y = jnp.maximum(y, 0.0)
        if cap is not None:
            y = jnp.minimum(y, cap)  # clipped ReLU (resnet_cudnn_fast.cu:1143)
    y_ref[:] = y.astype(y_ref.dtype)


def _apply(x2d, scale, shift, *, relu, cap=None, interpret=False):
    m, c = x2d.shape
    bm, bc = _block_m(m), _block_c(c)
    xp = _pad2(x2d, bm, bc)
    mp, cp = xp.shape
    out = pl.pallas_call(
        functools.partial(_apply_kernel, relu=relu, cap=cap),
        grid=(mp // bm, cp // bc),
        in_specs=[
            pl.BlockSpec((bm, bc), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bc), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, cp), x2d.dtype),
        interpret=interpret,
    )(xp, _pad_row(scale, bc), _pad_row(shift, bc))
    return out[:m, :c]


# ---------------------------------------------------------------- backward


def _bwd_reduce_kernel(
    x_ref, dy_ref, mean_ref, inv_ref, gamma_ref, beta_ref, out_ref, acc_ref,
    *, n_m: int, relu: bool
):
    @pl.when(pl.program_id(1) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xf = x_ref[:].astype(jnp.float32)
    dy = dy_ref[:].astype(jnp.float32)
    x_hat = (xf - mean_ref[0, :]) * inv_ref[0, :]
    if relu:
        y = x_hat * gamma_ref[0, :] + beta_ref[0, :]
        dy = jnp.where(y > 0, dy, 0.0)
    acc_ref[0, :] += jnp.sum(dy, axis=0)
    acc_ref[1, :] += jnp.sum(dy * x_hat, axis=0)

    @pl.when(pl.program_id(1) == n_m - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _bwd_dx_kernel(
    x_ref, dy_ref, mean_ref, inv_ref, gamma_ref, beta_ref, sums_ref, dx_ref,
    *, m_true: int, relu: bool
):
    xf = x_ref[:].astype(jnp.float32)
    dy = dy_ref[:].astype(jnp.float32)
    x_hat = (xf - mean_ref[0, :]) * inv_ref[0, :]
    if relu:
        y = x_hat * gamma_ref[0, :] + beta_ref[0, :]
        dy = jnp.where(y > 0, dy, 0.0)
    s1 = sums_ref[0, :] / m_true
    s2 = sums_ref[1, :] / m_true
    dx = gamma_ref[0, :] * inv_ref[0, :] * (dy - s1 - x_hat * s2)
    dx_ref[:] = dx.astype(dx_ref.dtype)


def _bn_bwd_impl(x2d, dy2d, mean, inv_std, gamma, beta, *, relu, interpret=False):
    m, c = x2d.shape
    bm, bc = _block_m(m), _block_c(c)
    xp = _pad2(x2d, bm, bc)
    dyp = _pad2(dy2d, bm, bc)
    mp, cp = xp.shape
    rows = [_pad_row(v.astype(jnp.float32), bc) for v in (mean, inv_std, gamma, beta)]

    row_spec = pl.BlockSpec((1, bc), lambda j, i: (0, j), memory_space=pltpu.VMEM)
    sums = pl.pallas_call(
        functools.partial(_bwd_reduce_kernel, n_m=mp // bm, relu=relu),
        grid=(cp // bc, mp // bm),
        in_specs=[
            pl.BlockSpec((bm, bc), lambda j, i: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bc), lambda j, i: (i, j), memory_space=pltpu.VMEM),
            row_spec, row_spec, row_spec, row_spec,
        ],
        out_specs=pl.BlockSpec((2, bc), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, cp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, bc), jnp.float32)],
        interpret=interpret,
    )(xp, dyp, *rows)

    row_spec2 = pl.BlockSpec((1, bc), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    dx = pl.pallas_call(
        functools.partial(_bwd_dx_kernel, m_true=m, relu=relu),
        grid=(mp // bm, cp // bc),
        in_specs=[
            pl.BlockSpec((bm, bc), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bc), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            row_spec2, row_spec2, row_spec2, row_spec2,
            pl.BlockSpec((2, bc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bc), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, cp), x2d.dtype),
        interpret=interpret,
    )(xp, dyp, *rows, sums)

    dgamma = sums[1, :c]  # sum(dy_g * x_hat)
    dbeta = sums[0, :c]  # sum(dy_g)
    return dx[:m, :c], dgamma.astype(gamma.dtype), dbeta.astype(beta.dtype)


# ---------------------------------------------------------------- public


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def batch_norm_act(x2d, gamma, beta, eps=1e-7, relu=True, interpret=False):
    """Training-mode fused BN(+ReLU) on (rows, channels).

    Returns (y, mean, var); mean/var are the batch statistics (fp32) and are
    NOT differentiated through (they feed the stop-gradient running-stat
    EMA, matching the reference which never backprops through its cache).
    """
    y, mean, var, _ = _bn_act_fwd_impl(x2d, gamma, beta, eps, relu, interpret)
    return y, mean, var


def _bn_act_fwd_impl(x2d, gamma, beta, eps, relu, interpret):
    mean, var = _moments(x2d, interpret=interpret)
    inv_std = jax.lax.rsqrt(var + jnp.float32(eps))
    scale = gamma.astype(jnp.float32) * inv_std
    shift = beta.astype(jnp.float32) - scale * mean
    y = _apply(x2d, scale, shift, relu=relu, interpret=interpret)
    return y, mean, var, inv_std


def _bn_act_fwd(x2d, gamma, beta, eps, relu, interpret):
    y, mean, var, inv_std = _bn_act_fwd_impl(x2d, gamma, beta, eps, relu, interpret)
    return (y, mean, var), (x2d, gamma, beta, mean, inv_std)


def _bn_act_bwd(eps, relu, interpret, res, cts):
    x2d, gamma, beta, mean, inv_std = res
    dy, _, _ = cts  # stats cotangents ignored (non-differentiable outputs)
    dx, dgamma, dbeta = _bn_bwd_impl(
        x2d, dy, mean, inv_std, gamma, beta, relu=relu, interpret=interpret
    )
    return dx, dgamma, dbeta


batch_norm_act.defvjp(_bn_act_fwd, _bn_act_bwd)


def bn_act_reference(x2d, gamma, beta, eps=1e-7, relu=True):
    """jnp reference for parity tests (the analogue of the CPU loops in
    testConvolution, resnet.cu:3109-3218)."""
    xf = x2d.astype(jnp.float32)
    mean = jnp.mean(xf, axis=0)
    var = jnp.mean(jnp.square(xf), axis=0) - jnp.square(mean)
    var = jnp.maximum(var, 0.0)
    inv = jax.lax.rsqrt(var + jnp.float32(eps))
    y = (xf - mean) * inv * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x2d.dtype), mean, var
