"""Small fused elementwise kernels.

add_relu fuses the residual join + activation that the reference runs as
two kernels (addVec resnet.cu:59 + doActivation resnet.cu:545, called
back-to-back at resnet.cu:1717-1723; the fast variant uses cudnnOpTensor ADD
+ cudnnActivationForward, resnet_cudnn_fast.cu:1854-1888). One pass over
HBM instead of three. Differentiable via custom_vjp: the gate is recomputed
from a+b (recompute strategy, nothing cached but the inputs).

bias_act is the generic y = x * scale + shift (+ReLU) row-broadcast kernel
shared with the BN apply step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bn import _apply as bias_act_2d  # reuse the BN apply kernel


def _add_relu_kernel(a_ref, b_ref, o_ref):
    # compute/compare in fp32: Mosaic on v5e rejects bf16 cmpf
    s = a_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    o_ref[:] = jnp.maximum(s, 0.0).astype(o_ref.dtype)


def _add_relu_mask_kernel(a_ref, b_ref, g_ref, o_ref):
    s = a_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    o_ref[:] = jnp.where(s > 0, g_ref[:].astype(jnp.float32), 0.0).astype(o_ref.dtype)


def _flatten2(x):
    if x.ndim == 1:
        return x.reshape(1, -1)
    return x.reshape(-1, x.shape[-1])


def _run_elementwise(kernel, out_dtype, *arrays, interpret=False):
    orig_shape = arrays[0].shape
    flats = [_flatten2(a) for a in arrays]
    m, c = flats[0].shape
    # keep blocks small: up to 4 operands x block x 2 (double buffering)
    # must stay well under the 16MB VMEM budget
    bm = min(512, m)
    bc = c if c <= 128 else min(128 * ((c + 127) // 128), 512)
    padded = []
    for f in flats:
        pm, pc = (-m) % bm, (-c) % bc
        padded.append(jnp.pad(f, ((0, pm), (0, pc))) if (pm or pc) else f)
    mp, cp = padded[0].shape
    out = pl.pallas_call(
        kernel,
        grid=(mp // bm, cp // bc),
        in_specs=[
            pl.BlockSpec((bm, bc), lambda i, j: (i, j), memory_space=pltpu.VMEM)
            for _ in padded
        ],
        out_specs=pl.BlockSpec((bm, bc), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, cp), out_dtype),
        interpret=interpret,
    )(*padded)
    return out[:m, :c].reshape(orig_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def add_relu(a, b, interpret=False):
    """relu(a + b) in one fused pass (residual join, resnet.cu:1717-1723)."""
    return _run_elementwise(_add_relu_kernel, a.dtype, a, b, interpret=interpret)


def _add_relu_fwd(a, b, interpret):
    return add_relu(a, b, interpret), (a, b)


def _add_relu_bwd(interpret, res, g):
    a, b = res
    da = _run_elementwise(_add_relu_mask_kernel, a.dtype, a, b, g, interpret=interpret)
    return da, da.astype(b.dtype)


add_relu.defvjp(_add_relu_fwd, _add_relu_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def bias_act(x, scale, shift, relu=True, interpret=False, cap=None):
    """y = [relu](x * scale + shift) [clipped at cap], scale/shift broadcast
    over rows (per-channel, channels = last dim). Differentiable. cap is the
    clipped-ReLU ceiling (resnet_cudnn_fast.cu:1143-1145)."""
    orig_shape = x.shape
    y = bias_act_2d(_flatten2(x), scale, shift, relu=relu, cap=cap,
                    interpret=interpret)
    return y.reshape(orig_shape)


def _bias_act_fwd(x, scale, shift, relu, interpret, cap):
    return bias_act(x, scale, shift, relu, interpret, cap), (x, scale, shift)


def _bias_act_bwd(relu, interpret, cap, res, dy):
    x, scale, shift = res
    xf = x.astype(jnp.float32)
    sf = jnp.asarray(scale, jnp.float32)
    dv = dy.astype(jnp.float32)
    if relu:
        v = xf * sf + jnp.asarray(shift, jnp.float32)
        gate = (v > 0) if cap is None else (v > 0) & (v < cap)
        dv = jnp.where(gate, dv, 0.0)
    axes = tuple(range(x.ndim - 1))
    dx = (dv * sf).astype(x.dtype)
    dscale = jnp.sum(dv * xf, axis=axes).astype(jnp.asarray(scale).dtype)
    dshift = jnp.sum(dv, axis=axes).astype(jnp.asarray(shift).dtype)
    return dx, dscale, dshift


bias_act.defvjp(_bias_act_fwd, _bias_act_bwd)
