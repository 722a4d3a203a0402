"""Tiled MXU matmul.

The Pallas analogue of matMulOptimized (resnet_clean.cu:100-165): where the
CUDA version tiles into 32x32 shared-memory blocks with a +1 pad against
bank conflicts, the TPU version tiles into MXU-shaped (128,128) VMEM blocks
with a sequential K loop accumulating in an fp32 VMEM scratch accumulator
(TPU grids execute sequentially per core, so the K dimension is the
innermost grid axis and the accumulator carries across K steps).

Used for the FC layer (the reference keeps a hand-rolled matMul for FC in
all six variants, resnet_cudnn_fast.cu:1612-1639). Backward comes from
jax.custom_vjp as transposed matmuls on the same kernel — the reference's
transpose+matMul wrapper pairs (resnet.cu:1482-1509).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _matmul_kernel(a_ref, b_ref, o_ref, acc_ref, *, n_k: int):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(
        a_ref[:], b_ref[:], preferred_element_type=jnp.float32
    )

    @pl.when(pl.program_id(2) == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _pad_to(x, m0, m1):
    p0 = (-x.shape[0]) % m0
    p1 = (-x.shape[1]) % m1
    if p0 or p1:
        x = jnp.pad(x, ((0, p0), (0, p1)))
    return x


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k", "interpret"))
def _matmul_raw(a, b, *, block_m=128, block_n=128, block_k=128, interpret=False):
    m, k = a.shape
    k2, n = b.shape
    assert k == k2, (a.shape, b.shape)
    out_dtype = jnp.result_type(a.dtype, b.dtype)

    a_p = _pad_to(a, block_m, block_k)
    b_p = _pad_to(b, block_k, block_n)
    mp, kp = a_p.shape
    np_ = b_p.shape[1]
    n_k = kp // block_k

    out = pl.pallas_call(
        functools.partial(_matmul_kernel, n_k=n_k),
        grid=(mp // block_m, np_ // block_n, n_k),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=(mp * kp + kp * np_ + mp * np_) * a.dtype.itemsize,
            transcendentals=0,
        ),
    )(a_p, b_p)
    return out[:m, :n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def matmul(a, b, interpret=False):
    """a @ b on the MXU via Pallas tiles; differentiable."""
    return _matmul_raw(a, b, interpret=interpret)


def _matmul_fwd(a, b, interpret):
    return _matmul_raw(a, b, interpret=interpret), (a, b)


def _matmul_bwd(interpret, res, g):
    a, b = res
    da = _matmul_raw(g, b.T, interpret=interpret).astype(a.dtype)
    db = _matmul_raw(a.T, g, interpret=interpret).astype(b.dtype)
    return da, db


matmul.defvjp(_matmul_fwd, _matmul_bwd)
