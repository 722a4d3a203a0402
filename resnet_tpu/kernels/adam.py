"""Fused Adam update kernel.

The reference launches three kernels per tensor x 160 tensors = 480
launches per step (update_parameters, resnet.cu:2952-2966). Here the whole
parameter set is flattened into one contiguous fp32 vector and a single
Pallas kernel performs m/v/theta updates with the non-finite guards in one
pass over HBM — reads (theta, g, m, v), writes (theta, m, v), 7 streams
total vs the reference's 12+.

Semantics identical to optim/adam.py::adam_update (and to the reference
kernels resnet.cu:605-662): weight decay folded into the moment grad AND
decoupled in the step, per-element guards.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _adam_kernel(
    p_ref, g_ref, m_ref, v_ref, h_ref,
    p_out, m_out, v_out,
):
    # h = [lr, wd, b1, b2, eps, cur_mean_decay, cur_var_decay, guard]
    lr, wd = h_ref[0, 0], h_ref[0, 1]
    b1, b2, eps = h_ref[0, 2], h_ref[0, 3], h_ref[0, 4]
    cmd, cvd, guard = h_ref[0, 5], h_ref[0, 6], h_ref[0, 7]

    p = p_ref[:]
    g = g_ref[:]
    m = m_ref[:]
    v = v_ref[:]
    g_wd = g + wd * p
    new_m = b1 * m + (1 - b1) * g_wd
    new_v = b2 * v + (1 - b2) * g_wd * g_wd
    finite = jnp.isfinite(g)
    use_guard = guard > 0
    new_m = jnp.where(jnp.logical_or(finite, jnp.logical_not(use_guard)), new_m, m)
    new_v = jnp.where(jnp.logical_or(finite, jnp.logical_not(use_guard)), new_v, v)
    m_adj = new_m / (1 - cmd)
    v_adj = new_v / (1 - cvd)
    new_p = p - (lr * m_adj / (jnp.sqrt(v_adj) + eps) + wd * p)
    new_p = jnp.where(
        jnp.logical_or(jnp.isfinite(new_p), jnp.logical_not(use_guard)), new_p, p
    )
    p_out[:] = new_p
    m_out[:] = new_m
    v_out[:] = new_v


def fused_adam_flat(
    p: jax.Array,
    g: jax.Array,
    m: jax.Array,
    v: jax.Array,
    *,
    learning_rate,
    weight_decay: float,
    beta1: float,
    beta2: float,
    eps: float,
    cur_mean_decay,
    cur_var_decay,
    nonfinite_guard: bool = True,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One fused pass over flat fp32 (n,) vectors. Returns (p, m, v)."""
    n = p.shape[0]
    lanes = 128
    sub = 512
    block = sub * lanes
    pad = (-n) % block
    shape2 = ((n + pad) // lanes, lanes)

    def to2(x):
        return jnp.pad(x, (0, pad)).reshape(shape2)

    h = jnp.stack(
        [
            jnp.asarray(learning_rate, jnp.float32),
            jnp.float32(weight_decay),
            jnp.float32(beta1),
            jnp.float32(beta2),
            jnp.float32(eps),
            jnp.asarray(cur_mean_decay, jnp.float32),
            jnp.asarray(cur_var_decay, jnp.float32),
            jnp.float32(1.0 if nonfinite_guard else 0.0),
        ]
    ).reshape(1, 8)

    rows = shape2[0]
    grid = (rows // sub,)
    tile = pl.BlockSpec((sub, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _adam_kernel,
        grid=grid,
        in_specs=[
            tile, tile, tile, tile,
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(tile, tile, tile),
        out_shape=(
            jax.ShapeDtypeStruct(shape2, jnp.float32),
            jax.ShapeDtypeStruct(shape2, jnp.float32),
            jax.ShapeDtypeStruct(shape2, jnp.float32),
        ),
        interpret=interpret,
    )(to2(p), to2(g), to2(m), to2(v), h)
    return tuple(o.reshape(-1)[:n] for o in out)
