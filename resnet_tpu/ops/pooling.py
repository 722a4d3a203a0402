"""Pooling ops.

Max pool replaces doMaxPool/maxPoolDeriv (resnet.cu:433-497). The reference
records argmax indices in forward and scatters the gradient to them in
backward; on TPU that materialized index buffer is unnecessary — XLA derives
the backward as SelectAndScatter from autodiff of reduce_window. Tie-breaking
matches (first maximum wins) because the reference's strict '>' comparison
(resnet.cu:461) picks the first max in scan order, as does SelectAndScatter.

Global average pool replaces doFilterAvgPool/filterAvgPoolDeriv
(resnet.cu:500-543): mean over 7x7, backward broadcasts grad/49.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .conv import spatial_dims
from .padding import reference_padding


def max_pool(
    x: jax.Array,
    *,
    kernel: int = 3,
    stride: int = 2,
    layout: str = "NHWC",
) -> jax.Array:
    hdim, wdim = spatial_dims(layout)
    pad_h = reference_padding(x.shape[hdim], kernel, stride)
    pad_w = reference_padding(x.shape[wdim], kernel, stride)
    window = [1, 1, 1, 1]
    strides = [1, 1, 1, 1]
    window[hdim], window[wdim] = kernel, kernel
    strides[hdim], strides[wdim] = stride, stride
    padding = [(0, 0), (0, 0), (0, 0), (0, 0)]
    padding[hdim], padding[wdim] = pad_h, pad_w
    # NB: the init value must be a weakly-typed scalar — a concrete
    # jnp.array(-inf, dtype) breaks reduce_window's reverse-mode rule
    # under jit on jax 0.9 ("Linearization failed...").
    return lax.reduce_window(
        x, -jnp.inf, lax.max, tuple(window), tuple(strides), tuple(padding)
    )


def global_avg_pool(x: jax.Array, *, layout: str = "NHWC") -> jax.Array:
    """(N,H,W,C)->(N,C): mean over space (doFilterAvgPool, resnet.cu:500)."""
    hdim, wdim = spatial_dims(layout)
    return jnp.mean(x, axis=(hdim, wdim))
