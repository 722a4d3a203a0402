"""Activations.

relu matches doActivation/doActivationDeriv (resnet.cu:545-566): forward
max(0,x); backward passes gradient only where x > 0 strictly (the reference
zeroes at x <= 0, resnet.cu:558-563). Implemented via where() so autodiff
produces exactly that gate (jnp.maximum would split the subgradient at 0).

relu_cap matches the cuDNN-fast variant's clipped ReLU with ceiling 10
(resnet_cudnn_fast.cu:1143-1145).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def relu(x: jax.Array) -> jax.Array:
    return jnp.where(x > 0, x, jnp.zeros_like(x))


def relu_cap(x: jax.Array, cap: float = 10.0) -> jax.Array:
    return jnp.clip(x, 0.0, cap)
