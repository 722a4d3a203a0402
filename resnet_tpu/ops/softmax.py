"""Softmax.

The reference softmax (resnet.cu:569-580) is numerically naive: exp(x)/sum
with no max subtraction — it overflows for logits > ~88. We default to the
stable form and keep the naive form behind ``stable=False`` for bit-level
forward-dump comparisons against reference activations (SURVEY.md section 4,
fidelity gate).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def softmax(x: jax.Array, *, axis: int = -1, stable: bool = True) -> jax.Array:
    if stable:
        x = x - jax.lax.stop_gradient(jnp.max(x, axis=axis, keepdims=True))
    ex = jnp.exp(x)
    return ex / jnp.sum(ex, axis=axis, keepdims=True)


def log_softmax(x: jax.Array, *, axis: int = -1) -> jax.Array:
    shifted = x - jax.lax.stop_gradient(jnp.max(x, axis=axis, keepdims=True))
    return shifted - jnp.log(jnp.sum(jnp.exp(shifted), axis=axis, keepdims=True))
