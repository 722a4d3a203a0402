"""SGD with momentum (new capability: the reference ships only Adam, but a
76% top-1 ImageNet run conventionally uses SGD+momentum with step decay, so
the framework provides it as a first-class optimizer)."""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class SGDState(NamedTuple):
    momentum_buf: Any
    step: jax.Array


def sgd_init(params) -> SGDState:
    return SGDState(
        momentum_buf=jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=jnp.float32), params
        ),
        step=jnp.zeros((), jnp.int32),
    )


def sgd_update(
    grads,
    state: SGDState,
    params,
    *,
    learning_rate,
    momentum: float = 0.9,
    weight_decay: float = 0.0,
    nesterov: bool = False,
    wd_mask=None,
):
    lr = jnp.asarray(learning_rate, jnp.float32)
    mu = jnp.float32(momentum)
    wd = jnp.float32(weight_decay)

    def leaf(p, g, buf, wleaf):
        gf = g.astype(jnp.float32) + wd * wleaf * p.astype(jnp.float32)
        new_buf = mu * buf + gf
        step_dir = gf + mu * new_buf if nesterov else new_buf
        return (p.astype(jnp.float32) - lr * step_dir).astype(p.dtype), new_buf

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_b = treedef.flatten_up_to(state.momentum_buf)
    flat_w = (
        treedef.flatten_up_to(wd_mask)
        if wd_mask is not None
        else [jnp.float32(1.0)] * len(flat_p)
    )
    out = [leaf(p, g, b, wl) for p, g, b, wl in zip(flat_p, flat_g, flat_b, flat_w)]
    new_params = treedef.unflatten([o[0] for o in out])
    new_buf = treedef.unflatten([o[1] for o in out])
    return new_params, SGDState(momentum_buf=new_buf, step=state.step + 1)
