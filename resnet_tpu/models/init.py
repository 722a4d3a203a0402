"""Parameter initialization matching the reference.

init_weights_gaussian_device (resnet.cu:51-55) takes a *variance* and draws
N(0, sqrt(var)). Per-tensor variances (resnet.cu:710-805, 805-949):

  * stem 7x7 conv:        2 / (49 * (3 + 64))
  * bottleneck 1x1 convs: 2 / (c_in + c_out)            (no kernel-area term)
  * bottleneck 3x3 conv:  2 / (9 * (c_in + c_out))
  * projection:           2 / (k*k * (c_in + c_out))
  * FC:                   1e-4  (resnet.cu:938)
  * BN gamma = 1, beta = 0 for every layer (resnet.cu:684-708; the is_zero
    flag there zeroes the whole model, not residual gammas).

i.e. variance = 2 / (k^2 * (fan_in + fan_out)) throughout. Weights are
stored HWIO.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from ..config import ModelConfig


def gaussian(key, shape, variance, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype) * jnp.sqrt(
        jnp.asarray(variance, dtype)
    )


def _conv_init(key, kh, kw, cin, cout, dtype):
    var = 2.0 / (kh * kw * (cin + cout))
    return gaussian(key, (kh, kw, cin, cout), var, dtype)


def _bn_init(depth, dtype, zero_gamma=False):
    return {
        "gamma": jnp.zeros((depth,), dtype)
        if zero_gamma
        else jnp.ones((depth,), dtype),
        "beta": jnp.zeros((depth,), dtype),
    }


def init_params(key: jax.Array, cfg: ModelConfig, dtype=jnp.float32) -> Dict[str, Any]:
    """Build the parameter pytree.

    Structure (bottleneck):
      init_conv.w, init_bn.{gamma,beta},
      blocks[i].{reduce.w, bn_reduce, spatial.w, bn_spatial, expand.w,
                 bn_expand, [proj.w, bn_proj]},
      fc.w [, fc.b]
    """
    n_blocks = cfg.num_blocks
    keys = iter(jax.random.split(key, 4 * n_blocks + 8))

    params: Dict[str, Any] = {}
    params["init_conv"] = {
        "w": _conv_init(
            next(keys), cfg.init_kernel, cfg.init_kernel, cfg.in_channels,
            cfg.init_filters, dtype,
        )
    }
    params["init_bn"] = _bn_init(cfg.init_filters, dtype)

    blocks: List[Dict[str, Any]] = []
    incoming = cfg.init_filters
    for i in range(n_blocks):
        stage = cfg.stage_of_block(i)
        base = cfg.init_filters * (2**stage)
        width = int(base * cfg.width_multiplier)
        out_ch = base * cfg.expansion if cfg.bottleneck else width
        reduction = cfg.is_reduction_block(i)
        stride = 2 if reduction else 1
        block: Dict[str, Any] = {}
        if cfg.bottleneck:
            block["reduce"] = {"w": _conv_init(next(keys), 1, 1, incoming, width, dtype)}
            block["bn_reduce"] = _bn_init(width, dtype)
            block["spatial"] = {
                "w": _conv_init(next(keys), 3, 3, width // cfg.groups, width, dtype)
            }
            block["bn_spatial"] = _bn_init(width, dtype)
            block["expand"] = {"w": _conv_init(next(keys), 1, 1, width, out_ch, dtype)}
            block["bn_expand"] = _bn_init(
                out_ch, dtype, zero_gamma=cfg.zero_init_residual
            )
        else:
            block["conv1"] = {"w": _conv_init(next(keys), 3, 3, incoming, width, dtype)}
            block["bn1"] = _bn_init(width, dtype)
            block["conv2"] = {"w": _conv_init(next(keys), 3, 3, width, width, dtype)}
            block["bn2"] = _bn_init(width, dtype, zero_gamma=cfg.zero_init_residual)
        if incoming != out_ch or reduction:
            pk = cfg.stride_projection_kernel if stride == 2 else 1
            block["proj"] = {"w": _conv_init(next(keys), pk, pk, incoming, out_ch, dtype)}
            block["bn_proj"] = _bn_init(out_ch, dtype)
        blocks.append(block)
        incoming = out_ch
    params["blocks"] = blocks

    fc = {"w": gaussian(next(keys), (incoming, cfg.num_classes), 1e-4, dtype)}
    if cfg.fc_bias:
        fc["b"] = jnp.zeros((cfg.num_classes,), dtype)
    params["fc"] = fc
    return params


def init_bn_state(cfg: ModelConfig) -> Dict[str, Any]:
    """Running-stat state for inference BN (mean=0, var=1 per channel).

    New capability: the reference tracks no running statistics
    (resnet_cudnn.cu:1679 passes NULL)."""

    def stat(depth):
        return {
            "mean": jnp.zeros((depth,), jnp.float32),
            "var": jnp.ones((depth,), jnp.float32),
        }

    state: Dict[str, Any] = {"init_bn": stat(cfg.init_filters)}
    blocks = []
    incoming = cfg.init_filters
    for i in range(cfg.num_blocks):
        stage = cfg.stage_of_block(i)
        base = cfg.init_filters * (2**stage)
        width = int(base * cfg.width_multiplier)
        out_ch = base * cfg.expansion if cfg.bottleneck else width
        b: Dict[str, Any] = {}
        if cfg.bottleneck:
            b["bn_reduce"] = stat(width)
            b["bn_spatial"] = stat(width)
            b["bn_expand"] = stat(out_ch)
        else:
            b["bn1"] = stat(width)
            b["bn2"] = stat(width)
        if incoming != out_ch or cfg.is_reduction_block(i):
            b["bn_proj"] = stat(out_ch)
        blocks.append(b)
        incoming = out_ch
    state["blocks"] = blocks
    return state


def param_count(params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))
