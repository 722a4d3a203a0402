"""Maxpool backward: SelectAndScatter vs mask-based reconstruction.

The stem attribution (docs/bwdtable_r3.json: stem_bwd 8.05ms; bench_stem_detail:
init-BN + maxpool bwd = 5.55ms) leaves the maxpool backward as the last
unattributed multi-ms block. XLA derives reduce_window's gradient as
SelectAndScatter, which on TPU lowers to a windowed select machine rather than
a plain fused elementwise pass. ops/pooling.py's 'mask' VJP reconstructs the
reference's argmax scatter (maxPoolDeriv, resnet.cu:476-497) as k*k fusible
out-grid passes; this tool slope-times both in isolation at the stem shape.

Usage: python tools/bench_maxpool_bwd.py --batch 256
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--hw", type=int, default=112)
    ap.add_argument("--chan", type=int, default=64)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    from resnet_tpu.ops.pooling import max_pool
    from resnet_tpu.utils.profiling import time_fn

    dtype = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    shape = (args.batch, args.hw, args.hw, args.chan)
    x = jax.device_put(rng.normal(0, 10, shape).astype(dtype))
    y = jax.jit(max_pool)(x)
    dy = jax.device_put(rng.normal(0, 1, np.array(y.shape)).astype(dtype))

    def bwd_of(vjp_mode):
        pool = functools.partial(max_pool, vjp=vjp_mode)
        def f(x, dy):
            _, vjp = jax.vjp(pool, x)
            return vjp(dy)[0]
        return jax.jit(f)

    f_auto, f_mask = bwd_of("select_scatter"), bwd_of("mask")
    dx_auto = f_auto(x, dy)
    dx_mask = f_mask(x, dy)
    err = float(jnp.max(jnp.abs(dx_auto.astype(jnp.float32) - dx_mask.astype(jnp.float32))))

    t_auto = time_fn(f_auto, (x, dy), iters=args.iters)
    t_mask = time_fn(f_mask, (x, dy), iters=args.iters)

    bytes_min = (2 * x.size + y.size + dy.size) * dtype.itemsize
    print(json.dumps({
        "shape": list(shape),
        "dtype": args.dtype,
        "platform": jax.devices()[0].platform,
        "select_and_scatter_ms": round(t_auto * 1e3, 3),
        "mask_first_win_ms": round(t_mask * 1e3, 3),
        "dma_roofline_ms": round(bytes_min / 820e9 * 1e3, 3),
        "max_abs_err": err,
    }))


if __name__ == "__main__":
    main()
