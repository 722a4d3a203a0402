"""Decompose the stem's in-step backward cost (bwdtable_r3: 8.05ms).

Same truncated-grad method as bench_backward_table.py, at stem granularity:

  full        : everything trainable
  no_stem_w   : stem conv W frozen (init_bn + blocks + fc trainable)
                -> delta = stem conv dW (7x7, cin=3)
  no_stem     : stem conv + init_bn frozen (blocks + fc trainable)
                -> delta = init BN backward + maxpool backward
                   (backward-data stops at block 0's input)

Usage: python tools/bench_stem_detail.py --batch 256
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--projections", default="standard",
                    choices=["standard", "reference"])
    ap.add_argument("--space-to-depth", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from resnet_tpu.config import ExecutionConfig, model_config
    from resnet_tpu.models import forward, init_params
    from resnet_tpu.ops import cross_entropy
    from resnet_tpu.utils.profiling import time_fn

    mcfg = model_config(
        "resnet50",
        stride_projection_kernel=3 if args.projections == "reference" else 1,
    )
    ecfg = ExecutionConfig(
        kernels="xla", compute_dtype=args.dtype, matmul_precision="default",
        space_to_depth=args.space_to_depth,
    )
    params = init_params(jax.random.PRNGKey(1234), mcfg)
    rng = np.random.default_rng(0)
    x = jax.device_put(
        rng.normal(0, 50, (args.batch, 224, 224, 3)).astype(np.float32)
    )
    labels = jax.device_put(
        rng.integers(0, 1000, (args.batch,)).astype(np.int32)
    )
    copts = ecfg.jit_compiler_options() or None

    def split(frozen_keys):
        tr = {k: v for k, v in params.items() if k not in frozen_keys}
        fr = {k: v for k, v in params.items() if k in frozen_keys}
        return tr, fr

    def measure(frozen_keys):
        tr, fr = split(frozen_keys)

        def fwd_bwd(t, f, xx, yy):
            def loss_fn(tt):
                merged = {**f, **tt}
                logits, _ = forward(merged, xx, mcfg, ecfg, train=True)
                return cross_entropy(logits, yy, reduction="sum")

            return jax.grad(loss_fn)(t)

        return time_fn(fwd_bwd, (tr, fr, x, labels), iters=args.iters,
                       compiler_options=copts)

    t_full = measure(())
    t_no_w = measure(("init_conv",))
    t_no_stem = measure(("init_conv", "init_bn"))
    result = {
        "batch": args.batch, "dtype": args.dtype,
        "projections": args.projections,
        "space_to_depth": args.space_to_depth,
        "full_ms": round(t_full * 1e3, 2),
        "no_stem_w_ms": round(t_no_w * 1e3, 2),
        "no_stem_ms": round(t_no_stem * 1e3, 2),
        "stem_conv_dw_ms": round((t_full - t_no_w) * 1e3, 2),
        "stem_bn_plus_maxpool_bwd_ms": round((t_no_w - t_no_stem) * 1e3, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
