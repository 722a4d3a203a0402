"""Whole-model forward / forward+backward split timing per engine.

Attributes end-to-end engine gaps (bench.py) to the fwd or bwd half:
for each requested engine, slope-times (a) the forward pass alone and
(b) forward + CE + grads (no optimizer), at the bench configuration.

Usage:
  python tools/bench_engine_split.py --engines xla,hybrid --batch 256
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--engines", default="xla,hybrid")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--projections", default="standard",
                    choices=["standard", "reference"])
    args = ap.parse_args()

    from resnet_tpu.config import ExecutionConfig, model_config
    from resnet_tpu.models import forward, init_params
    from resnet_tpu.ops import cross_entropy
    from resnet_tpu.utils.profiling import time_fn

    mcfg = model_config(
        "resnet50",
        stride_projection_kernel=3 if args.projections == "reference" else 1,
    )
    params = init_params(jax.random.PRNGKey(1234), mcfg)
    rng = np.random.default_rng(0)
    x = jax.device_put(
        rng.normal(0, 50, (args.batch, 224, 224, 3)).astype(np.float32)
    )
    labels = jax.device_put(
        rng.integers(0, 1000, (args.batch,)).astype(np.int32)
    )

    results = {}
    for engine in args.engines.split(","):
        ecfg = ExecutionConfig(
            kernels=engine, compute_dtype=args.dtype,
            matmul_precision="default",
        )

        def fwd_only(p, xx):
            logits, _ = forward(p, xx, mcfg, ecfg, train=True)
            return logits

        def fwd_bwd(p, xx, yy):
            def loss_fn(pp):
                logits, _ = forward(pp, xx, mcfg, ecfg, train=True)
                return cross_entropy(logits, yy, reduction="sum")

            return jax.grad(loss_fn)(p)

        copts = ecfg.jit_compiler_options() or None
        t_f = time_fn(fwd_only, (params, x), iters=16,
                      compiler_options=copts)
        t_fb = time_fn(
            fwd_bwd, (params, x, labels), iters=12, compiler_options=copts,
        )
        results[engine] = {
            "fwd_ms": round(t_f * 1e3, 2),
            "fwd_bwd_ms": round(t_fb * 1e3, 2),
            "bwd_ms": round((t_fb - t_f) * 1e3, 2),
        }
        print(engine, json.dumps(results[engine]), flush=True)

    print(json.dumps({"batch": args.batch, "dtype": args.dtype,
                      "projections": args.projections, "engines": results}))


if __name__ == "__main__":
    main()
