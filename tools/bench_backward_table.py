"""Per-layer IN-STEP backward attribution for the ResNet-50 train step.

Round 2 proved isolated-shape op timings mislead (microbench winners lose
in-step); this tool attributes the real step's 70ms backward per block,
inside the full program. Method: jax.grad w.r.t. a *suffix* of the
parameters — trainable = blocks[L:] + fc, frozen = stem + blocks[:L] — so
autodiff emits the backward only for blocks >= L while the complete forward
still runs. The time delta between truncation L and L+1 is block L's
in-step backward cost (BN bwd + conv dW/dx + join); L=-1 adds the stem
(conv dW + BN bwd + maxpool backward).

The reference analogue: resnet_cudnn_fast.cu:1338-1521 autotunes its
backward algos separately from forward — attribution before optimization.

Usage (target chip):
  python tools/bench_backward_table.py --batch 256 --out docs/bwdtable_r3.json
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
    ap.add_argument("--image-dim", type=int, default=224)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--kernels", default="xla")
    ap.add_argument("--projections", default="standard",
                    choices=["standard", "reference"])
    ap.add_argument("--levels", default="",
                    help="comma list of truncation levels to measure"
                         " (default: every block boundary)")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from resnet_tpu.config import ExecutionConfig, model_config
    from resnet_tpu.models import forward, init_params
    from resnet_tpu.ops import cross_entropy
    from resnet_tpu.utils.profiling import time_fn

    mcfg = model_config(
        "resnet50",
        input_dim=args.image_dim,
        stride_projection_kernel=3 if args.projections == "reference" else 1,
    )
    ecfg = ExecutionConfig(
        kernels=args.kernels, compute_dtype=args.dtype,
        matmul_precision="default",
    )
    params = init_params(jax.random.PRNGKey(1234), mcfg)
    rng = np.random.default_rng(0)
    x = jax.device_put(
        rng.normal(
            0, 50, (args.batch, args.image_dim, args.image_dim, 3)
        ).astype(np.float32)
    )
    labels = jax.device_put(
        rng.integers(0, 1000, (args.batch,)).astype(np.int32)
    )
    copts = ecfg.jit_compiler_options() or None
    n_blocks = mcfg.num_blocks

    def time_level(level):
        """level=-1: full backward; level=L: backward only through
        blocks[L:] + fc (stem and blocks[:L] frozen)."""
        if level < 0:
            trainable = params
            frozen = {}

            def merge(t, f):
                return t

        else:
            trainable = {"blocks": params["blocks"][level:], "fc": params["fc"]}
            frozen = {
                "init_conv": params["init_conv"],
                "init_bn": params["init_bn"],
                "blocks": params["blocks"][:level],
            }

            def merge(t, f):
                return {
                    "init_conv": f["init_conv"],
                    "init_bn": f["init_bn"],
                    "blocks": f["blocks"] + t["blocks"],
                    "fc": t["fc"],
                }

        def fwd_bwd(tr, fr, xx, yy):
            def loss_fn(tt):
                logits, _ = forward(merge(tt, fr), xx, mcfg, ecfg, train=True)
                return cross_entropy(logits, yy, reduction="sum")

            return jax.grad(loss_fn)(tr)

        return time_fn(fwd_bwd, (trainable, frozen, x, labels),
                       iters=args.iters, compiler_options=copts)

    def fwd_only(p, xx):
        logits, _ = forward(p, xx, mcfg, ecfg, train=True)
        return logits

    t_fwd = time_fn(fwd_only, (params, x), iters=args.iters,
                    compiler_options=copts)
    print(f"forward only: {t_fwd*1e3:.2f} ms", flush=True)

    levels = (
        [int(v) for v in args.levels.split(",")]
        if args.levels
        else list(range(-1, n_blocks + 1))
    )
    times = {}
    for lv in levels:
        t = time_level(lv)
        times[lv] = t
        print(f"level {lv:3d}: fwd+bwd[{lv}:] = {t*1e3:7.2f} ms", flush=True)

    # per-block in-step backward cost = t(L) - t(L+1)
    rows = []
    stage_hw = mcfg.input_dim // mcfg.init_stride // mcfg.maxpool_stride
    hw = stage_hw
    for i in range(n_blocks):
        if i in times and (i + 1) in times:
            stride = 2 if mcfg.is_reduction_block(i) else 1
            rows.append({
                "block": i,
                "stage": mcfg.stage_of_block(i),
                "hw_in": hw,
                "stride": stride,
                "proj": mcfg.is_projection_block(i),
                "bwd_ms": round((times[i] - times[i + 1]) * 1e3, 2),
            })
            hw //= stride
    result = {
        "batch": args.batch, "dtype": args.dtype, "kernels": args.kernels,
        "projections": args.projections,
        "platform": jax.devices()[0].platform,
        "fwd_ms": round(t_fwd * 1e3, 2),
        "levels_ms": {str(k): round(v * 1e3, 2) for k, v in times.items()},
        "stem_bwd_ms": (
            round((times[-1] - times[0]) * 1e3, 2)
            if -1 in times and 0 in times else None
        ),
        "head_plus_dispatch_ms": (
            round((times[n_blocks] - t_fwd) * 1e3, 2)
            if n_blocks in times else None
        ),
        "blocks": rows,
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
