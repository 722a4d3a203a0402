"""Derive the hybrid engine's _FUSED_WINS site table from IN-STEP
measurements — the cudnnFind analogue done right.

The reference measures every conv algorithm per layer inside the running
trainer and caches the winner (resnet_cudnn_fast.cu:1275-1303). Round 2
proved the microbench version of that idea wrong on this stack: per-shape
Pallas wins measured in isolation do not survive the full step (XLA inserts
ms-scale layout fixups around in-step custom calls, docs/perf_ceiling_r2.md).
So this tool measures the only number that matters: full fwd+bwd step time
with exactly ONE candidate site dispatched to the Pallas fused conv, vs the
all-XLA-chain control. A site enters the winners table only if it beats the
control by > --noise-pct.

Output: per-site table (JSON) + the RESNET_TPU_FUSED_WINS env string of the
winners. Scope of validity: the exact (chip, batch, dtype) measured.

Usage (on the target chip):
  python tools/bench_hybrid_sites.py --batch 256 --out docs/hybrid_sites.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def conv_site_keys(mcfg):
    """Distinct (hw, cin, cout, k, stride) conv-site keys of the bottleneck
    trunk, as seen by fused_resnet._conv_site (input hw, NHWC)."""
    keys = []
    hw = mcfg.input_dim // mcfg.init_stride // mcfg.maxpool_stride
    cin = mcfg.init_filters
    for i in range(mcfg.num_blocks):
        stride = 2 if mcfg.is_reduction_block(i) else 1
        mid = mcfg.init_filters * (2 ** mcfg.stage_of_block(i))
        cout = mid * mcfg.expansion
        keys.append((hw, cin, mid, 1, 1))                      # reduce
        keys.append((hw, mid, mid, 3, stride))                 # spatial
        hw_out = hw // stride
        keys.append((hw_out, mid, cout, 1, 1))                 # expand
        if cin != cout or stride != 1:
            keys.append((hw, cin, cout,
                         mcfg.stride_projection_kernel if stride == 2 else 1,
                         stride))                               # projection
        hw, cin = hw_out, cout
    seen, out = set(), []
    for k in keys:
        if k not in seen:
            seen.add(k)
            out.append(k)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--projections", default="standard",
                    choices=["standard", "reference"])
    ap.add_argument("--noise-pct", type=float, default=1.0,
                    help="win threshold vs control, percent")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--limit", type=int, default=0,
                    help="measure only the first N sites (0 = all 22;"
                         " each site is a full fwd+bwd recompile)")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from resnet_tpu.config import ExecutionConfig, model_config
    from resnet_tpu.models import forward, init_params
    from resnet_tpu.models import fused_resnet
    from resnet_tpu.ops import cross_entropy
    from resnet_tpu.utils.profiling import time_fn

    mcfg = model_config(
        "resnet50",
        stride_projection_kernel=3 if args.projections == "reference" else 1,
    )
    ecfg = ExecutionConfig(
        kernels="hybrid", compute_dtype=args.dtype, matmul_precision="default",
    )
    params = init_params(jax.random.PRNGKey(1234), mcfg)
    rng = np.random.default_rng(0)
    x = jax.device_put(
        rng.normal(0, 50, (args.batch, 224, 224, 3)).astype(np.float32)
    )
    labels = jax.device_put(
        rng.integers(0, 1000, (args.batch,)).astype(np.int32)
    )

    def fwd_bwd(p, xx, yy):
        def loss_fn(pp):
            logits, _ = forward(pp, xx, mcfg, ecfg, train=True)
            return cross_entropy(logits, yy, reduction="sum")

        return jax.grad(loss_fn)(p)

    copts = ecfg.jit_compiler_options() or None

    def measure():
        return time_fn(fwd_bwd, (params, x, labels), iters=args.iters,
                       compiler_options=copts)

    # reconciliation row (round-3 verdict weak #2: the 181ms control was
    # unexplained against the 98ms bench step): the hybrid control is the
    # FUSED-CHAIN dataflow (conv_chain_xla everywhere), not the standard
    # engine — measure the standard engine's fwd+bwd under the identical
    # harness so the artifact carries its own sanity check. Serialize this
    # tool against every other job: one host core, any concurrent work
    # contaminates the slope.
    ecfg_std = ExecutionConfig(
        kernels="xla", compute_dtype=args.dtype, matmul_precision="default",
    )

    def fwd_bwd_std(p, xx, yy):
        def loss_fn(pp):
            logits, _ = forward(pp, xx, mcfg, ecfg_std, train=True)
            return cross_entropy(logits, yy, reduction="sum")

        return jax.grad(loss_fn)(p)

    t_std = time_fn(fwd_bwd_std, (params, x, labels), iters=args.iters)
    print(f"standard-engine fwd+bwd: {t_std*1e3:.2f} ms", flush=True)

    fused_resnet._FUSED_WINS = set()
    t_control = measure()
    print(f"control (all-XLA chain): {t_control*1e3:.2f} ms", flush=True)

    rows = []
    winners = []
    keys = conv_site_keys(mcfg)
    if args.limit:
        keys = keys[: args.limit]
    for key in keys:
        fused_resnet._FUSED_WINS = {key}
        try:
            t = measure()
        except Exception as e:  # Mosaic rejection at this site
            rows.append({"site": key, "error": str(e)[:200]})
            print(f"{key}: FAILED ({str(e)[:80]})", flush=True)
            continue
        delta_pct = (t_control - t) / t_control * 100
        win = delta_pct > args.noise_pct
        rows.append({
            "site": key, "step_ms": round(t * 1e3, 2),
            "delta_pct": round(delta_pct, 2), "win": win,
        })
        if win:
            winners.append(key)
        print(f"{key}: {t*1e3:.2f} ms ({delta_pct:+.1f}%)"
              f"{'  <-- WIN' if win else ''}", flush=True)
    fused_resnet._FUSED_WINS = set()

    env = ";".join(",".join(str(v) for v in k) for k in winners)
    result = {
        "control_ms": round(t_control * 1e3, 2),
        "standard_engine_fwd_bwd_ms": round(t_std * 1e3, 2),
        "control_note": "control is the fused-chain (conv_chain_xla)"
                        " dataflow the hybrid engine falls back to, NOT"
                        " the standard engine; the standard row above is"
                        " the sanity anchor vs bench.py's step_ms",
        "batch": args.batch, "dtype": args.dtype,
        "projections": args.projections,
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "sites": rows,
        "winners_env": env,
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
