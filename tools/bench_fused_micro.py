"""Micro-benchmark: XLA op chain vs the fused Pallas conv at the hot
ResNet-50 shapes.

docs/optable_r2.json attributes the step time to memory-bound 1x1 convs
(~360 GB/s effective, half of achievable) plus standalone BN stats/apply
passes. The fused kernel (kernels/fused_conv.py) rides the BN apply on the
conv's input read and the BN stats on its output write — this tool measures
whether that actually beats XLA per-op on real hardware (round 1 found
whole-model Pallas conv paths slower; 1x1 is a pure matmul, no window
gather, so it may differ).

Per shape, two contenders computing the SAME function
  y = conv(relu(x*scale+shift), w); sums = [sum(y), sum(y^2)]:
  * xla:   ops/dispatch bn-apply + conv2d + one-pass batch_moments
  * fused: kernels/fused_conv.fused_conv

Prints one JSON line per (shape, engine, direction).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import zlib


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--shapes", nargs="*", default=[
        "s1_reduce", "s1_expand", "s1_3x3", "s3_reduce", "s2_proj",
    ])
    ap.add_argument("--fwd-only", action="store_true",
                    help="skip the fwd+bwd timing (halves compile count)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from resnet_tpu.kernels.fused_conv import fused_conv
    from resnet_tpu.ops.batchnorm import batch_moments
    from resnet_tpu.ops.conv import conv2d
    from resnet_tpu.utils.profiling import time_fn

    b = args.batch
    key = jax.random.key(0)
    SHAPES = {
        # name: (x_shape, k, cout, stride)
        "s1_reduce": ((b, 56, 56, 256), 1, 64, 1),
        "s1_expand": ((b, 56, 56, 64), 1, 256, 1),
        "s1_3x3": ((b, 56, 56, 64), 3, 64, 1),
        "s2_reduce": ((b, 28, 28, 512), 1, 128, 1),
        "s2_3x3": ((b, 28, 28, 128), 3, 128, 1),
        "s2_expand": ((b, 28, 28, 128), 1, 512, 1),
        "s2_3x3s2": ((b, 56, 56, 128), 3, 128, 2),
        "s3_reduce": ((b, 14, 14, 1024), 1, 256, 1),
        "s3_3x3": ((b, 14, 14, 256), 3, 256, 1),
        "s3_expand": ((b, 14, 14, 256), 1, 1024, 1),
        "s4_reduce": ((b, 7, 7, 2048), 1, 512, 1),
        "s4_3x3": ((b, 7, 7, 512), 3, 512, 1),
        "s4_expand": ((b, 7, 7, 512), 1, 2048, 1),
        "s2_proj": ((b, 56, 56, 256), 3, 512, 2),
        "s4_proj": ((b, 14, 14, 1024), 3, 2048, 2),
    }

    for name in args.shapes:
        xs, k, cout, stride = SHAPES[name]
        cin = xs[-1]
        # generate ON DEVICE: host-side numpy datagen for these sizes costs
        # minutes on a small host + a slow tunnel transfer
        ks = jax.random.split(
            jax.random.fold_in(key, zlib.crc32(name.encode())), 4
        )
        x = jax.random.normal(ks[0], xs, jnp.bfloat16)
        w = (0.05 * jax.random.normal(ks[1], (k, k, cin, cout))).astype(
            jnp.bfloat16
        )
        scale = 1.0 + 0.1 * jax.random.normal(ks[2], (cin,))
        shift = 0.1 * jax.random.normal(ks[3], (cin,))

        def xla_fn(x, w, scale, shift):
            u = jnp.maximum(
                x.astype(jnp.float32) * scale + shift, 0.0
            ).astype(x.dtype)
            y = conv2d(u, w, stride=stride, layout="NHWC", precision="default")
            m, v = batch_moments(y, "NHWC")
            return y, m, v

        def fused_fn(x, w, scale, shift):
            y, sums = fused_conv(x, w, scale, shift, stride, None, True, True)
            return y, sums

        traffic = (math.prod(xs) + math.prod(xs[:3]) // stride**2 * cout) * 2

        for engine, fn in (("xla", xla_fn), ("fused", fused_fn)):
            try:
                dt = time_fn(fn, (x, w, scale, shift), iters=args.iters)
                row = {"shape": name, "engine": engine,
                       "ms_fwd": round(dt * 1e3, 3),
                       "gbps_eff": round(traffic / dt / 1e9, 1)}
                if args.fwd_only:
                    print(json.dumps(row), flush=True)
                    continue
                # fwd+bwd wrt x and w (random cotangent on y)
                r = jax.random.normal(
                    ks[0], jax.eval_shape(fn, x, w, scale, shift)[0].shape
                )

                def fwd_bwd(x, w, scale, shift, r):
                    def loss(args2):
                        y, *_ = fn(args2[0], args2[1], scale, shift)
                        return jnp.sum(y.astype(jnp.float32) * r)
                    return jax.value_and_grad(loss)((x, w))

                dt2 = time_fn(fwd_bwd, (x, w, scale, shift, r),
                              iters=args.iters)
                row["ms_fwd_bwd"] = round(dt2 * 1e3, 3)
                print(json.dumps(row), flush=True)
            except Exception as e:
                print(json.dumps({"shape": name, "engine": engine,
                                  "error": str(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
