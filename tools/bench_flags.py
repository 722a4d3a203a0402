"""XLA compiler-option sweep for the full train step.

Env XLA_FLAGS does NOT propagate through the remote TPU compile helper on
this stack (round-1 finding), but per-jit ``compiler_options`` ride inside
the compile request itself — this sweeps the candidates over the real
step and slope-times each compiled executable.

Usage:
  python tools/bench_flags.py                 # sweep presets
  python tools/bench_flags.py --probe         # just test option plumbing
  python tools/bench_flags.py --options '{"xla_tpu_scoped_vmem_limit_kib":"65536"}'

Prints one JSON line per experiment.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PRESETS = {
    "baseline": {},
    "vmem_64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem_32m": {"xla_tpu_scoped_vmem_limit_kib": "32768"},
    # round-5: the r4 ledger attributes 2.4GB/step to 1661 copy-start
    # spills — a larger scoped-VMEM budget lets memory-space assignment
    # keep more operands resident instead of bouncing them through HBM
    "vmem_96m": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    "lhs": {"xla_tpu_enable_latency_hiding_scheduler": "true"},
    "no_min_alloc": {"xla_tpu_enable_aggressive_instruction_fusion": "true"},
    "fusion_vmem": {
        "xla_tpu_enable_aggressive_instruction_fusion": "true",
        "xla_tpu_scoped_vmem_limit_kib": "65536",
    },
    "no_rwb": {"xla_tpu_rwb_fusion": "false"},
    "no_multi_output": {"xla_tpu_enable_multi_output_fusion": "false"},
    # --- backward-scheduling matrix (round-4 verdict item #2c): every
    # scheduler libtpu 0.0.34 exposes, plus the compile-time autotuners.
    # The roofline ledger (docs/step_roofline_r4.json) puts the step AT its
    # HBM floor, so these can only shuffle overlap — the matrix commits
    # the measured proof.
    "sched_ilp": {"xla_tpu_enable_ilp_latency_hiding_scheduler": "true"},
    "sched_brkga": {"xla_tpu_enable_brkga_latency_hiding_scheduler": "true"},
    "sched_layer": {"xla_tpu_enable_latency_hiding_layer_scheduler": "true"},
    "sched_all_experimental": {
        "xla_tpu_enable_all_experimental_scheduler_features": "true"
    },
    "autotune_schedules": {"xla_tpu_autotune_schedules": "true"},
    "autotune_msa": {"xla_tpu_autotune_memory_space_assignment": "true"},
    "autotune_fusions": {"xla_tpu_autotune_fusions": "true"},
    "lp_llo": {"xla_tpu_consider_lp_llo_scheduler": "true"},
}


def build(batch: int, dim: int, kernels: str, remat: str,
          projections: str = "standard"):
    import jax

    from resnet_tpu.config import (
        DataConfig,
        ExecutionConfig,
        OptimizerConfig,
        TrainConfig,
        model_config,
    )
    from resnet_tpu.train import init_train_state, make_train_step
    from resnet_tpu.train.step import train_step
    import functools

    cfg = TrainConfig(
        model=model_config(
            "resnet50", input_dim=dim,
            stride_projection_kernel=3 if projections == "reference" else 1,
        ),
        execution=ExecutionConfig(
            kernels=kernels, compute_dtype="bfloat16",
            matmul_precision="default", remat=remat,
        ),
        optimizer=OptimizerConfig(),
        data=DataConfig(batch_size=batch, synthetic=True),
    )
    state = init_train_state(cfg)
    rng = np.random.default_rng(0)
    b = {
        "images": jax.device_put(
            rng.normal(0, 50, (batch, dim, dim, 3)).astype(np.float32)
        ),
        "labels": jax.device_put(rng.integers(0, 1000, (batch,)).astype(np.int32)),
    }
    fn = functools.partial(train_step, cfg=cfg)
    return fn, cfg, state, b


def time_step(compiled, state, b, steps: int) -> float:
    import jax

    def run(s, n):
        t0 = time.perf_counter()
        m = None
        for _ in range(n):
            s, m = compiled(s, b)
        _ = float(jax.device_get(m["loss"]))
        return time.perf_counter() - t0, s

    _, state = run(state, 3)
    n_small = max(2, steps // 4)
    t_small, state = run(state, n_small)
    t_big, state = run(state, steps)
    return (t_big - t_small) / (steps - n_small)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--dim", type=int, default=224)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--kernels", default="xla")
    ap.add_argument("--remat", default="none")
    ap.add_argument("--projections", default="standard",
                    choices=["standard", "reference"])
    ap.add_argument("--probe", action="store_true")
    ap.add_argument("--options", default="", help="JSON dict of compiler options")
    ap.add_argument("--presets", nargs="*", default=list(PRESETS))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.probe:
        # bogus option: if the compiler PARSES options, this errors; if
        # options are silently dropped, it compiles fine -> plumbing dead
        f = jax.jit(lambda x: x * 2)
        lowered = f.lower(jnp.ones((8, 8)))
        try:
            lowered.compile(compiler_options={"xla_bogus_option_xyz": "1"})
            print(json.dumps({"probe": "options_ignored_or_accepted"}))
        except Exception as e:
            print(json.dumps({"probe": "options_parsed", "error": str(e)[:200]}))
        try:
            lowered.compile(
                compiler_options={"xla_tpu_scoped_vmem_limit_kib": "65536"}
            )
            print(json.dumps({"probe_vmem": "accepted"}))
        except Exception as e:
            print(json.dumps({"probe_vmem": "rejected", "error": str(e)[:200]}))
        return

    from resnet_tpu.train import init_train_state

    fn, cfg, state, b = build(args.batch, args.dim, args.kernels, args.remat,
                              args.projections)
    lowered = jax.jit(fn, donate_argnums=(0,)).lower(state, b)

    experiments = (
        {"custom": json.loads(args.options)} if args.options
        else {k: PRESETS[k] for k in args.presets}
    )
    for name, opts in experiments.items():
        try:
            t0 = time.perf_counter()
            compiled = lowered.compile(compiler_options=opts or None)
            compile_s = time.perf_counter() - t0
            # fresh state per experiment: the previous one was donated away
            state = init_train_state(cfg)
            dt = time_step(compiled, state, b, args.steps)
            print(json.dumps({
                "experiment": name, "options": opts,
                "step_ms": round(dt * 1e3, 2),
                "images_per_sec": round(args.batch / dt, 1),
                "compile_s": round(compile_s, 1),
            }), flush=True)
        except Exception as e:
            print(json.dumps({"experiment": name, "error": str(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
