"""Production soak: sustained real-chip training with mid-run kill -9 and
resume (round-4 verdict item #5).

The reference demonstrably trained ~88k steps and resumed mid-run
(LOAD_FROM_DUMP_ID = 88000, resnet_cudnn.cu:3591); this repo's checkpoint
machinery (atomic rename-publish, async writer, latest-discovery) had
never run under those conditions. This driver:

  1. launches the REAL trainer CLI (resnet50, b256 bf16, standard
     topology, device-resident synthetic rotation so the tunneled chip
     runs at full step cadence), async checkpoints every 1000 steps
  2. samples the trainer's RSS every few seconds
  3. kill -9's it mid-run (by PID, between checkpoints, no warning)
  4. relaunches with --resume-from latest for the remaining steps
  5. audits the evidence: metrics.jsonl throughput series (drift,
     first-vs-last), RSS growth, checkpoint-dir integrity (every dump
     complete), exact resume continuity (first step of run 2 == the dump
     id it resumed from; lr/loss stream continues)

Writes docs/soak_r4.json.

Usage (real chip, ~1h): python tools/soak.py --steps 25000 --kill-at 1080
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def rss_kb(pid: int):
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1])
    except OSError:
        return None
    return None


def launch(args, resume: bool, steps: int):
    cmd = [
        sys.executable, "-m", "resnet_tpu.train.cli",
        "--model", args.model, "--projections", "standard",
        "--synthetic",
    ] + (["--space-to-depth"] if args.model != "tiny" else []) + [
        "--device-batches", str(args.device_batches),
        "--batch-size", str(args.batch), "--dtype", "bfloat16",
        "--steps", str(steps),
        "--checkpoint-dir", args.dir,
        "--checkpoint-every", str(args.checkpoint_every),
        "--async-checkpoint", "--log-every", str(args.log_every),
        "--no-mesh",
    ]
    if resume:
        cmd += ["--resume-from", "latest"]
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache")
    return subprocess.Popen(
        cmd, cwd=REPO, env=env,
        stdout=open(os.path.join(args.dir, "soak_stdout.log"), "a"),
        stderr=subprocess.STDOUT,
    )


def monitor(proc, samples, deadline=None):
    """Sample RSS until the process exits (or deadline passes — then the
    caller kills). Returns 'exited' | 'deadline'."""
    while True:
        rc = proc.poll()
        if rc is not None:
            return "exited"
        if deadline is not None and time.time() >= deadline:
            return "deadline"
        kb = rss_kb(proc.pid)
        if kb is not None:
            samples.append({"t": round(time.time(), 1), "rss_mb": kb // 1024})
        time.sleep(5)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=25000)
    ap.add_argument("--model", default="resnet50")
    ap.add_argument("--kill-at", type=float, default=1080.0,
                    help="seconds into run 1 to kill -9 the trainer")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--device-batches", type=int, default=8)
    ap.add_argument("--checkpoint-every", type=int, default=1000)
    ap.add_argument("--log-every", type=int, default=100)
    ap.add_argument("--dir", default="/root/soak_r4")
    ap.add_argument("--out", default="docs/soak_r4.json")
    args = ap.parse_args()
    os.makedirs(args.dir, exist_ok=True)

    t_start = time.time()
    rss1, rss2 = [], []

    # ---- run 1: fresh, killed mid-flight
    p1 = launch(args, resume=False, steps=args.steps)
    why = monitor(p1, rss1, deadline=time.time() + args.kill_at)
    killed_pid = None
    if why == "deadline":
        killed_pid = p1.pid
        os.kill(p1.pid, signal.SIGKILL)  # the reference got no warning either
        p1.wait()
    rc1 = p1.returncode

    sys.path.insert(0, REPO)
    from resnet_tpu.train.checkpoint import (
        discover_latest_dump,
        dump_id_dir,
        parse_trainer_checkpoint,
    )

    latest = discover_latest_dump(args.dir)
    assert latest is not None, "no complete checkpoint found after kill"

    # ---- run 2: resume from latest, run the remainder
    remaining = max(args.steps - latest, 1)
    p2 = launch(args, resume=True, steps=remaining)
    monitor(p2, rss2)  # to completion
    rc2 = p2.returncode
    wall = time.time() - t_start

    # ---- audit
    jsonl = os.path.join(args.dir, "metrics.jsonl")
    recs = [json.loads(l) for l in open(jsonl)] if os.path.exists(jsonl) else []
    ips = [r for r in recs if r.get("images_per_sec")]
    steps_logged = [r["step"] for r in recs]

    # resume continuity: run 2's first logged step must be exactly the
    # dump id (the dump is taken BEFORE the update at that step)
    split = None
    for i in range(1, len(steps_logged)):
        if steps_logged[i] <= steps_logged[i - 1]:
            split = i
            break
    resume_first_step = steps_logged[split] if split is not None else None

    # checkpoint-dir integrity: every published dump is complete
    import re as _re

    dumps = sorted(
        int(d) for d in os.listdir(args.dir)
        if _re.fullmatch(r"\d{8}", d)
    )
    complete = {}
    for d in dumps:
        try:
            meta = parse_trainer_checkpoint(
                os.path.join(dump_id_dir(args.dir, d),
                             "trainer_checkpoint.txt")
            )
            complete[d] = bool(meta)
        except Exception:
            complete[d] = False
    # staging dirs are named "<id>.tmp-<pid>" (checkpoint.py); a kill -9
    # mid-write leaves exactly that pattern behind
    partials = [
        d for d in os.listdir(args.dir)
        if d.startswith(".") or ".tmp" in d
    ]

    def series(vals):
        if not vals:
            return None
        import numpy as np

        a = np.asarray(vals, float)
        k = max(1, len(a) // 10)
        return {
            "mean": round(float(a.mean()), 1),
            "min": round(float(a.min()), 1),
            "max": round(float(a.max()), 1),
            "first_decile_mean": round(float(a[:k].mean()), 1),
            "last_decile_mean": round(float(a[-k:].mean()), 1),
            "n": len(a),
        }

    out = {
        "config": {
            "model": args.model, "topology": "standard", "batch": args.batch,
            "dtype": "bfloat16", "space_to_depth": True,
            "input": f"device-resident synthetic rotation x{args.device_batches}"
                     " (zero per-step H2D: the tunnel moves ~80MB/s, so"
                     " host-fed batches would measure the tunnel, not the"
                     " trainer; shard-fed composition is measured separately"
                     " in the bench --data shards artifact)",
            "checkpoint_every": args.checkpoint_every,
            "async_checkpoint": True,
            "steps_requested": args.steps,
        },
        "run1": {"returncode": rc1, "killed": killed_pid is not None,
                 "kill_after_s": args.kill_at if killed_pid else None},
        "run2": {"returncode": rc2, "resumed_from_dump": latest,
                 "steps_remaining": remaining},
        "wall_seconds": round(wall, 1),
        "steps_logged": len(steps_logged),
        "final_step": steps_logged[-1] if steps_logged else None,
        "throughput_img_s": series([r["images_per_sec"] for r in ips]),
        "rss_mb_run1": series([s["rss_mb"] for s in rss1]),
        "rss_mb_run2": series([s["rss_mb"] for s in rss2]),
        "checkpoints": {
            "ids": dumps,
            "all_complete": all(complete.values()),
            "partial_artifacts_left": partials,
        },
        "resume": {
            "latest_at_kill": latest,
            "run2_first_logged_step": resume_first_step,
            "exact_continuation": resume_first_step == latest,
        },
    }
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({
        "soak": "done", "wall_s": out["wall_seconds"],
        "final_step": out["final_step"],
        "throughput": out["throughput_img_s"],
        "resume_exact": out["resume"]["exact_continuation"],
        "ckpts_complete": out["checkpoints"]["all_complete"],
    }))


if __name__ == "__main__":
    main()
