"""In-step measurement of the phase-plane stride-2 backward-data axis
(round-4 verdict experiment #2b) — control vs RESNET_TPU_S2_PHASE_BWD=1
on both topologies, assembled into docs/backward_experiments_r4.json.

Each leg runs bench.py in a fresh subprocess (the env flag is read at
import). The reference topology has 4 extra 3x3/s2 convs (the projection
quirk), so it is the axis's best case.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_leg(projections: str, phase: bool, steps: int = 20):
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache")
    env["RESNET_TPU_S2_PHASE_BWD"] = "1" if phase else "0"
    out = subprocess.run(
        [sys.executable, "bench.py", "--no-dual", "--projections",
         projections, "--steps", str(steps)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=3000,
    )
    if out.returncode != 0:
        return {"error": out.stderr[-500:]}
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    legs = {}
    for proj in ("standard", "reference"):
        for phase in (False, True):
            key = f"{proj}_{'phase' if phase else 'control'}"
            legs[key] = run_leg(proj, phase)
            print(key, json.dumps(legs[key]), flush=True)

    def delta(proj):
        c = legs[f"{proj}_control"].get("value")
        p = legs[f"{proj}_phase"].get("value")
        if not (c and p):
            return None
        return round((p - c) / c * 100, 2)

    result = {
        "experiment": "phase-plane stride-2 backward-data "
                      "(RESNET_TPU_S2_PHASE_BWD; ops/conv.py)",
        "legs": legs,
        "delta_pct": {
            "standard": delta("standard"),
            "reference": delta("reference"),
        },
    }
    path = os.path.join(REPO, "docs", "backward_experiments_r4.json")
    existing = {}
    if os.path.exists(path):
        existing = json.load(open(path))
    existing["phase_bwd"] = result
    with open(path, "w") as f:
        json.dump(existing, f, indent=1)
    print(json.dumps({"phase_bwd_delta_pct": result["delta_pct"]}))


if __name__ == "__main__":
    main()
