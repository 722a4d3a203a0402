#!/bin/bash
# Round-5 chip campaign: strictly serial (one chip, one host core — any
# overlap contaminates slope timings). Each stage logs to /root/r5_logs;
# a failed stage does not block the rest. Run stages selectively:
#   bash tools/run_r5_campaign.sh parity bench flags
# or everything: bash tools/run_r5_campaign.sh all
#
# STANDING POLICY (round-4 lesson, VERDICT weak #7): the driver gates
# (parity, bench) bank FIRST; no speculative >20-min compile is ever
# scheduled before them. fusedxla (a >25-min compile that may have
# killed the r4 tunnel) runs LAST.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
LOG=/root/r5_logs
mkdir -p "$LOG"

want() {
  for a in "$@"; do for s in $STAGES; do
    [ "$s" = "$a" ] || [ "$s" = all ] && return 0
  done; done
  return 1
}
STAGES="${*:-all}"

# wait for the tunneled chip (outage-resilient start): probe with fresh
# short-lived processes; a hung backend init cannot wedge the campaign
echo "waiting for TPU... $(date +%H:%M)"
while true; do
  if timeout 50 python -c "import jax; d=jax.devices(); assert d[0].platform=='tpu'" 2>/dev/null; then
    echo "TPU up $(date +%H:%M)"; break
  fi
  sleep 90
done
touch "$LOG/TPU_UP"

# ---- gates first ----
if want parity; then
  echo "== TPU parity (11 compiled-Mosaic tests) $(date +%H:%M)"
  RESNET_TPU_TEST_PLATFORM=axon,cpu timeout 2400 \
    python -m pytest tests/test_tpu_parity.py -m tpu -q \
    > "$LOG/parity.log" 2>&1
  tail -2 "$LOG/parity.log"
fi

if want bench; then
  echo "== bench dual topology (the BENCH gate's number) $(date +%H:%M)"
  timeout 1800 python bench.py > "$LOG/bench_dual.json" 2> "$LOG/bench_dual.err"
  cat "$LOG/bench_dual.json"
fi

# ---- ledger-guided traffic attack (VERDICT r4 item #3) ----
if want flags; then
  echo "== scheduler/VMEM flag matrix vs the 2.4GB copy-start spills $(date +%H:%M)"
  timeout 9000 python tools/bench_flags.py --presets baseline vmem_96m \
    vmem_64m vmem_32m autotune_msa sched_ilp sched_brkga sched_layer \
    sched_all_experimental autotune_schedules autotune_fusions lp_llo \
    > "$LOG/flags.jsonl" 2> "$LOG/flags.err"
  tail -12 "$LOG/flags.jsonl"
fi

if want phase; then
  echo "== phase-plane s2 backward (changes the top backward fusions) $(date +%H:%M)"
  timeout 6000 python tools/bench_phase_bwd.py > "$LOG/phase.log" 2>&1
  tail -3 "$LOG/phase.log"
fi

if want roofline; then
  echo "== roofline r5 recapture (computed floor for THIS HLO) $(date +%H:%M)"
  timeout 2400 python tools/step_roofline.py \
    --out docs/step_roofline_r5.json \
    --rows-out docs/step_roofline_r5_rows.jsonl \
    --hlo-out "$LOG/step_hlo_b256_r5.txt" \
    > "$LOG/roofline.log" 2>&1
  tail -2 "$LOG/roofline.log"
fi

# ---- missing-evidence stages (no artifact exists yet) ----
if want soak; then
  echo "== soak ~55 min, kill -9 + resume mid-run $(date +%H:%M)"
  timeout 5400 python tools/soak.py --steps 25000 --kill-at 1100 \
    --dir /root/soak_r5 --out docs/soak_r5.json > "$LOG/soak.log" 2>&1
  tail -2 "$LOG/soak.log"
fi

if want conv; then
  echo "== convergence proxy 12k steps $(date +%H:%M)"
  timeout 7200 python tools/convergence_run.py --steps 12000 \
    --out docs/convergence_r5.json > "$LOG/convergence.log" 2>&1
  tail -3 "$LOG/convergence.log"
fi

if want shards; then
  echo "== composed input path: shards-fed bench $(date +%H:%M)"
  timeout 1800 python bench.py --data shards --steps 12 --warmup 2 \
    > "$LOG/shards.json" 2> "$LOG/shards.err"
  cat "$LOG/shards.json"
fi

if want hybrid; then
  echo "== hybrid sites re-measure (fixed control) $(date +%H:%M)"
  timeout 7200 python tools/bench_hybrid_sites.py --limit 8 \
    --out docs/hybrid_sites_r5.json > "$LOG/hybrid.log" 2>&1
  tail -3 "$LOG/hybrid.log"
fi

if want batchsweep; then
  echo "== batch-size / accum spill sweep $(date +%H:%M)"
  { for b in 128 192 256; do
      timeout 900 python bench.py --batch-size $b --steps 16 --no-dual
    done
    timeout 900 python bench.py --batch-size 256 --grad-accum 2 --steps 16 --no-dual
  } > "$LOG/batchsweep.jsonl" 2> "$LOG/batchsweep.err"
  cat "$LOG/batchsweep.jsonl"
fi

# ---- risky long compile LAST (possible r4 tunnel killer) ----
if want fusedxla; then
  echo "== fusedxla roofline byte-ledger (>25-min compile) $(date +%H:%M)"
  timeout 3600 python tools/step_roofline.py --kernels fusedxla \
    --out docs/roofline_fusedxla_r5.json \
    --rows-out docs/roofline_fusedxla_r5_rows.jsonl \
    > "$LOG/fusedxla.log" 2>&1
  tail -3 "$LOG/fusedxla.log"
fi

echo "campaign done $(date +%H:%M)"
