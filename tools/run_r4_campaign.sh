#!/bin/bash
# Chip campaign: strictly serial (one chip, one host core — any
# overlap contaminates slope timings). Each stage logs to $LOG (inside
# the repo so a VM restart cannot wipe the evidence — r5 lesson: the
# r5 gate results briefly lived only in /root/r4_logs and were lost);
# a failed stage does not block the rest. Run stages selectively:
#   bash tools/run_r4_campaign.sh parity bench phase
# or everything: bash tools/run_r4_campaign.sh all
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
LOG="${CAMPAIGN_LOG:-/root/repo/r5_logs}"
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

if want parity; then
  echo "== TPU parity (blockfused precision revalidation) $(date +%H:%M)"
  RESNET_TPU_TEST_PLATFORM=axon,cpu timeout 2400 \
    python -m pytest tests/test_tpu_parity.py -m tpu -q \
    > "$LOG/parity.log" 2>&1
  tail -2 "$LOG/parity.log"
fi

if want bench; then
  echo "== bench dual topology $(date +%H:%M)"
  timeout 1200 python bench.py > "$LOG/bench_dual.json" 2> "$LOG/bench_dual.err"
  cat "$LOG/bench_dual.json"
fi

if want phase; then
  echo "== phase-bwd experiment $(date +%H:%M)"
  timeout 6000 python tools/bench_phase_bwd.py > "$LOG/phase.log" 2>&1
  tail -3 "$LOG/phase.log"
fi

if want shards; then
  echo "== shards-fed bench $(date +%H:%M)"
  timeout 1800 python bench.py --data shards --steps 12 --warmup 2 \
    > "$LOG/shards.json" 2> "$LOG/shards.err"
  cat "$LOG/shards.json"
fi

# soak + conv are verdict items with NO existing artifact — they run
# BEFORE the flags/hybrid re-measures so a short chip window still
# produces the missing evidence.
if want soak; then
  echo "== soak (~55 min) $(date +%H:%M)"
  timeout 5400 python tools/soak.py --steps 25000 --kill-at 1100 \
    > "$LOG/soak.log" 2>&1
  tail -2 "$LOG/soak.log"
fi

if want conv; then
  echo "== convergence proxy $(date +%H:%M)"
  timeout 5400 python tools/convergence_run.py --steps 12000 \
    > "$LOG/convergence.log" 2>&1
  tail -3 "$LOG/convergence.log"
fi

if want flags; then
  echo "== scheduler flag matrix $(date +%H:%M)"
  timeout 7200 python tools/bench_flags.py --presets baseline sched_ilp \
    sched_brkga sched_layer sched_all_experimental autotune_schedules \
    autotune_msa autotune_fusions lp_llo \
    > "$LOG/flags.jsonl" 2> "$LOG/flags.err"
  tail -9 "$LOG/flags.jsonl"
fi

if want hybrid; then
  echo "== hybrid sites re-measure $(date +%H:%M)"
  timeout 7200 python tools/bench_hybrid_sites.py --limit 8 \
    --out docs/hybrid_sites_r4.json > "$LOG/hybrid.log" 2>&1
  tail -3 "$LOG/hybrid.log"
fi

if want fusedxla; then
  echo "== fusedxla roofline (long compile) $(date +%H:%M)"
  timeout 3600 python tools/step_roofline.py --kernels fusedxla \
    --out docs/roofline_fusedxla_r4.json \
    --rows-out docs/roofline_fusedxla_r4_rows.jsonl \
    > "$LOG/fusedxla.log" 2>&1
  tail -3 "$LOG/fusedxla.log"
fi

# re-measures of already-committed artifacts run LAST: the r4 roofline
# ledger already exists (re-derived offline from the saved HLO) and the
# batch sweep is exploratory.
if want roofline; then
  echo "== roofline recapture (full sidecar: per-row ledger + HLO) $(date +%H:%M)"
  timeout 2400 python tools/step_roofline.py \
    --out docs/step_roofline_r4.json \
    --rows-out docs/step_roofline_r4_rows.jsonl \
    --hlo-out "$LOG/step_hlo_b256.txt" \
    > "$LOG/roofline.log" 2>&1
  tail -2 "$LOG/roofline.log"
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

echo "campaign done $(date +%H:%M)"
