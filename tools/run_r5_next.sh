#!/bin/bash
# Round-5 chip stage chain #2 (after accum sweep): the untried
# spill-row lever (scoped-VMEM / fusion presets), the accum=2 ledger
# capture, and the hybrid-sites re-measure with the fixed control.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
L=r5_logs
# wait for the accum sweep to release the chip
while kill -0 "$(cat /tmp/sweep2.pid 2>/dev/null)" 2>/dev/null; do sleep 30; done

echo "== vmem/fusion flags $(date +%H:%M)" >> $L/next.err
timeout 7200 python tools/bench_flags.py \
  --presets baseline vmem_32m vmem_64m vmem_96m lhs no_min_alloc fusion_vmem no_rwb no_multi_output \
  > $L/flags_vmem.jsonl 2>> $L/next.err

echo "== roofline accum=2 $(date +%H:%M)" >> $L/next.err
timeout 3600 python tools/step_roofline.py --grad-accum 2 \
  --out docs/step_roofline_r5_accum2.json \
  --rows-out $L/roofline_rows_accum2.jsonl \
  --hlo-out $L/step_hlo_b256_accum2.txt \
  > $L/roofline_accum2.out 2>> $L/next.err

echo "== hybrid sites $(date +%H:%M)" >> $L/next.err
timeout 7200 python tools/bench_hybrid_sites.py \
  --out docs/hybrid_sites_r5.json > $L/hybrid.out 2>> $L/next.err

echo "next-chain done $(date +%H:%M)" >> $L/next.err
