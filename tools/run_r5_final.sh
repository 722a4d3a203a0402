#!/bin/bash
# Round-5 chip stage chain #3: the long evidence stages.
# Order: shard regen (chip idle) -> composed shards bench -> 1h soak
# with kill -9 + resume -> 12k-step convergence at grad_accum=2.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
L=r5_logs
while kill -0 "$(cat /tmp/next.pid 2>/dev/null)" 2>/dev/null; do sleep 30; done

echo "== shard regen $(date +%H:%M)" >> $L/final.err
python - >> $L/final.err 2>&1 <<'PY'
import sys; sys.path.insert(0, 'tools'); sys.path.insert(0, '.')
from bench_input import ensure_shards
ensure_shards('/tmp/resnet_tpu_bench_shards', 4, 256, 224)
print('shards ready')
PY

echo "== shards-fed bench $(date +%H:%M)" >> $L/final.err
timeout 1800 python bench.py --data shards --steps 12 --warmup 2 --no-dual \
  > $L/shards.json 2>> $L/final.err

echo "== soak $(date +%H:%M)" >> $L/final.err
timeout 5400 python tools/soak.py --dir /root/soak_r5 \
  --out docs/soak_r5.json > $L/soak.out 2>> $L/final.err

echo "== convergence $(date +%H:%M)" >> $L/final.err
timeout 7200 python tools/convergence_run.py --steps 12000 --grad-accum 2 \
  --dir /root/convergence_r5 --out docs/convergence_r5.json \
  > $L/conv.out 2>> $L/final.err

echo "final-chain done $(date +%H:%M)" >> $L/final.err
