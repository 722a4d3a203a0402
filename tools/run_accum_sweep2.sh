#!/bin/bash
# Round-5 accum sweep extension: variance repeats of the two winners +
# microbatch-128 at larger global batches. Serial; logs in-repo.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
OUT=r5_logs/accum_sweep2.jsonl
ERR=r5_logs/accum_sweep2.err
run() {
  echo "== b$1 accum$2 rep$3 $(date +%H:%M:%S)" >> "$ERR"
  timeout 1200 python bench.py --batch-size "$1" --grad-accum "$2" \
    --steps 16 --no-dual >> "$OUT" 2>> "$ERR"
}
run 256 2 1
run 512 4 1
run 256 2 2
run 512 4 2
run 1024 8 1
run 768 6 1
run 256 1 1
echo "sweep2 done $(date +%H:%M:%S)" >> "$ERR"
