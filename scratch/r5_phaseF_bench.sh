#!/bin/bash
# Round-5 final hardware benches. First full run doubles as the compile
# prewarm for the driver's exact default (mode, B) grid (VERDICT item 8:
# no row decided by a cold compile — incl. lsh, whose program changed
# this round with the fused scan+attend kernel).
set -o pipefail
export PYTHONPATH=/root/repo:${PYTHONPATH}
cd /root/repo || exit 1
mkdir -p results/hw_r5

run() {  # run <timeout_s> <logname> <cmd...>
    local t=$1 log=$2; shift 2
    echo "=== $(date +%H:%M:%S) $log: $*"
    timeout "$t" "$@" > "results/hw_r5/$log.json" 2> "results/hw_r5/$log.log"
    local rc=$?
    echo "--- rc=$rc"; tail -2 "results/hw_r5/$log.json"
}

# 1. Driver-default grid (headline + cache prewarm; lsh fused2 first run).
run 8000 bench_default python bench.py

# 2. lsh-focused: let the batch search resolve by capacity with a warm
#    cache (round-4 weak#7: B=3 died to a cold 500 s fill compile).
run 5000 bench_lsh python bench.py --modes lsh --mode lsh --baseline-tps 1 \
    --attempt-timeout 1800

# 3. 8B @ 96K W4 flagship (round-4: 36.3 tok/s; target >= 45).
run 3600 bench_8b python bench.py --model llama-3.1-8b \
    --modes block_topk4 --mode block_topk4 --weight-quant int4 \
    --baseline-tps 1 --max-batch 2

# 4. Prefill row.
run 2000 bench_prefill python bench.py --modes prefill --mode prefill \
    --baseline-tps 1

# 5. Re-run the default grid warm (the numbers the driver should see).
run 5000 bench_default_warm python bench.py

echo "R5 BENCH DONE $(date +%H:%M:%S)"
