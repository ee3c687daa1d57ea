#!/bin/bash
# Round-4 final hardware benches. Also prewarms the persistent compile
# cache for the driver's exact default (mode, B) grid.
set -o pipefail
export PYTHONPATH=/root/repo:${PYTHONPATH}
cd /root/repo || exit 1
mkdir -p results/hw_r4

run() {  # run <timeout_s> <logname> <cmd...>
    local t=$1 log=$2; shift 2
    echo "=== $(date +%H:%M:%S) $log: $*"
    timeout "$t" "$@" > "results/hw_r4/$log.json" 2> "results/hw_r4/$log.log"
    local rc=$?
    echo "--- rc=$rc"; tail -2 "results/hw_r4/$log.json"
}

# 1. Driver-default grid (the headline + cache prewarm).
run 6500 bench_default python bench.py

# 2. 8B @ 96K with the W4 matvec (round-3: 5.31 tok/s; target ~15).
run 3000 bench_8b python bench.py --model llama-3.1-8b \
    --modes block_topk4 --mode block_topk4 --weight-quant int4 \
    --baseline-tps 1 --max-batch 2

# 3. W4A8 1B rows (dense + flagship) — was 77.9 / 203.7 with the old
#    unpack-transient path.
run 3600 bench_w4 python bench.py --weight-quant int4 \
    --modes full,block_topk4 --mode block_topk4

# 4. Real 96K prefill row (unchanged kernels; JSON now prefill-typed).
run 2000 bench_prefill python bench.py --modes prefill --mode prefill \
    --baseline-tps 1

echo "R4 BENCH DONE $(date +%H:%M:%S)"
