#!/bin/bash
# Round-5 re-planned tail (launched after killing chain2 post-diagnostics):
#   quest RULER row (reference's headline comparison) -> phase F benches
#   -> trimmed phase D (32K) -> topk/bt4 RULER extras if time remains.
set -o pipefail
cd /root/repo || exit 1
M=results/r5_chain3.log
OUT=results/ruler_r5
CK=data/ruler_lm_v2.npz
SEQ=1152; N=50; ML=$((SEQ * 6))
echo "=== chain3 start $(date +%H:%M:%S)" | tee -a $M

runR() {
    local log=$1; shift
    echo "=== $log: $*" | tee -a $OUT/runbook.log
    python scratch/watchdog.py --stall 600 --retries 4 --timeout 7200 \
        --log $OUT/$log.log --watch "$OUT/**/*.jsonl" -- \
        python examples/ruler_eval.py --npz $CK --seq $SEQ \
        --samples $N --max-length $ML --out $OUT "$@"
    echo "=== $log rc=$?" | tee -a $OUT/runbook.log
}

runR quest --estimator quest
echo "=== quest done $(date +%H:%M:%S)" | tee -a $M
bash scratch/r5_phaseF_bench.sh 2>&1 | tee -a $M
echo "=== phase F done $(date +%H:%M:%S)" | tee -a $M
bash scratch/r5_phaseD_32k.sh 2>&1 | tail -20 | tee -a $M
echo "=== phase D done $(date +%H:%M:%S)" | tee -a $M
runR topk --estimator topk
runR bt4 --estimator block_topk --offload-quant int4 --tag _bt4
echo "=== CHAIN3 DONE $(date +%H:%M:%S)" | tee -a $M
