#!/bin/bash
# Round-5 phase E: RULER at contexts where the budgets bind (VERDICT
# items 2+4). Byte-LM v2, target 768 words (~4.5-5K byte context), n=50.
#   Headline: 5 configs x 13 tasks  (full, lsh, block_topk4, quest, topk)
#   Diagnostic (budget-matched, 7 discriminating tasks): topk@2.5%,
#   block_topk(128)@2.5%, lsh L=300, lsh debias=none.
set -o pipefail
export PYTHONPATH=/root/repo:${PYTHONPATH}
cd /root/repo || exit 1
CK=${CK:-data/ruler_lm_v2.npz}
[ -f "$CK" ] || CK=data/ruler_lm.npz
SEQ=${SEQ:-1152}   # ~4.2-5K BYTE context (the engine's real sequence
                   # length; the generator's word-count target maps ~3.7x)
N=${N:-50}
ML=$((SEQ * 6))
OUT=results/ruler_r5
mkdir -p $OUT
DISC="niah_single_1 niah_single_2 niah_single_3 niah_multikey_1 niah_multiquery niah_multivalue vt"

run() {  # run <log> <extra args...>
    local log=$1; shift
    echo "=== $log: $*" | tee -a $OUT/runbook.log
    # watchdog: axon dispatch-wedge kills this leg's predecessor; every
    # run is prediction-file resumable, so stall -> kill pgid -> relaunch
    python scratch/watchdog.py --stall 600 --retries 4 --timeout 9000 \
        --log $OUT/$log.log --watch "$OUT/**/*.jsonl" -- \
        python examples/ruler_eval.py --npz $CK --seq $SEQ \
        --samples $N --max-length $ML --out $OUT "$@"
    local rc=$?
    tail -3 $OUT/$log.log | tee -a $OUT/runbook.log
    echo "=== $log rc=$rc" | tee -a $OUT/runbook.log
}

# anchors (needed by both the headline table and the diagnostics)
run full --K 0
run lsh --estimator lsh --K 10 --L 150 --offload-quant int8
# budget-matched diagnostics (VERDICT #2) — run BEFORE the headline
# extras so a schedule squeeze drops lower-value rows first
run topk25 --estimator topk --budget-frac 0.025 --tag _bf025 --tasks $DISC
# block 256 is the smallest compiled block_attend admits at d=64
# (rows/(fold) % 128); its 1-block floor realizes ~6% coverage — the
# closest block_topk gets to lsh's ~2.5% at this context.
run bt25 --estimator block_topk --block-size 256 --budget-frac 0.025 \
    --offload-quant int8 --tag _bf025 --tasks $DISC
run lshL300 --estimator lsh --K 11 --L 300 --offload-quant int8 --tasks $DISC
run lshnodb --estimator lsh --K 10 --L 150 --offload-quant int8 \
    --debias none --tag _nodebias --tasks $DISC
# headline extras (VERDICT #4: Quest/TopK RULER rows)
run bt4 --estimator block_topk --offload-quant int4 --tag _bt4
run quest --estimator quest
run topk --estimator topk
echo "PHASE E DONE"
