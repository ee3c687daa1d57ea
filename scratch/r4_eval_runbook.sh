#!/bin/bash
# Round-4 evidence runbook: runs AFTER examples/train_ruler_lm.py finishes.
# Chains (one TPU client at a time):
#   1. RULER 13-task suite on the byte-LM: full, block_topk, lsh
#      (the discriminating run — round-3 verdict item 5)
#   2. needle 16K curriculum stage (shortened)
#   3. accuracy sweeps: n=500-grade rows at 8192/16384, 1-needle probe,
#      multiquery (round-3 verdict item 1b)
set -o pipefail
export PYTHONPATH=/root/repo:${PYTHONPATH}
cd /root/repo || exit 1
mkdir -p results/ruler_r4 results/accuracy_r4
R=results/accuracy_r4

run() {  # run <timeout_s> <logname> <cmd...>
    local t=$1 log=$2; shift 2
    echo "=== $(date +%H:%M:%S) $log: $*" | tee -a $R/runbook.log
    timeout "$t" "$@" > "$R/$log.log" 2>&1
    local rc=$?
    tail -3 "$R/$log.log" | grep -v WARNING | tee -a $R/runbook.log
    echo "=== $log rc=$rc" | tee -a $R/runbook.log
    return $rc
}

# Wait for the byte-LM training to finish (checkpoint appears).
for i in $(seq 1 200); do
    [ -f data/ruler_lm.npz ] && break
    pgrep -f train_ruler_lm.py > /dev/null || break
    sleep 30
done

if [ -f data/ruler_lm.npz ]; then
  # 1. RULER suite: full attention, then the flagship estimator, then lsh.
  run 4200 ruler_full python examples/ruler_eval.py --npz data/ruler_lm.npz \
      --seq 512 --samples 15 --K 0 --L 150 --max-length 4608 \
      --out results/ruler_r4 --seed 42
  run 4200 ruler_bt python examples/ruler_eval.py --npz data/ruler_lm.npz \
      --seq 512 --samples 15 --estimator block_topk --K 10 --L 150 \
      --max-length 4608 --out results/ruler_r4 --seed 42
  run 4200 ruler_lsh python examples/ruler_eval.py --npz data/ruler_lm.npz \
      --seq 512 --samples 15 --estimator lsh --K 10 --L 150 \
      --max-length 4608 --out results/ruler_r4 --seed 42
else
  echo "=== no ruler_lm.npz; skipping RULER" | tee -a $R/runbook.log
fi

KEY_ESTS="full,lsh_K10L150,quest_4pct,block_topk4_flagship,topk_2pct"

# 2. 16K curriculum stage (shortened: the committed ckpt saw <= 8K).
if [ ! -f data/needle_ckpt_16k.npz ]; then
  run 3600 train_16k python examples/train_needle.py --init data/needle_ckpt.npz \
      --seq 16384 --min-seq 2048 --batch 8 --steps 800 --needles 2 \
      --hop-frac 0.3 --lr 1e-4 --out data/needle_ckpt_16k.npz
fi
CK16=data/needle_ckpt_16k.npz
[ -f $CK16 ] || CK16=data/needle_ckpt.npz

# 3a. 2-needle standard rows at 8192/16384, n=500.
run 7200 std_long python examples/estimator_accuracy.py --ckpt $CK16 \
    --contexts 8192,16384 --samples 300 --needles 2 \
    --estimators "$KEY_ESTS" --out results/accuracy_r4
# 3b. 1-needle high-ceiling probe, n=500.
run 7200 probe_n1 python examples/estimator_accuracy.py --ckpt $CK16 \
    --contexts 8192,16384 --samples 300 --needles 1 \
    --estimators "$KEY_ESTS" --out results/accuracy_r4
# 3c. multiquery shape, n=300 at 8192.
run 5400 mq python examples/estimator_accuracy.py --ckpt $CK16 \
    --contexts 8192 --samples 200 --needles 2 --task multiquery \
    --estimators "$KEY_ESTS" --out results/accuracy_r4
# 3d. hop (vt-analogue) shape, n=300 at 8192.
run 5400 hop python examples/estimator_accuracy.py --ckpt $CK16 \
    --contexts 8192 --samples 200 --needles 2 --task hop \
    --estimators "$KEY_ESTS" --out results/accuracy_r4

echo "R4 EVAL RUNBOOK DONE $(date +%H:%M:%S)" | tee -a $R/runbook.log
