#!/bin/bash
# Round-5 phase C: the (three-rounds-overdue) n>=500 accuracy sweeps.
# Usage: r5_phaseC_accuracy.sh <ckpt> <contexts> [samples]
# Writes results/accuracy_r5/summary*.csv (with the new n column).
set -o pipefail
export PYTHONPATH=/root/repo:${PYTHONPATH}
cd /root/repo || exit 1
CK=${1:-data/needle_ckpt_16k.npz}
CTX=${2:-8192,16384}
N=${3:-500}
mkdir -p results/accuracy_r5
R=results/accuracy_r5
KEY_ESTS="full,lsh_K10L150,lsh_K10L150_int8,quest_4pct,block_topk4_flagship,topk_2pct"

# 2-needle standard rows (the headline table).
timeout 21600 python examples/estimator_accuracy.py --ckpt $CK \
    --contexts $CTX --samples $N --needles 2 \
    --estimators "$KEY_ESTS" --out $R 2>&1 | tail -30
# multiquery + hop task shapes.
timeout 14400 python examples/estimator_accuracy.py --ckpt $CK \
    --contexts $CTX --samples $N --needles 2 --task multiquery \
    --estimators "full,lsh_K10L150,block_topk4_flagship,quest_4pct,topk_2pct" \
    --out $R 2>&1 | tail -20
timeout 14400 python examples/estimator_accuracy.py --ckpt $CK \
    --contexts $CTX --samples $N --needles 2 --task hop \
    --estimators "full,lsh_K10L150,block_topk4_flagship,quest_4pct,topk_2pct" \
    --out $R 2>&1 | tail -20
echo "PHASE C DONE ($CTX n=$N)"
