#!/bin/bash
# Round-5 spare-time extras (run only if the schedule allows, after F):
#   1. 1-needle high-ceiling probe at n=500 (round-3 runbook item 3a —
#      the sensitive test: 2-needle ceilings bind at ~0.52)
#   2. lsh L=300 (reference K11/L300 op point) accuracy rows
set -o pipefail
export PYTHONPATH=/root/repo:${PYTHONPATH}
cd /root/repo || exit 1
R=results/accuracy_r5
timeout 7200 python examples/estimator_accuracy.py --ckpt data/needle_ckpt_16k.npz \
    --contexts 8192,16384 --samples 500 --needles 1 \
    --estimators "full,lsh_K10L150,quest_4pct,block_topk4_flagship,topk_2pct" \
    --out $R 2>&1 | tail -15
timeout 3600 python examples/estimator_accuracy.py --ckpt data/needle_ckpt_16k.npz \
    --contexts 8192 --samples 500 --needles 2 --K 11 --L 300 \
    --estimators "lsh_K11L300" --out $R 2>&1 | tail -8
echo "EXTRA DONE"
