#!/bin/bash
# Round-5 phase D: 32K needle curriculum stage + the 32K accuracy row.
set -o pipefail
export PYTHONPATH=/root/repo:${PYTHONPATH}
cd /root/repo || exit 1
mkdir -p results/accuracy_r5
R=results/accuracy_r5
if [ ! -f data/needle_ckpt_32k.npz ]; then
  timeout 10800 python examples/train_needle.py --init data/needle_ckpt_16k.npz \
      --seq 32768 --min-seq 8192 --batch 4 --steps 400 --needles 2 \
      --hop-frac 0.3 --lr 5e-5 --out data/needle_ckpt_32k.npz \
      > $R/train_32k.log 2>&1
  rc=$?; tail -4 $R/train_32k.log; echo "train_32k rc=$rc"
fi
[ -f data/needle_ckpt_32k.npz ] || exit 1
timeout 21600 python examples/estimator_accuracy.py \
    --ckpt data/needle_ckpt_32k.npz --contexts 32768 --samples 500 \
    --needles 2 \
    --estimators "full,lsh_K10L150,quest_4pct,block_topk4_flagship,topk_2pct" \
    --out $R 2>&1 | tail -15
echo "PHASE D DONE"
