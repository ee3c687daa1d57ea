#!/bin/bash
# Round-5 phase D: 32K needle curriculum stage + the 32K accuracy row.
# Both legs run under the wedge watchdog (the first-leg attempt was lost
# to an axon dispatch wedge): train resumes from <out>.partial.npz, the
# sweep resumes from finished summary.csv rows.
set -o pipefail
export PYTHONPATH=/root/repo:${PYTHONPATH}
cd /root/repo || exit 1
mkdir -p results/accuracy_r5
R=results/accuracy_r5
# Budget-matched quest row first (completes the RULER diagnosis grid;
# ~10 min) — skipped if its summary already exists.
if [ ! -f results/ruler_r5/ruler-byte-lm_seq1152_quest_K10L150_bf025/summary.csv ]; then
  python scratch/watchdog.py --stall 600 --retries 3 --timeout 3600 \
      --log results/ruler_r5/q25.log \
      --watch 'results/ruler_r5/**/*.jsonl' -- \
      python scratch/r5_ruler_q25.py
  echo "q25 rc=$?"
fi
if [ ! -f data/needle_ckpt_32k.npz ]; then
  python scratch/watchdog.py --stall 600 --retries 5 --timeout 9000 \
      --log $R/train_32k.log \
      --watch 'data/needle_ckpt_32k.npz.partial.npz' -- \
      python examples/train_needle.py --init data/needle_ckpt_16k.npz \
      --seq 32768 --min-seq 8192 --batch 4 --steps 400 --needles 2 \
      --hop-frac 0.3 --lr 5e-5 --out data/needle_ckpt_32k.npz
  rc=$?; tail -4 $R/train_32k.log; echo "train_32k rc=$rc"
fi
[ -f data/needle_ckpt_32k.npz ] || exit 1
python scratch/watchdog.py --stall 900 --retries 4 --timeout 14400 \
    --log $R/sweep_32k.log --watch "$R/summary.csv" -- \
    python examples/estimator_accuracy.py \
    --ckpt data/needle_ckpt_32k.npz --contexts 32768 --samples 500 \
    --needles 2 \
    --estimators "full,lsh_K10L150,quest_4pct,block_topk4_flagship,topk_2pct" \
    --out $R
tail -15 $R/sweep_32k.log
echo "PHASE D DONE"
