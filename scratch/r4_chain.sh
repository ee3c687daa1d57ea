#!/bin/bash
# Round-4 final chip chain: RULER discriminating run -> hardware benches
# -> accuracy sweeps (existing ckpt) with whatever time remains.
set -o pipefail
export PYTHONPATH=/root/repo:${PYTHONPATH}
cd /root/repo || exit 1
mkdir -p results/ruler_r4 results/accuracy_r4 results/hw_r4
LOG=results/hw_r4/chain.log

note() { echo "=== $(date +%H:%M:%S) $*" | tee -a $LOG; }

# Wait for the byte-LM training.
for i in $(seq 1 160); do
    [ -f data/ruler_lm.npz ] && break
    pgrep -f train_ruler_lm.py > /dev/null || break
    sleep 30
done

CKPT=data/ruler_lm.npz
[ -f $CKPT ] || CKPT=data/ruler_lm.npz.partial
if [ -f $CKPT ]; then
  for cfg in "ruler_full --K 0 --L 150" \
             "ruler_bt --estimator block_topk --K 10 --L 150" \
             "ruler_lsh --estimator lsh --K 10 --L 150"; do
    set -- $cfg; name=$1; shift
    note "RULER $name"
    timeout 3000 python examples/ruler_eval.py --npz $CKPT --seq 512 \
        --samples 15 --max-length 4608 --out results/ruler_r4 --seed 42 \
        "$@" > results/ruler_r4/$name.log 2>&1
    note "RULER $name rc=$? $(tail -2 results/ruler_r4/$name.log | head -1)"
  done
else
  note "no ruler checkpoint; skipping RULER"
fi

note "BENCHES"
bash scratch/r4_bench_final.sh 2>&1 | tee -a $LOG

note "ACCURACY (existing <=8K ckpt)"
KEY_ESTS="full,lsh_K10L150,quest_4pct,block_topk4_flagship,topk_2pct"
timeout 4500 python examples/estimator_accuracy.py --ckpt data/needle_ckpt.npz \
    --contexts 8192 --samples 500 --needles 2 \
    --estimators "$KEY_ESTS" --out results/accuracy_r4 \
    > results/accuracy_r4/std_8k_n500.log 2>&1
note "std_8k_n500 rc=$?"
timeout 3600 python examples/estimator_accuracy.py --ckpt data/needle_ckpt.npz \
    --contexts 8192 --samples 300 --needles 2 --task multiquery \
    --estimators "$KEY_ESTS" --out results/accuracy_r4 \
    > results/accuracy_r4/mq_8k_n300.log 2>&1
note "mq_8k_n300 rc=$?"
timeout 3600 python examples/estimator_accuracy.py --ckpt data/needle_ckpt.npz \
    --contexts 8192 --samples 300 --needles 1 \
    --estimators "$KEY_ESTS" --out results/accuracy_r4 \
    > results/accuracy_r4/n1_8k_n300.log 2>&1
note "n1_8k_n300 rc=$?"
note "CHAIN DONE"
