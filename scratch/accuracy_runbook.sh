#!/bin/bash
# Round-3 accuracy evidence (VERDICT round-2 item 2): statistical power,
# longer contexts, more task shapes. ONE TPU client at a time — run only
# after scratch/hw_runbook.sh finishes.
#
# Stages:
#   1. Fine-tune the needle checkpoint to 16K (variable 2K..16K content,
#      30% 2-hop vt-analogue samples so QUERY2 is learned) — the committed
#      ckpt saw <= 8K and RoPE distances beyond that are untrained.
#   2. 32K stage on top (variable 8K..32K).
#   3. Sweeps at n=500 (binomial noise +-0.022):
#      a. 1-needle probe (high-ceiling, the sensitive test) 2048..16384
#      b. 2-needle standard rows at 8192/16384 (extends the committed
#         2048/4096/8192 rows) + 32768 on the 32K ckpt
#      c. multiquery task (niah_multiquery analogue)
#      d. hop task (vt analogue)
#   Estimator subset for the long contexts: the headline systems
#   (full, lsh, lsh-int8, quest, flagship block_topk4, topk oracle).
set -o pipefail
export PYTHONPATH=/root/repo:${PYTHONPATH}
cd /root/repo || exit 1
mkdir -p results/accuracy_r3
R=results/accuracy_r3

run() {  # run <timeout_s> <logname> <cmd...>
    local t=$1 log=$2; shift 2
    echo "=== $log: $*" | tee -a $R/runbook.log
    timeout "$t" "$@" > "$R/$log.log" 2>&1
    local rc=$?
    tail -4 "$R/$log.log" | tee -a $R/runbook.log
    echo "=== $log rc=$rc" | tee -a $R/runbook.log
    return $rc
}

# Retry the probe: a wedged pool claim recovers in tens of minutes.
PROBE_OK=0
for i in 1 2 3 4 5 6 7 8; do
  if run 300 probe python -c "import jax, jax.numpy as jnp; print(jax.devices()); print((jnp.ones((128,128), jnp.bfloat16)@jnp.ones((128,128), jnp.bfloat16)).sum())"; then
    PROBE_OK=1; break
  fi
  echo "=== probe attempt $i failed; sleeping 600s" | tee -a $R/runbook.log
  sleep 600
done
[ "$PROBE_OK" = 1 ] || exit 1

KEY_ESTS="full,lsh_K10L150,lsh_K10L150_int8,quest_4pct,block_topk4_flagship,topk_2pct"

# 1-2. curriculum stages (skip if the artifact already exists — resumable).
if [ ! -f data/needle_ckpt_16k.npz ]; then
  run 7200 train_16k python examples/train_needle.py --init data/needle_ckpt.npz \
      --seq 16384 --min-seq 2048 --batch 8 --steps 1500 --needles 2 \
      --hop-frac 0.3 --lr 1e-4 --out data/needle_ckpt_16k.npz || exit 1
fi
if [ ! -f data/needle_ckpt_32k.npz ]; then
  run 7200 train_32k python examples/train_needle.py --init data/needle_ckpt_16k.npz \
      --seq 32768 --min-seq 8192 --batch 4 --steps 800 --needles 2 \
      --hop-frac 0.3 --lr 5e-5 --out data/needle_ckpt_32k.npz
fi

CK16=data/needle_ckpt_16k.npz
CK32=data/needle_ckpt_32k.npz
[ -f $CK32 ] || CK32=$CK16

# 3a. 1-needle high-ceiling probe, n=500, full context ladder.
run 14400 probe_n1 python examples/estimator_accuracy.py --ckpt $CK16 \
    --contexts 2048,4096,8192,16384 --samples 500 --needles 1 \
    --estimators "$KEY_ESTS" --out results/accuracy_r3

# 3b. 2-needle standard rows at the new contexts, n=500.
run 14400 std_long python examples/estimator_accuracy.py --ckpt $CK16 \
    --contexts 8192,16384 --samples 500 --needles 2 \
    --estimators "$KEY_ESTS" --out results/accuracy_r3
if [ -f data/needle_ckpt_32k.npz ]; then
  run 14400 std_32k python examples/estimator_accuracy.py --ckpt $CK32 \
      --contexts 32768 --samples 300 --needles 2 \
      --estimators "$KEY_ESTS" --out results/accuracy_r3
fi

# 3c/3d. multiquery + hop task shapes, n=500 at 8K/16K.
run 14400 mq python examples/estimator_accuracy.py --ckpt $CK16 \
    --contexts 8192,16384 --samples 500 --needles 2 --task multiquery \
    --estimators "$KEY_ESTS" --out results/accuracy_r3
run 14400 hop python examples/estimator_accuracy.py --ckpt $CK16 \
    --contexts 8192,16384 --samples 500 --needles 2 --task hop \
    --estimators "$KEY_ESTS" --out results/accuracy_r3

echo "ACCURACY RUNBOOK DONE" | tee -a $R/runbook.log
