#!/bin/bash
# Round-5 phase B: byte-LM vt stage (vt scored 0 even for full attention
# in round 4 — VERDICT item 4 asks for a discriminating vt).
# Oversamples vt 3x against the niah families, continuing from the
# committed checkpoint so niah skill is retained.
set -o pipefail
export PYTHONPATH=/root/repo:${PYTHONPATH}
cd /root/repo || exit 1
mkdir -p results/ruler_r5
if [ ! -f data/ruler_lm_v2.npz ]; then
  timeout 9000 python examples/train_ruler_lm.py --init data/ruler_lm.npz \
      --steps 2200 --lr 1.2e-4 --seq 8192 --pool 4096 \
      --target-lo 256 --target-hi 1280 \
      --train-tasks vt,vt,vt,niah_single_1,niah_single_2,niah_single_3,niah_multikey_1,niah_multiquery,niah_multivalue \
      --out data/ruler_lm_v2.npz > results/ruler_r5/train_vt.log 2>&1
  rc=$?
  tail -5 results/ruler_r5/train_vt.log
  echo "train_vt rc=$rc"
fi
echo "PHASE B DONE"
