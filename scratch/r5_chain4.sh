#!/bin/bash
# Round-5 chain4: remaining RULER configs in one claim -> benches -> 32K.
set -o pipefail
cd /root/repo || exit 1
M=results/r5_chain4.log
echo "=== chain4 start $(date +%H:%M:%S)" | tee -a $M
python scratch/watchdog.py --stall 480 --retries 6 --timeout 7200 \
    --log results/ruler_r5/multi.log \
    --watch 'results/ruler_r5/**/*.jsonl' -- \
    python scratch/r5_ruler_multi.py
echo "=== multi rc=$? $(date +%H:%M:%S)" | tee -a $M
tail -4 results/ruler_r5/multi.log | tee -a $M
bash scratch/r5_phaseF_bench.sh 2>&1 | tee -a $M
echo "=== phase F done $(date +%H:%M:%S)" | tee -a $M
bash scratch/r5_phaseD_32k.sh 2>&1 | tail -20 | tee -a $M
echo "=== phase D done $(date +%H:%M:%S)" | tee -a $M
echo "=== CHAIN4 DONE $(date +%H:%M:%S)" | tee -a $M
