#!/bin/bash
# Round-5 master chain (launch AFTER the 16K trainer exits).
# Order: probes -> accuracy sweeps (judge item 1) -> byte-LM vt stage ->
# 32K stage + row -> RULER suite. Benches (phase F) run separately at the
# end so the compile cache is warm for the driver.
set -o pipefail
cd /root/repo || exit 1
M=results/r5_chain.log
echo "=== chain start $(date +%H:%M:%S)" | tee -a $M
bash scratch/r5_phaseA_probes.sh 2>&1 | tee -a $M
echo "=== phase A done $(date +%H:%M:%S)" | tee -a $M
bash scratch/r5_phaseC_accuracy.sh data/needle_ckpt_16k.npz 8192,16384 500 2>&1 | tail -40 | tee -a $M
echo "=== phase C done $(date +%H:%M:%S)" | tee -a $M
bash scratch/r5_phaseB_vt.sh 2>&1 | tee -a $M
echo "=== phase B done $(date +%H:%M:%S)" | tee -a $M
bash scratch/r5_phaseD_32k.sh 2>&1 | tail -20 | tee -a $M
echo "=== phase D done $(date +%H:%M:%S)" | tee -a $M
bash scratch/r5_phaseE_ruler.sh 2>&1 | tail -30 | tee -a $M
echo "=== phase E done $(date +%H:%M:%S)" | tee -a $M
echo "=== CHAIN DONE $(date +%H:%M:%S)" | tee -a $M
