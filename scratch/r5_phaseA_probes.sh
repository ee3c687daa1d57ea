#!/bin/bash
# Round-5 phase A: hardware probes after the 16K trainer frees the chip.
#   1. lsh_r5_probe — fused2 parity + timing + collide.py record rows
#   2. profile_8b_w4 — measured per-stage 8B W4 profile + fused-shape rows
set -o pipefail
export PYTHONPATH=/root/repo:${PYTHONPATH}
cd /root/repo || exit 1
mkdir -p results/probe_r5
R=results/probe_r5

probe_chip() {
    for i in 1 2 3 4 5 6; do
        if timeout 300 python -c "import jax, jax.numpy as jnp; print(jax.devices()); print((jnp.ones((128,128), jnp.bfloat16)@jnp.ones((128,128), jnp.bfloat16)).sum())" >> $R/runbook.log 2>&1; then
            return 0
        fi
        echo "probe attempt $i failed; sleep 300" | tee -a $R/runbook.log
        sleep 300
    done
    return 1
}

probe_chip || exit 1
timeout 3000 python scratch/lsh_r5_probe.py 96 > $R/lsh_probe.log 2>&1
tail -20 $R/lsh_probe.log
probe_chip || exit 1
timeout 3600 python scratch/profile_8b_w4.py > $R/profile_8b.log 2>&1
tail -30 $R/profile_8b.log
echo "PHASE A DONE"
