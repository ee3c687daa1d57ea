#!/bin/bash
# Serial hardware measurement sequence for round 2c — run when the axon
# claim is healthy. ONE TPU client at a time (two concurrent clients
# wedged the pool claim server-side on 2026-08-17; never again).
#
# Order: cheap parity verifies first (abort early if Mosaic disagrees),
# then the driver-shaped bench (all modes), then the extra rows
# (prefill, W4, 3B/8B capacity points, lsh B=2).
set -o pipefail
export PYTHONPATH=/root/repo:${PYTHONPATH}
cd /root/repo || exit 1
mkdir -p results/hw_r2c
R=results/hw_r2c

run() {  # run <timeout_s> <logname> <cmd...>
    local t=$1 log=$2; shift 2
    echo "=== $log: $*" | tee -a $R/runbook.log
    timeout "$t" "$@" > "$R/$log.log" 2>&1
    local rc=$?
    tail -4 "$R/$log.log" | tee -a $R/runbook.log
    echo "=== $log rc=$rc" | tee -a $R/runbook.log
    return $rc
}

# 0. Health probe. A wedged pool claim recovers on its own in tens of
#    minutes (observed twice on 2026-08-19), so retry with spacing rather
#    than dying on the first hang.
PROBE_OK=0
for i in 1 2 3 4 5 6 7 8; do
  if run 300 probe python -c "import jax, jax.numpy as jnp; print(jax.devices()); print((jnp.ones((128,128), jnp.bfloat16)@jnp.ones((128,128), jnp.bfloat16)).sum())"; then
    PROBE_OK=1; break
  fi
  echo "=== probe attempt $i failed; sleeping 600s" | tee -a $R/runbook.log
  sleep 600
done
[ "$PROBE_OK" = 1 ] || exit 1

# 1. Mosaic parity for the unmeasured round-2b/2c kernels. A pack4
#    failure invalidates the flagship decode mode -> stop (bench.py's own
#    fallback ladder would still record block_topk/store, but a human
#    should look first). A prefill-kernel failure must NOT block the
#    decode bench (decode modes fill synthetically) — just skip its row.
run 1800 verify_pack4 python scratch/verify_pack4_tpu.py || exit 1
PREFILL_OK=1
run 1800 verify_prefill python scratch/verify_prefill_tpu.py || PREFILL_OK=0

# 2. The driver-shaped bench: all modes, int8 weights (defaults).
run 14400 bench_default python bench.py

# 3. Prefill throughput row (Pallas prefill kernel, flagship state build).
if [ "$PREFILL_OK" = 1 ]; then
  run 3600 bench_prefill python bench.py --modes prefill --mode prefill --baseline-tps 156.1
fi

# 4. W4 weights: flagship + dense baseline at 96K (equal-format W4).
run 7200 bench_w4 python bench.py --weight-quant int4 --modes full,block_topk4

# 5. Model-size rows: 3B @ 96K (W4 B=2), 8B @ 96K (W4 B=1 — the
#    reference's canonical model+context on one chip).
run 10800 bench_3b python bench.py --model llama-3.2-3b --weight-quant int4 --modes block_topk4 --baseline-tps 1
run 14400 bench_8b python bench.py --model llama-3.1-8b --weight-quant int4 --modes block_topk4 --baseline-tps 1

# 6. lsh at its re-opened analytic batch (B=2), W8 like every other mode
#    (unified weight format; the driver falls back to bf16 only if W8
#    fails at every batch — the row self-describes via weight_quant).
#    Longer attempt timeout: the B=2 fused-lsh graph compiles >1000 s even
#    with a warm cache (measured on the 16K quick bench, 2026-08-19).
run 10800 bench_lsh_b2 python bench.py --modes lsh --mode lsh --B 2 --baseline-tps 156.1 --attempt-timeout 2800

echo "RUNBOOK DONE" | tee -a $R/runbook.log
