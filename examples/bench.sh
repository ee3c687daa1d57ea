#!/bin/sh
# Canonical throughput benchmark (reference examples/bench.sh:1 scaled to
# one TPU chip: B=1, K=10, L=150, M=98304, P=98000 on the 1B shape).
cd "$(dirname "$0")/.." && python bench.py --B 1 --K 10 --L 150 \
  --model llama-3.2-1b --M 98304 --P 98000 "$@"
