#!/usr/bin/env python
"""Headline benchmark: LSH-sampled decode throughput vs full-attention
baseline at long context, on one TPU chip.

Mirrors the reference's canonical config (`examples/bench.sh:1`:
B=1, K=10, L=150, M=98304) scaled to a model+context that fits one chip.
Both engines share weights and the same jitted decode loop; the baseline is
the K=0 (full attention everywhere) configuration of the same engine, i.e.
"full-attention Pallas/XLA" per BASELINE.md. Prints ONE JSON line.
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", type=str, default="llama-3.2-1b",
                   help="model shape preset")
    p.add_argument("--B", type=int, default=1, help="batch size")
    p.add_argument("--P", type=int, default=98000, help="context (prefill) length")
    p.add_argument("--M", type=int, default=98304, help="max length")
    p.add_argument("--G", type=int, default=32, help="timed decode steps")
    p.add_argument("--warmup", type=int, default=4, help="warmup decode steps")
    p.add_argument("--K", type=int, default=10)
    p.add_argument("--L", type=int, default=150)
    p.add_argument("--mode", type=str, default="sampled",
                   choices=["sampled", "masked"])
    p.add_argument("--quick", action="store_true",
                   help="small config for smoke testing")
    args = p.parse_args()
    if args.quick:
        args.P, args.M, args.G = 16000, 16384, 8

    import jax
    from magicpig_tpu.config import LSHConfig, preset
    from magicpig_tpu.runtime.engine import LLM
    from magicpig_tpu.runtime.synthetic import synthetic_prefill

    cfg = preset(args.model)

    def measure(K, L, mode, params=None):
        lsh = LSHConfig(K=K, L=L, decode_mode=mode)
        llm = LLM(cfg, batch_size=args.B, max_length=args.M, lsh=lsh,
                  params=params, seed=0)
        synthetic_prefill(llm, args.P, seed=1)
        tok = np.zeros((args.B,), np.int32)
        # n_steps is a static arg: warm up with the SAME step count so the
        # timed call hits the compile cache.
        t = llm.decode_steps(tok, args.G)                # compile + warmup
        _ = np.asarray(t)                                # sync
        t0 = time.perf_counter()
        t = llm.decode_steps(tok, args.G)
        _ = np.asarray(t)
        dt = time.perf_counter() - t0
        tps = args.B * args.G / dt
        return tps, llm.avg_sparsity, llm.params

    print(f"# bench: {args.model} B={args.B} ctx={args.P} "
          f"K={args.K}/L={args.L} mode={args.mode} on {jax.devices()}",
          file=sys.stderr)
    full_tps, _, params = measure(0, 0, "masked")
    print(f"# full-attention baseline: {full_tps:.3f} tok/s", file=sys.stderr)
    lsh_tps, sparsity, _ = measure(args.K, args.L, args.mode, params)
    print(f"# lsh K={args.K}/L={args.L}: {lsh_tps:.3f} tok/s "
          f"(avg sampled fraction {sparsity:.4f})", file=sys.stderr)

    print(json.dumps({
        "metric": f"decode_throughput_{args.model}_ctx{args.P}_K{args.K}L{args.L}",
        "value": round(lsh_tps, 3),
        "unit": "tokens/s/chip",
        "vs_baseline": round(lsh_tps / full_tps, 3),
    }))


if __name__ == "__main__":
    main()
