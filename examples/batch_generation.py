#!/usr/bin/env python
"""Batched generation: B sequential prefills -> batched greedy decode
(reference `examples/batch_generation.py:43-59`)."""

import argparse
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "..")

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", type=str, default="llama-tiny")
    p.add_argument("--B", type=int, default=4, help="batch size")
    p.add_argument("--M", type=int, default=2048, help="max length")
    p.add_argument("--P", type=int, default=1024, help="prefill length")
    p.add_argument("--G", type=int, default=32, help="generation length")
    p.add_argument("--K", type=int, default=10)
    p.add_argument("--L", type=int, default=150)
    p.add_argument("--data", type=str, default=None,
                   help="jsonl file with an 'input' field per line")
    args = p.parse_args()

    from magicpig_tpu.config import LSHConfig
    from magicpig_tpu.runtime.engine import LLM
    from magicpig_tpu.utils.tokenizer import get_tokenizer

    tok = get_tokenizer(None)
    if args.data:
        import json

        prompts = []
        with open(args.data) as f:
            for line in f:
                prompts.append(json.loads(line)["input"])
                if len(prompts) == args.B:
                    break
    else:
        prompts = [f"Request {i}: " + "All work and no play. " * 200
                   for i in range(args.B)]

    llm = LLM(args.model, batch_size=args.B, max_length=args.M,
              lsh=LSHConfig(K=args.K, L=args.L))

    first_logits = []
    for i, text in enumerate(prompts):
        ids = tok.encode(text)[: args.P]
        logits = llm.prefill(ids, request_id=i)
        first_logits.append(np.asarray(logits)[0].argmax())
    print(f"[INFO] prefilled {args.B} requests")

    toks = np.asarray(first_logits, np.int32)
    t0 = time.perf_counter()
    out = np.asarray(llm.decode_steps(toks, args.G))      # [G, B]
    dt = time.perf_counter() - t0
    print(f"[INFO] Decoding Latency {1000 * dt / args.G:.2f} ms/token")
    print(f"[INFO] Decoding Throughput {args.B * args.G / dt:.2f} token/s")
    if llm.lsh.enabled:
        print(f"[INFO] Avg Sparsity {llm.avg_sparsity:.4f}")
    for b in range(args.B):
        print(f"--- request {b}: {tok.decode(out[:, b].tolist())!r}")


if __name__ == "__main__":
    main()
