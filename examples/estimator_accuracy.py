#!/usr/bin/env python
"""Score every sparse estimator against full attention with TRAINED weights.

Companion to `examples/train_needle.py` (which see, for why this replaces a
pretrained-checkpoint RULER run in this image). Protocol per sample:

  prefill([BOS] haystack-with-needles)      # exact attention, fills caches
  inference([Q])                            # decode step 1 (estimator on)
  inference(k_q) -> argmax == v_q ?         # decode step 2: the RETRIEVAL
                                            # happens under the estimator

The needle lives deep in the offload region (forced > local window from the
end), so the second decode step's attention must recover it through the
sparse path — the same accuracy question RULER's niah tasks pose to the
reference (`/root/reference/evaluations/RULER/`), answered with real
induction-head attention rather than synthetic planted scores.

Run: python examples/estimator_accuracy.py --ckpt data/needle_ckpt.npz \
         --contexts 2048,4096,8192 --samples 200
Writes results/estimator_accuracy/summary.csv and prints a markdown table.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".cache",
                               "jax"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from magicpig_tpu.config import LSHConfig

from train_needle import (  # noqa: E402
    BOS, MARK, QUERY, QUERY2, FILLER_LO, FILLER_HI, KEY_LO, KEY_HI, VAL_LO,
    VAL_HI, load_params, model_config,
)


def estimator_configs(K: int, L: int):
    """Mirrors the reference's evaluated systems (`model_wrappers.py:25-32`):
    full, MagicPIG-LSH, Quest, TopK oracle — plus the TPU-native
    block_topk flagship (bf16 and int8)."""
    base = dict(num_sink_tokens=4, num_local_tokens=64,
                generation_buffer=128)
    return {
        "full": LSHConfig(K=0, L=0, **base),
        f"lsh_K{K}L{L}": LSHConfig(K=K, L=L, decode_mode="masked", **base),
        f"lsh_K{K}L{L}_int8": LSHConfig(K=K, L=L, decode_mode="masked",
                                        offload_quant="int8", **base),
        "quest_4pct": LSHConfig(K=1, L=0, estimator="quest",
                                quest_page_size=16, quest_budget_frac=0.04,
                                dense_layers=(0,), **base),
        "block_topk_8pct": LSHConfig(K=1, L=0, estimator="block_topk",
                                     block_topk_block_size=256,
                                     block_topk_budget_frac=0.08,
                                     offload_quant="int8",
                                     dense_layers=(0,), **base),
        "block_topk_int4": LSHConfig(K=1, L=0, estimator="block_topk",
                                     block_topk_block_size=256,
                                     block_topk_budget_frac=0.08,
                                     offload_quant="int4",
                                     dense_layers=(0,), **base),
        # 512-token ranking blocks trigger the packed-int4 K storage
        # (`config.packed_k4` at d=64) — the production block_topk4 mode.
        "block_topk_int4pk": LSHConfig(K=1, L=0, estimator="block_topk",
                                       block_topk_block_size=512,
                                       block_topk_budget_frac=0.08,
                                       offload_quant="int4",
                                       dense_layers=(0,), **base),
        # Same 512 blocks on int8 (separates block-size from quant effects).
        "block_topk_512_int8": LSHConfig(K=1, L=0, estimator="block_topk",
                                         block_topk_block_size=512,
                                         block_topk_budget_frac=0.08,
                                         offload_quant="int8",
                                         dense_layers=(0,), **base),
        # The bench's block_topk4 flagship config exactly: packed-int4 K
        # + int8 dense-layer KV (`bench.py::make_lsh`).
        "block_topk4_flagship": LSHConfig(K=1, L=0, estimator="block_topk",
                                          block_topk_block_size=512,
                                          block_topk_budget_frac=0.08,
                                          offload_quant="int4",
                                          dense_quant="int8",
                                          dense_layers=(0,), **base),
        f"lsh_K{K}L{L}_int4": LSHConfig(K=K, L=L, decode_mode="masked",
                                        offload_quant="int4", **base),
        "topk_2pct": LSHConfig(K=1, L=0, estimator="topk",
                               topk_budget_frac=0.02, dense_layers=(0,),
                               **base),
    }


def make_eval_sample(rng: np.random.Generator, ctx: int, n_needles: int,
                     task: str = "single"):
    """One haystack with the needles forced deep into the offload region
    (>= 256 tokens from the end, beyond sink+local+buffer). Returns
    (tokens, queries) where queries is a list of (query_marker, query_key,
    expected_value) decode probes:
      * single     — one probe for a random needle (RULER niah_single/
                     multikey depending on n_needles)
      * multiquery — one probe PER needle (RULER niah_multiquery,
                     `/root/reference/evaluations/RULER/.../constants.py`)
      * hop        — 2-hop variable-tracking analogue: each needle has a
                     chain link (MARK c k) in the haystack; the probe
                     "[QUERY2] c" expects the BASE needle's value (RULER
                     vt analogue; see train_needle.make_batch hop_frac)
    """
    toks = rng.integers(FILLER_LO, FILLER_HI, size=ctx)
    toks[0] = BOS
    keys = rng.choice(np.arange(KEY_LO, KEY_HI), size=2 * n_needles,
                      replace=False)
    chain = keys[n_needles:]
    keys = keys[:n_needles]
    vals = rng.integers(VAL_LO, VAL_HI, size=n_needles)
    n_marks = 2 * n_needles if task == "hop" else n_needles
    pos = np.sort(rng.choice(np.arange(8, ctx - 256 - 3 * n_marks),
                             size=n_marks, replace=False))
    for i in range(n_needles):
        toks[pos[i]:pos[i] + 3] = (MARK, keys[i], vals[i])
    if task == "hop":
        for i in range(n_needles):
            p = pos[n_needles + i]
            toks[p:p + 3] = (MARK, chain[i], keys[i])
        queries = [(QUERY2, int(chain[i]), int(vals[i]))
                   for i in range(n_needles)]
        qi = rng.integers(0, n_needles)
        queries = [queries[qi]]
    elif task == "multiquery":
        order = rng.permutation(n_needles)
        queries = [(QUERY, int(keys[i]), int(vals[i])) for i in order]
    else:
        qi = rng.integers(0, n_needles)
        queries = [(QUERY, int(keys[qi]), int(vals[qi]))]
    return toks.astype(np.int32), queries


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", type=str, default="data/needle_ckpt.npz")
    ap.add_argument("--contexts", type=str, default="2048,4096,8192")
    ap.add_argument("--samples", type=int, default=200)
    # Default matches the shipped checkpoint's curriculum (train_needle.py
    # trains 1-needle then 2-needle; data/needle_ckpt.npz never saw 4, and
    # scores ~chance on 4-needle haystacks).
    ap.add_argument("--needles", type=int, default=2)
    ap.add_argument("--task", type=str, default="single",
                    choices=["single", "multiquery", "hop"],
                    help="probe protocol (see make_eval_sample); multiquery "
                         "and hop write summary_<task>.csv")
    ap.add_argument("--K", type=int, default=10)
    ap.add_argument("--L", type=int, default=150)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--out", type=str, default="results/estimator_accuracy")
    ap.add_argument("--estimators", type=str, default="",
                    help="comma-separated subset of estimator names "
                         "(default: all)")
    ap.add_argument("--weight-quant", type=str, default="none",
                    choices=["none", "int8", "int4"],
                    help="int8/int4 = quantize the trained weights before "
                         "scoring (the bench's deployment configs) — names "
                         "in the CSV get a '_w8'/'_w4' suffix")
    args = ap.parse_args()

    import jax

    from magicpig_tpu.runtime.engine import LLM

    contexts = [int(c) for c in args.contexts.split(",")]
    cfg = model_config()
    max_len = max(contexts) + 256
    params = load_params(args.ckpt, cfg, max_len)
    suffix = ""
    if args.weight_quant in ("int8", "int4"):
        # Quantize AFTER loading (the checkpoint stores exact weights);
        # the forward pass dispatches on Quant(4)Weight leaves, so this is
        # exactly the bench's quantized deployment path (`models/llama.py`).
        from magicpig_tpu.models.llama import quantize_params

        bits = 4 if args.weight_quant == "int4" else 8
        params = quantize_params(params, bits=bits)
        suffix = f"_w{bits}"
    if args.needles != 2:
        # The committed summary.csv rows are 2-needle; distinguish probes
        # at other needle counts (the 1-needle high-ceiling probe) by name.
        suffix += f"_n{args.needles}"
    os.makedirs(args.out, exist_ok=True)
    rows = []
    csv_name = ("summary.csv" if args.task == "single"
                else f"summary_{args.task}.csv")
    csv_path = os.path.join(args.out, csv_name)
    # Append-only: partial re-runs (one context, an estimator subset) must
    # not clobber previously committed rows; rows are written incrementally
    # so a crash keeps everything finished so far.
    if not os.path.exists(csv_path):
        with open(csv_path, "w") as f:
            # `n` makes each row carry its own statistical weight (±1.96 *
            # sqrt(acc*(1-acc)/n) binomial CI) — a reviewer must be able to
            # tell an n=150 row from an n=500 row without reading prose.
            f.write("context,estimator,accuracy,avg_sparsity,n\n")
    # Resume: a watchdog relaunch after a dispatch wedge must not redo
    # finished (context, estimator, n) cells.
    done_rows = set()
    with open(csv_path) as f:
        next(f)
        for line in f:
            parts = line.strip().split(",")
            if len(parts) >= 5:
                done_rows.add((parts[0], parts[1], parts[4]))

    for ctx in contexts:
        samples = []
        rng = np.random.default_rng(args.seed + ctx)
        for _ in range(args.samples):
            samples.append(make_eval_sample(rng, ctx, args.needles,
                                            task=args.task))
        configs = estimator_configs(args.K, args.L)
        if args.estimators:
            keep = args.estimators.split(",")
            configs = {n: c for n, c in configs.items() if n in keep}
        for name, lsh in configs.items():
            if any(d[0] == str(ctx) and d[1] == f"{name}{suffix}"
                   for d in done_rows):
                print(f"ctx={ctx} {name}{suffix}: done (resume skip)",
                      flush=True)
                continue
            llm = LLM(cfg, batch_size=1, max_length=ctx + 256,
                      chunk_size=min(2048, ctx), params=params, lsh=lsh,
                      seed=0)
            snap = llm.sparsity_snapshot()
            correct = 0
            total = 0
            t0 = time.time()
            for si, (toks, queries) in enumerate(samples):
                if si and si % 100 == 0:  # watchdog heartbeat
                    print(f"  .. {name} {si}/{len(samples)} "
                          f"({time.time() - t0:.0f}s)", flush=True)
                llm.release_slot(0)
                llm.prefill(toks, request_id=0)
                for j, (marker, kq, vq) in enumerate(queries):
                    llm.inference(np.asarray([marker], np.int32))
                    logits = llm.inference(np.asarray([kq], np.int32))
                    if int(np.asarray(logits)[0].argmax()) == vq:
                        correct += 1
                    total += 1
                    # Teacher-force the TRUE value before the next probe —
                    # the training protocol's "[Q] k v [Q] k v" layout.
                    if j + 1 < len(queries):
                        llm.inference(np.asarray([vq], np.int32))
            acc = correct / total
            spars = llm.avg_sparsity_since(snap)
            rows.append((ctx, name, acc, spars))
            with open(csv_path, "a") as f:
                f.write(f"{ctx},{name}{suffix},{acc:.4f},{spars:.4f},"
                        f"{total}\n")
            print(f"ctx={ctx} {name}{suffix}: acc={acc:.3f} "
                  f"sparsity={spars:.4f} ({time.time() - t0:.0f}s)",
                  flush=True)
            del llm

    names = list(configs)
    print("\n| context | " + " | ".join(names) + " |")
    print("|---" * (len(names) + 1) + "|")
    for ctx in contexts:
        cells = []
        for n in names:
            acc = next((a for c, nm, a, _ in rows if c == ctx and nm == n),
                       None)  # None: resume-skipped; row is in the CSV
            cells.append("-" if acc is None else f"{acc:.3f}")
        print(f"| {ctx} | " + " | ".join(cells) + " |")
    print(f"\nwrote {args.out}/{csv_name}")


if __name__ == "__main__":
    main()
