#!/usr/bin/env python
"""Train a byte-level LM from scratch on the RULER niah/vt task formats.

Why: the reference's RULER scores come from pretrained checkpoints
(`/root/reference/evaluations/RULER/config_models.sh`); this image ships
none and has no egress, so a DISCRIMINATING harness run (full attention
> 0 with sparse deltas beside it — round-3 verdict item 5) needs a model
trained here that can actually do the tasks. This trains a compact
Llama-family byte-level model on the EXACT text formats the eval
generates (`magicpig_tpu/evals/ruler/tasks.py`, training seeds disjoint
from the eval's seed=42) until it learns the retrieval/copy circuit,
then `examples/ruler_eval.py --npz <ckpt>` runs the real 13-task
pipeline against it with any estimator.

The model reads bytes (`utils/tokenizer.ByteTokenizer`: id = byte + 3),
so "target_tokens" in the task generator (a word-count proxy) maps to
~6x as many byte tokens; --target-tokens 256..1024 spans ~1.5-7 KB of
byte context. The needle is spliced at a uniform position, so retrieval
at eval time must cross the sparse offload path (sink/local windows
cover only the tail).

Run: python examples/train_ruler_lm.py --steps 3000 \
         --out data/ruler_lm.npz
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".cache",
                               "jax"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from magicpig_tpu.config import ModelConfig
from magicpig_tpu.utils.tokenizer import ByteTokenizer

from train_needle import forward_all, load_params, save_params  # noqa: E402

TRAIN_TASKS = ("niah_single_1", "niah_single_2", "niah_single_3",
               "niah_multikey_1", "niah_multivalue", "niah_multiquery",
               "vt")


def model_config(dtype=jnp.float32) -> ModelConfig:
    """Byte-vocab model in the flagship kernel regime (d=64, GQA)."""
    return ModelConfig(
        name="ruler-byte-lm",
        vocab_size=320,            # 259 used (bytes + pad/bos/eos), padded
        hidden_size=256,
        intermediate_size=1024,
        num_hidden_layers=6,
        num_attention_heads=8,
        num_key_value_heads=4,
        head_dim=64,
        rope_theta=100000.0,
        rope_scaling=None,
        max_position_embeddings=65536,
        eos_token_ids=(2,),
        dtype=dtype,
    )


def gen_pool(n: int, seq: int, seed: int, target_lo: int, target_hi: int,
             rng: np.random.Generator, tasks=TRAIN_TASKS):
    """Pre-generate byte-encoded training samples: (tokens [n, seq] i32,
    weights [n, seq] f32). Target = next byte; weights 1.0 on the answer
    region, `--lm-weight` elsewhere (applied in the loss)."""
    from magicpig_tpu.evals.ruler.tasks import generate_task

    tok = ByteTokenizer()
    toks = np.zeros((n, seq), np.int32)
    answer = np.zeros((n, seq), bool)
    valid = np.zeros((n, seq), bool)
    i = 0
    batch_idx = 0
    while i < n:
        task = tasks[batch_idx % len(tasks)]
        tt = int(rng.integers(target_lo, target_hi + 1))
        # seed disjoint from the eval's (42): per-pool-batch seeds >= 10000
        samples = generate_task(task, min(64, n - i), tt,
                                seed=10000 + seed * 131 + batch_idx)
        batch_idx += 1
        for s in samples:
            prompt = s["input"] + s["answer_prefix"]
            full = prompt + " " + ", ".join(s["outputs"]) + "."
            ids = tok.encode(full)
            plen = len(tok.encode(prompt))
            if len(ids) > seq:      # drop over-long draws
                continue
            toks[i, :len(ids)] = ids
            valid[i, :len(ids)] = True
            answer[i, plen - 1:len(ids) - 1] = True   # next-token indices
            i += 1
            if i == n:
                break
    return toks, answer, valid


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=8192,
                    help="byte context (~6x the generator's target_tokens)")
    ap.add_argument("--target-lo", type=int, default=128)
    ap.add_argument("--target-hi", type=int, default=1024)
    ap.add_argument("--pool", type=int, default=4096)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--lm-weight", type=float, default=0.05,
                    help="loss weight on non-answer next-byte prediction")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", type=str, default="data/ruler_lm.npz")
    ap.add_argument("--init", type=str, default=None)
    ap.add_argument("--train-tasks", type=str, default=None,
                    help="comma list with repetition = sampling weight "
                         "(e.g. 'vt,vt,vt,niah_single_1' oversamples vt "
                         "3:1 — the round-5 vt stage: vt scored 0 even "
                         "for full attention after the uniform mix)")
    args = ap.parse_args()
    tasks = (tuple(args.train_tasks.split(","))
             if args.train_tasks else TRAIN_TASKS)

    import optax

    from magicpig_tpu.models.llama import init_params

    cfg = model_config()
    if args.init:
        params = load_params(args.init, cfg, args.seq)
    else:
        params = init_params(cfg, jax.random.key(args.seed), args.seq)
    tx = optax.adamw(optax.cosine_decay_schedule(args.lr, args.steps, 0.1),
                     weight_decay=0.01)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, tokens, wts):
        def loss_fn(p):
            logits = forward_all(p, cfg, tokens)[:, :-1]
            tgt = tokens[:, 1:]
            w = wts[:, :-1]
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, tgt)
            loss = (ce * w).sum() / jnp.maximum(w.sum(), 1)
            ans = (w >= 1.0).astype(jnp.float32)
            acc = ((logits.argmax(-1) == tgt) * ans).sum() / jnp.maximum(
                ans.sum(), 1)
            return loss, acc
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, acc

    rng = np.random.default_rng(args.seed + 1)
    t0 = time.time()
    print("generating sample pool...", flush=True)
    toks, answer, valid = gen_pool(args.pool, args.seq, args.seed,
                                   args.target_lo, args.target_hi, rng,
                                   tasks=tasks)
    # weights: 1.0 at answer-byte predictions, lm-weight on other valid
    # positions (learning to model the haystack is what builds induction).
    wts = np.where(answer, 1.0,
                   np.where(valid, args.lm_weight, 0.0)).astype(np.float32)
    print(f"pool ready ({time.time() - t0:.0f}s); training", flush=True)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    for i in range(args.steps):
        sel = rng.integers(0, args.pool, size=args.batch)
        params, opt_state, loss, acc = step(
            params, opt_state, jnp.asarray(toks[sel]), jnp.asarray(wts[sel]))
        if i % 100 == 0 or i == args.steps - 1:
            print(f"step {i}: loss {float(loss):.4f} answer-acc "
                  f"{float(acc):.3f} ({time.time() - t0:.0f}s)", flush=True)
        if i and i % 500 == 0:
            # Tunnel dispatches can wedge mid-run (round-4: a 15-min hang
            # at step 2000 lost the whole run) — keep a rolling partial.
            save_params(params, args.out + ".partial")
    save_params(params, args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
