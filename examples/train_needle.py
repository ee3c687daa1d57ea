#!/usr/bin/env python
"""Train a small retrieval (needle-in-haystack) model from scratch on TPU.

Why this exists: the reference's accuracy claims are made with pretrained
checkpoints (`/root/reference/README.md:37-45`); this image ships no
checkpoint and has no network egress, so estimator-quality evidence must
come from weights trained here. This script trains a compact Llama-family
model (same `magicpig_tpu.models.llama` functions the engine serves) on a
RULER-niah-shaped task — haystack of filler tokens, needle "key value"
pairs, final query asking for one key's value — until retrieval accuracy
saturates. `examples/estimator_accuracy.py` then scores full vs lsh vs
quest vs block_topk vs topk on held-out samples with these REAL trained
weights (real induction-head attention distributions, not synthetic
planted scores).

Token layout (single-token keys/values, disjoint vocab ranges):
  [BOS] filler... [MARK] k v filler... [Q] k_q -> answer v_q
Multiple needles per sample (the queried one plus distractors) make the
task a niah_multikey analogue — estimator precision matters, not just
recall of one hot token.

Run: python examples/train_needle.py --steps 3000 --out data/needle_ckpt.npz
"""

from __future__ import annotations

import argparse
import functools
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
from magicpig_tpu.models.llama import (
    LlamaParams,
    init_params,
    post_attention,
    qkv_proj,
    unembed,
)
from magicpig_tpu.ops.attention import flash_prefill

# -- vocabulary ---------------------------------------------------------------
PAD, BOS, MARK, QUERY = 0, 1, 2, 3
QUERY2 = 4                         # 2-hop (variable-tracking) query marker
FILLER_LO, FILLER_HI = 8, 448      # haystack noise tokens
KEY_LO, KEY_HI = 448, 704          # needle keys
VAL_LO, VAL_HI = 704, 960          # needle values
VOCAB = 1024


def model_config(dtype=jnp.float32) -> ModelConfig:
    """d=64 / GQA — the flagship kernel regime, sized to train in minutes."""
    return ModelConfig(
        name="needle-12m",
        vocab_size=VOCAB,
        hidden_size=256,
        intermediate_size=768,
        num_hidden_layers=4,
        num_attention_heads=8,
        num_key_value_heads=4,
        head_dim=64,
        rope_theta=10000.0,
        rope_scaling=None,
        max_position_embeddings=32768,
        eos_token_ids=(PAD,),
        dtype=dtype,
    )


def make_batch(rng: np.random.Generator, batch: int, seq: int,
               n_needles: int = 4, min_seq: int | None = None,
               hop_frac: float = 0.0):
    """Returns (tokens [B, seq] i32, target [B, seq] i32, mask [B, seq]
    bool). Every needle is queried in a tail block "[Q] k v [Q] k v ...";
    the loss applies at each value position (predict v from ... [Q] k) —
    one signal per needle per sequence, which is what makes the retrieval
    circuit actually trainable (a single last-token signal was too sparse
    to bootstrap).

    min_seq: when set, each sequence's CONTENT length R is drawn uniformly
    from [min_seq, seq] and the query block sits at R (tokens beyond R are
    causal-dead filler): one compiled graph trains every context length, so
    the long-context stage cannot erode short-context skill.

    hop_frac: fraction of samples drawn as the 2-HOP variable-tracking
    analogue (RULER vt, `/root/reference/evaluations/RULER/data/synthetic/
    variable_tracking.py`): each base needle (MARK k v) gets a chain link
    (MARK c k) whose value is the base KEY, and the query "[QUERY2] c"
    expects the base needle's VALUE — resolving it needs two retrieval
    hops through the sparse path in one forward. Chain keys are drawn from
    the same key range, disjoint from the base keys of that sample."""
    qlen = 3 * n_needles
    toks = rng.integers(FILLER_LO, FILLER_HI, size=(batch, seq))
    keys = np.stack([rng.choice(np.arange(KEY_LO, KEY_HI),
                                size=2 * n_needles,
                                replace=False) for _ in range(batch)])
    chain = keys[:, n_needles:]
    keys = keys[:, :n_needles]
    vals = rng.integers(VAL_LO, VAL_HI, size=(batch, n_needles))
    target = np.zeros((batch, seq), np.int64)
    mask = np.zeros((batch, seq), bool)
    for b in range(batch):
        hop = rng.random() < hop_frac
        r = seq if min_seq is None else int(rng.integers(min_seq, seq + 1))
        # Needles go in the FAR region (>= ~256 tokens before the query),
        # matching the eval protocol: retrieval from inside the local
        # attention window is trivially easy and dilutes the training
        # signal for the hard long-range case.
        far = min(256, (r - qlen) // 2)
        hi = r - qlen - 3 * n_needles - far
        n_marks = 2 * n_needles if hop else n_needles
        pos = np.sort(rng.choice(np.arange(1, max(hi, 2)),
                                 size=n_marks, replace=False))
        for i in range(n_needles):
            toks[b, pos[i]:pos[i] + 3] = (MARK, keys[b, i], vals[b, i])
        if hop:
            for i in range(n_needles):
                p = pos[n_needles + i]
                toks[b, p:p + 3] = (MARK, chain[b, i], keys[b, i])
        order = rng.permutation(n_needles)
        base = r - qlen
        for j, qi in enumerate(order):
            qk = chain[b, qi] if hop else keys[b, qi]
            toks[b, base + 3 * j:base + 3 * j + 3] = (
                QUERY2 if hop else QUERY, qk, vals[b, qi])
            # position of k predicts v (next-token loss at index of k).
            target[b, base + 3 * j + 1] = vals[b, qi]
            mask[b, base + 3 * j + 1] = True
    toks[:, 0] = BOS
    return (toks.astype(np.int32), target.astype(np.int32), mask)


def forward_all(params: LlamaParams, cfg: ModelConfig, tokens: jnp.ndarray):
    """Full-sequence causal forward; returns logits at EVERY position
    [B, S, V]. Each layer is rematerialized (jax.checkpoint): the
    flash-attention backward otherwise stacks per-KV-block softmax
    residuals across the scan and OOMs at batch x 2048 on one chip."""
    b, s = tokens.shape
    hidden = params.embed[tokens]
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))

    @jax.checkpoint
    def layer_fwd(lp, hidden):
        q, k, v = qkv_proj(lp, cfg, hidden, positions, params.cos, params.sin)
        o = flash_prefill(q, k, v, jnp.int32(0), jnp.int32(s),
                          block_k=min(512, s), differentiable=True)
        attn = o.reshape(b, s, -1)
        return post_attention(lp, cfg, attn, hidden)

    for i in range(cfg.num_hidden_layers):
        hidden = layer_fwd(params.layers.layer(i), hidden)
    return unembed(params, cfg, hidden)


def save_params(params: LlamaParams, path: str):
    leaves, treedef = jax.tree.flatten(params)
    np.savez(path, n=len(leaves), treedef=str(treedef),
             **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})


def load_params(path: str, cfg: ModelConfig, max_len: int) -> LlamaParams:
    """Rebuild the pytree using a template from init_params (structure is
    config-determined; saved leaves must match shapes except the RoPE
    caches, which are regenerated for max_len)."""
    data = np.load(path, allow_pickle=False)
    template = init_params(cfg, jax.random.key(0), max_len)
    leaves, treedef = jax.tree.flatten(template)
    saved = [data[f"leaf_{i}"] for i in range(int(data["n"]))]
    out = []
    for t, s in zip(leaves, saved):
        if t.shape == s.shape:
            out.append(jnp.asarray(s, t.dtype))
        else:   # cos/sin caches sized for a different max_len
            out.append(t)
    return jax.tree.unflatten(treedef, out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--needles", type=int, default=4)
    ap.add_argument("--min-seq", type=int, default=None,
                    help="variable content length: uniform in [min_seq, seq]")
    ap.add_argument("--hop-frac", type=float, default=0.0,
                    help="fraction of samples as the 2-hop vt analogue")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", type=str, default="data/needle_ckpt.npz")
    ap.add_argument("--init", type=str, default=None,
                    help="checkpoint to continue from (curriculum stages: "
                         "train short first, then longer contexts so RoPE "
                         "sees every needle->query distance the eval uses)")
    args = ap.parse_args()

    import optax

    cfg = model_config()
    if args.init:
        params = load_params(args.init, cfg, args.seq)
    else:
        params = init_params(cfg, jax.random.key(args.seed), args.seq)
    tx = optax.adamw(optax.cosine_decay_schedule(args.lr, args.steps, 0.1),
                     weight_decay=0.01)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, tokens, target, mask):
        def loss_fn(p):
            logits = forward_all(p, cfg, tokens)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, target)
            m = mask.astype(jnp.float32)
            loss = (ce * m).sum() / jnp.maximum(m.sum(), 1)
            acc = ((logits.argmax(-1) == target) * m).sum() / jnp.maximum(
                m.sum(), 1)
            return loss, acc
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, acc

    # Wedge-recovery rolling save: the axon dispatch can hang a process
    # forever mid-run; a watchdog kills and relaunches, and this resume
    # path skips completed steps (params from the partial; fresh opt
    # state — acceptable for a fine-tune stage). Batches are drawn from
    # the SAME seeded rng stream, with pre-resume draws burned so the
    # data order is unchanged.
    partial = args.out + ".partial.npz"
    start = 0
    if args.init and os.path.exists(partial):
        pdata = np.load(partial, allow_pickle=False)
        if "step" in pdata:
            start = int(pdata["step"]) + 1
            leaves, treedef = jax.tree.flatten(params)
            saved = [pdata[f"leaf_{i}"] for i in range(int(pdata["n"]))]
            params = jax.tree.unflatten(treedef, [
                jnp.asarray(s, t.dtype) if t.shape == s.shape else t
                for t, s in zip(leaves, saved)])
            print(f"resumed from {partial} at step {start}", flush=True)

    rng = np.random.default_rng(args.seed + 1)
    t0 = time.time()
    for i in range(args.steps):
        toks, tgt, msk = make_batch(rng, args.batch, args.seq, args.needles,
                                    min_seq=args.min_seq,
                                    hop_frac=args.hop_frac)
        if i < start:
            continue
        params, opt_state, loss, acc = step(params, opt_state,
                                            jnp.asarray(toks),
                                            jnp.asarray(tgt),
                                            jnp.asarray(msk))
        if i % 20 == 0 or i == args.steps - 1:
            print(f"step {i}: loss {float(loss):.4f} acc {float(acc):.3f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
        if (i % 100 == 0 or i == args.steps - 1):
            if i > start:
                leaves, _ = jax.tree.flatten(params)
                np.savez(partial, n=len(leaves), step=i,
                         **{f"leaf_{j}": np.asarray(l)
                            for j, l in enumerate(leaves)})
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_params(params, args.out)
    if os.path.exists(partial):
        os.remove(partial)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
