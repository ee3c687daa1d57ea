"""Synthetic state construction for benchmarking.

Builds a post-prefill `DecodeState` at a given context length from random
K/V — going through the REAL fill functions (centering, norms, SimHash
planes, quantization), so decode-time behavior is identical to a real
prefill. Decode cost does not depend on cache values, so this yields honest
decode benchmarks without paying a full-context prefill (the reference's
bench prefills real text first, `examples/bench.py:43-44`; real prefill
has its own bench row — `bench.py --modes prefill` — the decode loop is
this metric either way).

Each (layer, request) fill is its own donated jit call so peak HBM stays at
state + one layer's temporaries — one fused fill graph OOMs at 96K x B>2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from magicpig_tpu.runtime.server import fill_dense_layer, fill_sparse_layer


def synthetic_prefill(llm, seq_len: int, seed: int = 0):
    """Fill every layer of `llm.state` with random K/V at `seq_len` tokens."""
    cfg, lsh = llm.config, llm.lsh
    hkv, d = cfg.num_key_value_heads, cfg.head_dim

    @functools.partial(jax.jit, donate_argnums=(0,),
                       static_argnames=("kind", "gi"))
    def fill_one(state, key, r, *, kind, gi):
        k1, k2 = jax.random.split(key)
        kf = jax.random.normal(k1, (seq_len, hkv, d), cfg.dtype)
        vf = jax.random.normal(k2, (seq_len, hkv, d), cfg.dtype)
        if kind == "dense":
            return fill_dense_layer(state, gi, r, kf, vf, jnp.int32(seq_len))
        return fill_sparse_layer(state, gi, r, kf, vf, jnp.int32(seq_len),
                                 llm.projections, lsh)

    key = jax.random.key(seed)
    state = llm.state
    for i, (kind, gi) in enumerate(llm.groups):
        for r in range(llm.batch_size):
            key, sub = jax.random.split(key)
            state = fill_one(state, sub, jnp.int32(r), kind=kind, gi=gi)
    llm.state = state.replace(pos=jnp.full_like(state.pos, seq_len))
    for r in range(llm.batch_size):   # register the generation-buffer guard
        llm._hot_used[r] = lsh.num_sink_tokens + lsh.num_local_tokens
        llm._pos_used[r] = seq_len
    return llm
