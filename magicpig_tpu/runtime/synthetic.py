"""Synthetic state construction for benchmarking.

Builds a post-prefill `DecodeState` at a given context length from random
K/V — going through the REAL fill functions (centering, norms, SimHash
planes, quantization), so decode-time behavior is identical to a real
prefill. Decode cost does not depend on cache values, so this yields honest
decode benchmarks without paying a full-context prefill (the reference's
bench prefills real text first, `examples/bench.py:43-44`; real prefill
has its own bench row — `bench.py --modes prefill` — the decode loop is
this metric either way).

Compile-cost design: each fill call operates on a ONE-LAYER VIEW of the
state (the target layer's leaves swapped into length-1 tuples), so a
single jitted executable serves every layer of its kind — 2 compiles per
(mode, batch) instead of num_layers. The per-(layer, request) call
granularity also keeps peak HBM at state + one layer's temporaries — one
fused fill graph OOMs at 96K x B>2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from magicpig_tpu.runtime.server import fill_dense_layer, fill_sparse_layer
from magicpig_tpu.runtime.state import tuple_set

# Per-layer tuple fields touched by each fill kind; everything else in the
# state rides through the view untouched.
_DENSE_FIELDS = ("dense_k", "dense_v", "dense_k_scale", "dense_v_scale")
_SPARSE_FIELDS = ("hot_k", "hot_v", "off_k", "off_v", "off_k_scale",
                  "off_v_scale", "k_norm", "avg_k", "planes",
                  "quest_min", "quest_max")
_ALL_FIELDS = _DENSE_FIELDS + _SPARSE_FIELDS


def _layer_view(state, idx: int, kind: str):
    """State with the kind's per-layer tuples narrowed to (leaf[idx],) and
    the other kind's per-layer tuples emptied (the fill never touches them;
    their group indexing differs). Shapes are identical for every layer of
    a kind, so jit traces the fill ONCE per kind."""
    mine = _DENSE_FIELDS if kind == "dense" else _SPARSE_FIELDS
    repl = {f: () for f in _ALL_FIELDS}
    for f in mine:
        if getattr(state, f):
            repl[f] = (getattr(state, f)[idx],)
    return state.replace(**repl)


def _unview(state, view, idx: int, kind: str):
    """Scatter the view's layer-0 leaves back into the full state at idx and
    take the view's scalar fields (lens/pos/step)."""
    mine = _DENSE_FIELDS if kind == "dense" else _SPARSE_FIELDS
    repl = {f: tuple_set(getattr(state, f), idx, getattr(view, f)[0])
            for f in mine if getattr(state, f)}
    for f in ("dense_len", "hot_len", "off_len", "pos", "step"):
        repl[f] = getattr(view, f)
    return state.replace(**repl)


def synthetic_prefill(llm, seq_len: int, seed: int = 0):
    """Fill every layer of `llm.state` with random K/V at `seq_len` tokens."""
    cfg, lsh = llm.config, llm.lsh
    hkv, d = cfg.num_key_value_heads, cfg.head_dim

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("kind",))
    def fill_one(view, key, r, *, kind):
        k1, k2 = jax.random.split(key)
        kf = jax.random.normal(k1, (seq_len, hkv, d), cfg.dtype)
        vf = jax.random.normal(k2, (seq_len, hkv, d), cfg.dtype)
        if kind == "dense":
            return fill_dense_layer(view, 0, r, kf, vf, jnp.int32(seq_len))
        return fill_sparse_layer(view, 0, r, kf, vf, jnp.int32(seq_len),
                                 llm.projections, lsh)

    key = jax.random.key(seed)
    state = llm.state
    for i, (kind, gi) in enumerate(llm.groups):
        for r in range(llm.batch_size):
            key, sub = jax.random.split(key)
            view = fill_one(_layer_view(state, gi, kind), sub, jnp.int32(r),
                            kind=kind)
            state = _unview(state, view, gi, kind)
    llm.state = state.replace(pos=jnp.full_like(state.pos, seq_len))
    for r in range(llm.batch_size):   # register the generation-buffer guard
        llm._hot_used[r] = lsh.num_sink_tokens + lsh.num_local_tokens
        llm._pos_used[r] = seq_len
    return llm
