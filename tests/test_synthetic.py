"""synthetic_prefill (benchmark state builder, runtime/synthetic.py).

The one-layer-VIEW fill (a single jitted executable per kind, round-3
compile-cost fix) must produce bit-identical state to the direct
whole-state fill with the same RNG stream — and a decode step must run on
the result (the bench's actual call pattern).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magicpig_tpu.config import LSHConfig, preset
from magicpig_tpu.runtime.engine import LLM
from magicpig_tpu.runtime.server import fill_dense_layer, fill_sparse_layer
from magicpig_tpu.runtime.synthetic import synthetic_prefill

SEQ = 896  # fold-aligned for the tiny preset's head_dim


def _oracle_fill(llm, seq_len, seed):
    """The pre-round-3 formulation: donate the WHOLE state, static gi."""
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
    return state.replace(pos=jnp.full_like(state.pos, seq_len))


@pytest.mark.parametrize("lsh", [
    LSHConfig(K=0, L=0, dense_quant="int8"),
    LSHConfig(K=4, L=8, decode_mode="masked", offload_quant="int8"),
    LSHConfig(K=1, L=0, estimator="block_topk", offload_quant="int8"),
    LSHConfig(K=1, L=0, estimator="quest"),
], ids=["full_int8", "lsh_int8", "block_topk", "quest"])
def test_view_fill_matches_whole_state_fill(lsh):
    cfg = preset("llama-tiny")
    llm = LLM(cfg, batch_size=2, max_length=1024, lsh=lsh, seed=0)
    synthetic_prefill(llm, SEQ, seed=1)
    got = llm.state

    ref_llm = LLM(cfg, batch_size=2, max_length=1024, lsh=lsh, seed=0)
    want = _oracle_fill(ref_llm, SEQ, seed=1)

    for f in got.__dataclass_fields__:
        g, w = getattr(got, f), getattr(want, f)
        for i, (gl, wl) in enumerate(zip(jax.tree.leaves(g),
                                         jax.tree.leaves(w))):
            np.testing.assert_array_equal(np.asarray(gl), np.asarray(wl),
                                          err_msg=f"{f}[{i}]")


def test_synthetic_then_decode():
    cfg = preset("llama-tiny")
    llm = LLM(cfg, batch_size=2, max_length=1024,
              lsh=LSHConfig(K=4, L=8, decode_mode="masked"), seed=0)
    synthetic_prefill(llm, SEQ, seed=2)
    toks = llm.decode_steps(np.zeros((2,), np.int32), 3)
    assert np.asarray(toks).shape == (3, 2)
    assert 0.0 <= llm.avg_sparsity <= 1.0
