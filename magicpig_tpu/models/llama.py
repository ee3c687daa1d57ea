"""Functional Llama-family model: parameter pytrees and per-layer compute.

Equivalent of the reference's flat-tensor runtime (`models/llama.py:10-61`,
`LLMLayer.init_parameters`) redone as JAX pytrees with *stacked* per-layer
weights [num_layers, ...] so layer segments can be lax.scan'ed and sharded
with one annotation. Weights are stored transposed for `x @ w` right-multiply
(TPU-friendly: the MXU consumes [*, in] x [in, out]).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from magicpig_tpu.config import ModelConfig
from magicpig_tpu.ops.norms import rms_norm
from magicpig_tpu.ops.rope import apply_rope


@flax.struct.dataclass
class LayerParams:
    """Stacked transformer-layer weights; leading dim = num_layers."""

    wq: jax.Array      # [N, hidden, Hq*d]
    wk: jax.Array      # [N, hidden, Hkv*d]
    wv: jax.Array      # [N, hidden, Hkv*d]
    wo: jax.Array      # [N, Hq*d, hidden]
    w_gate: jax.Array  # [N, hidden, inter]
    w_up: jax.Array    # [N, hidden, inter]
    w_down: jax.Array  # [N, inter, hidden]
    ln_attn: jax.Array  # [N, hidden]
    ln_mlp: jax.Array   # [N, hidden]

    def layer(self, i: int) -> "LayerParams":
        return jax.tree.map(lambda x: x[i], self)


@flax.struct.dataclass
class LlamaParams:
    embed: jax.Array      # [vocab, hidden]
    lm_head: jax.Array    # [hidden, vocab]
    final_ln: jax.Array   # [hidden]
    layers: LayerParams
    cos: jax.Array        # [max_len, head_dim] RoPE cache
    sin: jax.Array


def init_params(config: ModelConfig, key: jax.Array, max_len: int) -> LlamaParams:
    """Random-init parameters (bench/testing path when no checkpoint)."""
    from magicpig_tpu.ops.rope import rope_cos_sin

    n = config.num_hidden_layers
    h = config.hidden_size
    hq = config.num_attention_heads * config.head_dim
    hkv = config.num_key_value_heads * config.head_dim
    inter = config.intermediate_size
    dt = config.dtype

    ks = jax.random.split(key, 10)

    def w(k, shape, fan_in):
        return (jax.random.normal(k, shape, jnp.float32) * (fan_in ** -0.5)).astype(dt)

    layers = LayerParams(
        wq=w(ks[0], (n, h, hq), h),
        wk=w(ks[1], (n, h, hkv), h),
        wv=w(ks[2], (n, h, hkv), h),
        wo=w(ks[3], (n, hq, h), hq),
        w_gate=w(ks[4], (n, h, inter), h),
        w_up=w(ks[5], (n, h, inter), h),
        w_down=w(ks[6], (n, inter, h), inter),
        ln_attn=jnp.ones((n, h), dt),
        ln_mlp=jnp.ones((n, h), dt),
    )
    embed = w(ks[7], (config.vocab_size, h), h)
    cos, sin = rope_cos_sin(config, max_len)
    return LlamaParams(
        embed=embed,
        lm_head=(embed.T if config.tie_word_embeddings
                 else w(ks[8], (h, config.vocab_size), h)),
        final_ln=jnp.ones((h,), dt),
        layers=layers,
        cos=cos,
        sin=sin,
    )


def qkv_proj(lp: LayerParams, config: ModelConfig, hidden: jax.Array,
             positions: jax.Array, cos: jax.Array, sin: jax.Array):
    """RMSNorm + QKV projection + RoPE for one layer.

    hidden: [B, S, h]; positions: [B, S].
    Returns q [B, S, Hq, d], k [B, S, Hkv, d], v [B, S, Hkv, d].
    (reference `pre_attention_compute` + rotary, `models/llama.py:138-206`)
    """
    b, s, h = hidden.shape
    d = config.head_dim
    x = rms_norm(hidden, lp.ln_attn, config.rms_norm_eps)
    q = (x @ lp.wq).reshape(b, s, config.num_attention_heads, d)
    k = (x @ lp.wk).reshape(b, s, config.num_key_value_heads, d)
    v = (x @ lp.wv).reshape(b, s, config.num_key_value_heads, d)
    q = apply_rope(q, cos, sin, positions)
    k = apply_rope(k, cos, sin, positions)
    return q, k, v


def post_attention(lp: LayerParams, config: ModelConfig, attn_out: jax.Array,
                   residual: jax.Array) -> jax.Array:
    """o_proj + residual + MLP block (reference `post_attention_compute`,
    `models/llama.py:159-183`). attn_out: [B, S, Hq*d]; residual: [B, S, h]."""
    hidden = residual + (attn_out.astype(residual.dtype) @ lp.wo)
    residual = hidden
    x = rms_norm(hidden, lp.ln_mlp, config.rms_norm_eps)
    gate = jax.nn.silu((x @ lp.w_gate).astype(jnp.float32)).astype(x.dtype)
    hidden = (gate * (x @ lp.w_up)) @ lp.w_down
    return residual + hidden


def unembed(params: LlamaParams, config: ModelConfig, hidden: jax.Array):
    """Final norm + LM head on the last position. hidden: [B, h] -> [B, V]."""
    x = rms_norm(hidden, params.final_ln, config.rms_norm_eps)
    return (x @ params.lm_head).astype(jnp.float32)
