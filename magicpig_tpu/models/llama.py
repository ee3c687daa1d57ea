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
class QuantWeight:
    """int8 weight with per-output-channel scales (W8A8 deployment).

    `linear` quantizes activations per token on the fly and runs a native
    s8 x s8 -> s32 MXU dot: on TPU this halves the weight HBM stream AND
    doubles MXU rate vs bf16 — the decode step at small batch is
    weight-bandwidth-bound, so this converts directly to tokens/s, and it
    is what lets 8B-class models fit one 16 GB chip at long context.
    """

    q: jax.Array       # int8 [..., in, out]
    scale: jax.Array   # f32 [..., out]


def quantize_weight(w: jax.Array) -> QuantWeight:
    """Symmetric per-output-channel int8 quantization of [..., in, out]."""
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=-2) / 127.0            # [..., out]
    q = jnp.round(wf / jnp.maximum(scale[..., None, :], 1e-12))
    return QuantWeight(q=jnp.clip(q, -127, 127).astype(jnp.int8),
                       scale=scale)


def linear(x: jax.Array, w) -> jax.Array:
    """x @ w for a raw array or a QuantWeight (dynamic per-token activation
    quantization -> native int8 dot -> rescale)."""
    if not isinstance(w, QuantWeight):
        return x @ w
    xf = x.astype(jnp.float32)
    sx = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    xq = jnp.round(xf / jnp.maximum(sx, 1e-12))
    xq = jnp.clip(xq, -127, 127).astype(jnp.int8)
    out = jax.lax.dot_general(
        xq, w.q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (out.astype(jnp.float32) * sx * w.scale).astype(x.dtype)


@flax.struct.dataclass
class LayerParams:
    """Stacked transformer-layer weights; leading dim = num_layers."""

    wq: jax.Array      # [N, hidden, Hq*d]   (each w* may be a QuantWeight)
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
    lm_head = (embed.T if config.tie_word_embeddings
               else w(ks[8], (h, config.vocab_size), h))
    cos, sin = rope_cos_sin(config, max_len)
    params = LlamaParams(
        embed=embed,
        lm_head=lm_head,
        final_ln=jnp.ones((h,), dt),
        layers=layers,
        cos=cos,
        sin=sin,
    )
    if config.weight_quant == "int8":
        params = quantize_params(params)
    return params


def quantize_params(params: LlamaParams) -> LlamaParams:
    """int8-quantize every matmul weight (embedding stays exact — it is a
    gather; a tied lm_head is quantized as its own copy, trading a little
    storage for halving the biggest per-step weight read)."""
    layers = params.layers
    layers = LayerParams(
        wq=quantize_weight(layers.wq),
        wk=quantize_weight(layers.wk),
        wv=quantize_weight(layers.wv),
        wo=quantize_weight(layers.wo),
        w_gate=quantize_weight(layers.w_gate),
        w_up=quantize_weight(layers.w_up),
        w_down=quantize_weight(layers.w_down),
        ln_attn=layers.ln_attn,
        ln_mlp=layers.ln_mlp,
    )
    return params.replace(layers=layers,
                          lm_head=quantize_weight(params.lm_head))


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
    q = linear(x, lp.wq).reshape(b, s, config.num_attention_heads, d)
    k = linear(x, lp.wk).reshape(b, s, config.num_key_value_heads, d)
    v = linear(x, lp.wv).reshape(b, s, config.num_key_value_heads, d)
    q = apply_rope(q, cos, sin, positions)
    k = apply_rope(k, cos, sin, positions)
    return q, k, v


def post_attention(lp: LayerParams, config: ModelConfig, attn_out: jax.Array,
                   residual: jax.Array) -> jax.Array:
    """o_proj + residual + MLP block (reference `post_attention_compute`,
    `models/llama.py:159-183`). attn_out: [B, S, Hq*d]; residual: [B, S, h]."""
    hidden = residual + linear(attn_out.astype(residual.dtype), lp.wo)
    residual = hidden
    x = rms_norm(hidden, lp.ln_mlp, config.rms_norm_eps)
    gate = jax.nn.silu(linear(x, lp.w_gate).astype(jnp.float32)).astype(x.dtype)
    hidden = linear(gate * linear(x, lp.w_up), lp.w_down)
    return residual + hidden


def unembed(params: LlamaParams, config: ModelConfig, hidden: jax.Array):
    """Final norm + LM head on the last position. hidden: [B, h] -> [B, V]."""
    x = rms_norm(hidden, params.final_ln, config.rms_norm_eps)
    return linear(x, params.lm_head).astype(jnp.float32)
